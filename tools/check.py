#!/usr/bin/env python3
"""Local correctness check mimicking the driver's DuckDB oracle compare.

Usage: python3 tools/check.py <verify_out_dir> <sf_dir> [query ...]

Reads each <out>/<name> parquet (Spark result) and runs the matching SQL
from <out>/oracle_sql.json in DuckDB over the sf_dir tables, then compares
row sets (columns sorted by name, rows sorted) exactly.
"""
import sys, json, glob, os
import duckdb
import pyarrow.parquet as pq

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(v):
    if v is None:
        return None
    # Decimal compare as string to preserve scale; floats exact.
    import decimal, datetime
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v


def rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [cols[i] for i in order], out


def main():
    outdir, sfdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name in sorted(oracles):
        if only and name not in only:
            continue
        sql = oracles[name]
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_bad += 1
            continue
        tbl = pq.read_table(files[0])
        scols = tbl.column_names
        srows = [tuple(d[c] for c in scols) for d in tbl.to_pylist()]
        try:
            res = con.execute(sql)
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_bad += 1
            continue
        sc, sr = rowset(scols, srows)
        oc, orr = rowset(ocols, orows)
        if sc != oc:
            print(f"FAIL {name}: columns spark={sc} oracle={oc}")
            n_bad += 1
            continue
        if len(sr) != len(orr):
            print(f"FAIL {name}: rows spark={len(sr)} oracle={len(orr)}")
            n_bad += 1
            continue
        diffs = [(a, b) for a, b in zip(sr, orr) if a != b]
        if diffs:
            print(f"FAIL {name}: {len(diffs)} row diffs; first: spark={diffs[0][0]} oracle={diffs[0][1]}")
            n_bad += 1
        else:
            print(f"OK   {name} ({len(sr)} rows)")
            n_ok += 1
    print(f"== {n_ok} ok, {n_bad} fail ==")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
