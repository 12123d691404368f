#!/usr/bin/env python3
"""Local correctness check mimicking the driver's DuckDB oracle compare.

Usage: python3 tools/check.py <verify_out_dir> <sf_dir> [query ...]

Reads each <out>/<name> parquet (Spark result) and runs the matching SQL
from <out>/oracle_sql.json in DuckDB over the sf_dir tables, then compares
BOTH the arrow schemas (type-sensitive: decimal precision/scale, float vs
decimal, int widths) and the row sets (columns sorted by name, rows sorted).

Type-sensitivity matters: the driver's comparator hashes typed values, so a
Spark DECIMAL(28,2) vs DuckDB DECIMAL(38,2) — or Spark DOUBLE vs DuckDB
DECIMAL — fails there even when str(value) matches. The old version of this
gate normalized Decimal→str and passed 14 queries the driver failed.
"""
import sys, json, glob, os
import decimal, datetime
import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_type(t):
    """Normalize an arrow type to a comparable tag. Strict on decimal
    precision/scale and numeric class; lenient on string flavor and
    timestamp tz annotation (Spark writes tz=UTC, DuckDB writes none)."""
    if pa.types.is_decimal(t):
        return ("dec", t.precision, t.scale)
    if pa.types.is_timestamp(t):
        return "ts"  # unit-insensitive: Spark INT96→ns vs DuckDB µs, same values
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "str"
    if pa.types.is_float64(t):
        return "f64"
    if pa.types.is_float32(t):
        return "f32"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_integer(t):
        return ("int", t.bit_width, pa.types.is_signed_integer(t))
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return ("list", norm_type(t.value_type))
    if pa.types.is_struct(t):
        return ("struct", tuple((f.name, norm_type(f.type)) for f in t))
    return str(t)


def norm(v):
    if v is None:
        return None
    # Typed normalization: a Decimal never equals a float here, and scale is
    # preserved — mirroring a typed-hash comparator.
    if isinstance(v, decimal.Decimal):
        return ("d", str(v))
    if isinstance(v, float):
        return ("f", repr(v))
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(norm(x) for x in v)
    if isinstance(v, dict):
        return tuple((k, norm(x)) for k, x in sorted(v.items()))
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
        stypes = {c: norm_type(f.type) for c, f in zip(scols, tbl.schema)}
        srows = [tuple(d[c] for c in scols) for d in tbl.to_pylist()]
        try:
            otbl = con.execute(sql).arrow()
            ocols = otbl.column_names
            otypes = {c: norm_type(f.type) for c, f in zip(ocols, otbl.schema)}
            orows = [tuple(d[c] for c in ocols) for d in otbl.to_pylist()]
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_bad += 1
            continue
        if sorted(scols) != sorted(ocols):
            print(f"FAIL {name}: columns spark={sorted(scols)} oracle={sorted(ocols)}")
            n_bad += 1
            continue
        tdiffs = [(c, stypes[c], otypes[c]) for c in sorted(scols)
                  if stypes[c] != otypes[c]]
        if tdiffs:
            msg = ", ".join(f"{c}: spark={a} oracle={b}" for c, a, b in tdiffs)
            print(f"FAIL {name}: type mismatch — {msg}")
            n_bad += 1
            continue
        sc, sr = rowset(scols, srows)
        oc, orr = rowset(ocols, orows)
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
