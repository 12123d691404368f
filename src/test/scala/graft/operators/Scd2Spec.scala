package graft.operators

import graft.SparkSpec
import graft.core.GraftConf
import org.apache.spark.sql.functions._

class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private val conf = GraftConf(asOfDate = java.time.LocalDate.parse("2002-01-01"))
  private val confLater = GraftConf(asOfDate = java.time.LocalDate.parse("2002-06-01"))

  test("dedupKeepFirst keeps earliest row per key deterministically") {
    val df = Seq(
      (1L, "2024-01-02", "late"), (1L, "2024-01-01", "first"),
      (2L, "2024-01-05", "only")).toDF("id", "ts", "tag")
    val out = Scd2.dedupKeepFirst(df, Seq("id"), "ts").collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(out === Map(1L -> "first", 2L -> "only"))
  }

  test("withScd2Columns stamps reference-parity stub columns") {
    val out = Scd2.withScd2Columns(Seq((1L, "a")).toDF("id", "v"), conf).collect().head
    assert(out.getAs[java.sql.Date]("effective_date").toString === "2002-01-01")
    assert(out.isNullAt(out.fieldIndex("end_date")))
    assert(out.getAs[Boolean]("is_current"))
  }

  test("merge closes changed rows, appends new versions, keeps history intact") {
    val current = Scd2.withScd2Columns(
      Seq((1L, "alice", "NY"), (2L, "bob", "LA")).toDF("id", "name", "city"), conf)
    val incoming = Seq((1L, "alice", "SF"), (3L, "carol", "TX")).toDF("id", "name", "city")

    val v2 = Scd2.merge(current, incoming, "id", Seq("name", "city"), confLater)
    val rows = v2.collect().map(r => (r.getAs[Long]("id"),
      r.getAs[String]("city"), r.getAs[Boolean]("is_current"))).toSet
    assert(rows === Set(
      (1L, "NY", false), // closed old version
      (1L, "SF", true),  // new version
      (2L, "LA", true),  // unchanged
      (3L, "TX", true))) // new key
    val closed = v2.filter(col("id") === 1 && !col("is_current")).collect().head
    assert(closed.getAs[java.sql.Date]("end_date").toString === "2002-06-01")

    // second merge: history (closed id=1 NY) must survive an unrelated change
    val inc2 = Seq((2L, "bob", "SEA")).toDF("id", "name", "city")
    val v3 = Scd2.merge(v2, inc2, "id",  Seq("name", "city"),
      GraftConf(asOfDate = java.time.LocalDate.parse("2002-12-01")))
    assert(v3.count() === 5) // 4 prior + 1 new bob version
    assert(v3.filter(col("id") === 1).count() === 2) // history intact
    assert(v3.filter(col("id") === 2 && col("is_current")).select("city").head.getString(0) === "SEA")
  }

  test("merge is idempotent for identical snapshots") {
    val current = Scd2.withScd2Columns(
      Seq((1L, "alice", "NY")).toDF("id", "name", "city"), conf)
    val same = Seq((1L, "alice", "NY")).toDF("id", "name", "city")
    val out = Scd2.merge(current, same, "id", Seq("name", "city"), confLater)
    assert(out.count() === 1)
    assert(out.head.getAs[Boolean]("is_current"))
  }
}
