package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SnapshotDiffSpec extends SparkSpec {
  import spark.implicits._

  private def oldDf = Seq(
    (1L, "A", 10.0), (2L, "B", 20.0), (3L, "C", 30.0), (4L, "D", 40.0),
    (5L, null.asInstanceOf[String], 50.0)
  ).toDF("k", "status", "price")

  private def newDf = Seq(
    (2L, "B", 20.0),                              // unchanged — must vanish
    (3L, "X", 30.0),                              // status changed
    (4L, "D", 44.0),                              // price changed
    (5L, "E", 55.0),                              // null→value counts on BOTH cols
    (6L, "F", 60.0)                               // added
  ).toDF("k", "status", "price")

  test("diff classifies added / removed / changed and names the columns") {
    val d = SnapshotDiff.diff(oldDf, newDf, Seq("k"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(d == Set(
      (1L, "removed", ""),
      (3L, "changed", "status"),
      (4L, "changed", "price"),
      (5L, "changed", "status,price"),
      (6L, "added", "")))
  }

  test("identical snapshots diff to empty") {
    assert(SnapshotDiff.diff(oldDf, oldDf, Seq("k")).isEmpty)
  }

  test("changed_cols order follows the schema, not the change magnitude") {
    val o = Seq((1L, "a", 1.0)).toDF("k", "status", "price")
    val n = Seq((1L, "b", 2.0)).toDF("k", "status", "price")
    val r = SnapshotDiff.diff(o, n, Seq("k")).select("changed_cols").as[String].head()
    assert(r == "status,price")
  }

  test("result is partition-order independent") {
    val a = SnapshotDiff.diff(oldDf.repartition(7), newDf.repartition(3), Seq("k"))
      .orderBy("k").collect().toSeq
    val b = SnapshotDiff.diff(oldDf, newDf, Seq("k")).orderBy("k").collect().toSeq
    assert(a == b)
  }

  test("schemaDiff reports added, removed, and retyped columns") {
    val o = Seq((1L, "a", 1.0)).toDF("k", "status", "price")
    val n = Seq((1L, 2, "x")).toDF("k", "price", "region")
    val d = SnapshotDiff.schemaDiff(o, n)
      .collect().map(r => (r.getString(0), r.getString(1),
        Option(r.getString(2)), Option(r.getString(3)))).toSet
    assert(d == Set(
      ("region", "added", None, Some("string")),
      ("status", "removed", Some("string"), None),
      ("price", "retyped", Some("double"), Some("int"))))
  }

  test("schemaDiff of identical schemas is empty") {
    assert(SnapshotDiff.schemaDiff(oldDf, oldDf).isEmpty)
  }

  test("mismatched schemas are rejected") {
    val bad = oldDf.withColumnRenamed("price", "amount")
    assertThrows[IllegalArgumentException] {
      SnapshotDiff.diff(oldDf, bad, Seq("k"))
    }
  }
}
