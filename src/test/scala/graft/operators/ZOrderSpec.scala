package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("morton codes match hand-interleaved bits") {
    val pts = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (3L, 5L),
      (65535L, 65535L)).toDF("a", "b")
    val z = ZOrder.withZOrderKey(pts, "a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Long]("z_key")).toMap
    // 2×2 quadrant order: (0,0) (1,0) (0,1) (1,1) -> 0 1 2 3
    assert(z((0L, 0L)) === 0L)
    assert(z((1L, 0L)) === 1L)
    assert(z((0L, 1L)) === 2L)
    assert(z((1L, 1L)) === 3L)
    // 3 = 0b11 spreads to 0b0101; 5 = 0b101 spreads to 0b010001;
    // morton = 0b0101 | (0b010001 << 1) = 5 | 34 = 39
    assert(z((3L, 5L)) === 39L)
    // full 16-bit inputs use all 32 interleaved bits
    assert(z((65535L, 65535L)) === 0xFFFFFFFFL)
  }

  test("z-order clustering gives files tight min/max ranges on BOTH dims") {
    // a 64×64 grid; plain sort by a would leave every file spanning the
    // full b range, z-order keeps both ranges narrow per file
    val grid = spark.range(64L * 64L)
      .select((col("id") % 64).as("a"), (col("id") / 64).cast("long").as("b"))
    val parts = ZOrder.clusterByZOrder(grid, "a", "b", numFiles = 16)
      .select(spark_partition_id().as("p"), col("a"), col("b"))
      .groupBy("p").agg((max("a") - min("a")).as("ra"), (max("b") - min("b")).as("rb"))
      .collect()
    assert(parts.length === 16)
    // every file's span on each dimension stays well under the full 63
    assert(parts.forall(r => r.getAs[Long]("ra") <= 31 && r.getAs[Long]("rb") <= 31),
      parts.map(r => (r.getAs[Long]("ra"), r.getAs[Long]("rb"))).mkString(","))
  }
}
