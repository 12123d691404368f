package graft.core

import graft.SparkSpec
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** The bootstrap-read contract: path absence is the ONLY condition that
  * reads as an empty frame — every real failure (corrupted footer)
  * rethrows, because an incremental loop that silently treats a broken
  * corpus as "first run" commits artifacts with missing edges.
  */
class ParquetIoSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(StructField("id", LongType)))

  test("a missing path is the bootstrap case: empty frame, given schema") {
    val out = ParquetIo.readOrEmpty(spark,
      "/tmp/graft-does-not-exist-" + System.nanoTime(), schema)
    assert(out.count() === 0L)
    assert(out.schema === schema)
  }

  test("an existing-but-corrupted file rethrows instead of reading empty") {
    val dir = java.nio.file.Files.createTempDirectory("pio").toString + "/t"
    Seq(1L, 2L).toDF("id").coalesce(1).write.parquet(dir)
    new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet"))
      .foreach(f => java.nio.file.Files.write(f.toPath, "junk".getBytes))
    intercept[Exception] {
      ParquetIo.readOrEmpty(spark, dir, schema).count()
    }
  }

  test("a healthy path reads normally") {
    val dir = java.nio.file.Files.createTempDirectory("pio2").toString + "/t"
    Seq(7L).toDF("id").write.parquet(dir)
    assert(ParquetIo.readOrEmpty(spark, dir, schema)
      .collect().map(_.getLong(0)).toSeq === Seq(7L))
  }
}
