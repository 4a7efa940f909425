package graft

import org.apache.spark.sql.functions._
import graft.ops.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("decode stub is deterministic and dimension-bounded") {
    val m1 = Multimodal.decodeStub(Multimodal.MediaRow(7L, "hello world".getBytes("UTF-8")))
    val m2 = Multimodal.decodeStub(Multimodal.MediaRow(7L, "hello world".getBytes("UTF-8")))
    assert(m1 == m2.copy())
    assert(m1.width >= 1 && m1.width <= 1920)
    assert(m1.height >= 1 && m1.height <= 1080)
    assert(Multimodal.Formats.contains(m1.format))
    assert(m1.n_bytes == 11L)
  }

  test("decodeAll preserves rows and partitioning through mapPartitions") {
    val media = spark.range(100)
      .select(col("id").as("doc_id"), concat(lit("payload-"), col("id")).cast("binary").as("media"))
      .repartition(7)
      .as[Multimodal.MediaRow]
    val out = Multimodal.decodeAll(spark, media)
    assert(out.count() == 100)
    assert(out.rdd.getNumPartitions == 7) // mapPartitions is partition-preserving
    assert(out.select("doc_id").distinct().count() == 100)
    assert(out.where(col("format").isin(Multimodal.Formats: _*)).count() == 100)
  }
}
