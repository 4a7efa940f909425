package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.TextOps

// temporary profiling main — deleted before commit
object Scratch {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
  }
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()

    val docs = Tables.load(spark, sfDir, "documents")
    time("docs count")(docs.count())
    val inv = TextOps.shingleRows(docs, "doc_id", "text")
    time("shingleRows count")(inv.count())
    time("shingleRows count again")(inv.count())
    val invP = inv.persist()
    time("persisted materialize")(invP.count())
    val joined = invP.as("x").join(invP.as("y"),
        col("x.s") === col("y.s") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("doc_id_1"), col("y.doc_id").as("doc_id_2"),
        col("x.n").as("n1"), col("y.n").as("n2"))
      .agg(count(lit(1)).as("inter"))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("n1") + col("n2") - col("inter")))
      .where(col("jaccard") >= 0.03)
    time("self-join + agg")(joined.count())
    time("self-join again")(joined.count())
    spark.sharedState.cacheManager.clearCache()
    // full gate as registered
    time("full d2 gate")(SparkEntry.queries("d2_ngram_jaccard_pairs")(spark, sfDir).count())
    spark.sharedState.cacheManager.clearCache()
    time("full d3 gate")(SparkEntry.queries("d3_minhash_lsh_pairs")(spark, sfDir).count())
    spark.stop()
  }
}
