package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.VectorOps
import graft.queries.VectorQueries

/** Scratch profiling main (deleted before round end). */
object Probe {
  def t[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
  }
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()

    val e = Tables.load(spark, sfDir, "embeddings")
    println("[probe] vecs=" + e.count())

    val planeInts = VectorQueries.planeInts
    val withB = e.withColumn("bucket", VectorOps.lshBucket(col("embedding"), planeInts))
      .withColumn("norm", VectorOps.l2Norm(col("embedding")))
    t("bucket+norm scan")(withB.selectExpr("sum(bucket)", "sum(norm)").collect())
    t("bucket+norm again")(withB.selectExpr("sum(bucket)", "sum(norm)").collect())

    val probes = withB.where(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"),
        col("norm").as("q_norm"),
        explode(array(VectorQueries.probeMasks.map(m =>
          col("bucket").bitwiseXOR(lit(m))): _*)).as("bucket"))
    val cand = probes.join(withB, Seq("bucket")).where(col("q_id") =!= col("vec_id"))
    t("cand join count")(println("[probe] cand=" + cand.count()))
    val sims = cand.withColumn("sim", VectorOps.dotD(col("q_vec"), col("embedding")) /
      (col("q_norm") * col("norm")))
    t("cand+sim")(sims.selectExpr("sum(sim)").collect())
    val top = graft.ops.Relational.topKPerGroup(sims, Seq(col("q_id")),
      Seq(col("sim").desc, col("vec_id")), 5)
    t("topK")(top.count())
    t("e2 full again")(top.count())

    spark.stop()
  }
}
