package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the driver-generated test data
  * (see /root/repo/TESTDATA.md). At cluster scale these would be
  * catalog tables / object-store paths; the path-parameterized shape
  * mirrors the reference's storage-mediated dataflow
  * (reference: airflow/main-dw-project.py:114-243 — every job takes
  * in/out paths as arguments).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
