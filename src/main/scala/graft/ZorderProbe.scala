package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only Hilbert-vs-Morton layout probe (round 14): writes the same
  * frame clustered by `zorderBy` under both curves and measures the two
  * numbers that decide whether the Hilbert path earns its native
  * expression — mean per-file min/max span (fraction of global range) and
  * mass-weighted files-per-point-lookup (the metric ZorderSpec pins, the
  * one that survives skew) on every clustered dimension, plus the write
  * wall-clock. Run on a synthetic uniform grid (crisp ideal) and on
  * sf lineitem (l_partkey, l_suppkey) — the k8 gate's shape.
  *
  * Usage: runMain graft.ZorderProbe [sfDir] [files] [copies]
  */
object ZorderProbe {

  private def meanSpan(spark: SparkSession, path: String, c: String): Double = {
    val df = spark.read.parquet(path)
    val g = df.agg(min(col(c)).cast("double"), max(col(c)).cast("double")).head()
    val range = g.getDouble(1) - g.getDouble(0)
    df.groupBy(input_file_name().as("f"))
      .agg(((max(col(c)) - min(col(c))).cast("double") / range).as("s"))
      .agg(avg(col("s"))).head().getDouble(0)
  }

  private def filesPerLookup(spark: SparkSession, path: String, c: String): Double = {
    val df = spark.read.parquet(path)
    val stats = df.groupBy(input_file_name().as("f"))
      .agg(min(col(c)).as("mn"), max(col(c)).as("mx"))
    df.select(col(c).as("v"))
      .join(broadcast(stats), col("v") >= col("mn") && col("v") <= col("mx"))
      .count().toDouble / df.count()
  }

  private def probe(spark: SparkSession, tag: String, df: DataFrame,
                    cols: Seq[String], files: Int): Unit = {
    for (curve <- Seq("morton", "hilbert")) {
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft_zp_${curve}_").toString
      val t0 = System.nanoTime()
      graft.ops.Relational.zorderBy(df, cols, files, curve = curve)
        .write.mode("overwrite").parquet(dir)
      val secs = (System.nanoTime() - t0) / 1e9
      val m = cols.map(c => f"$c span=${meanSpan(spark, dir, c)}%.3f " +
        f"files/lookup=${filesPerLookup(spark, dir, c)}%.2f").mkString("  ")
      println(f"ZPROBE $tag%-28s $curve%-7s write=$secs%6.1fs  $m")
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val files = args.lift(1).map(_.toInt).getOrElse(16)
    // copies > 1 unions key-shifted lineitem copies — the 10× rung that
    // checks the curve gap and the write cost both scale linearly.
    val copies = args.lift(2).map(_.toInt).getOrElse(1)
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val n = 256
    val grid = spark.range(n.toLong * n)
      .select((col("id") % n).as("a"), (col("id") / n).cast("long").as("b"),
        col("id").as("payload"))
    probe(spark, s"grid ${n}x$n/$files files", grid, Seq("a", "b"), files)
    val li0 = Tables.load(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        col("l_quantity"))
    val pSpan = li0.agg(max(col("l_partkey"))).head().getLong(0) + 1
    val li = li0.withColumn("c",
        explode(sequence(lit(0), lit(copies - 1))))
      .select((col("l_partkey") + col("c") * pSpan).as("l_partkey"),
        col("l_suppkey"), col("l_orderkey"), col("l_quantity"))
    probe(spark, s"lineitem ${copies}x/$files files", li,
      Seq("l_partkey", "l_suppkey"), files)
    spark.stop()
  }
}
