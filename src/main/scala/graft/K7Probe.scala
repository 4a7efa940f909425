package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only adjudication probe for k7_batch_split (VERDICT r21 item 3):
  * times three forms of the gate's landing-shard fixture write on one
  * session, interleaved A,B,C per round so ambient drift hits all three
  * equally, with the same canary context QueryProbe prints.
  *
  *   A = r21 form: partitionBy("__par") write, scan-partition-bounded
  *       file count (the form the driver measured SLOWER in both r21 runs)
  *   B = r20 form: two sequential filter + coalesce(1) writes
  *   C = candidate: ONE pass, coalesce(1) THEN partitionBy — single task
  *       writes both shard dirs (one file each), no second scan, no
  *       exchange (coalesce is a narrow dependency)
  *
  * Usage: runMain graft.K7Probe [rounds]
  */
object K7Probe {
  private def gate(s: SparkSession, d: String,
                   writeShards: (DataFrame, String) => Seq[String]): Long = {
    val orders = Tables.load(s, d, "orders")
      .withColumn("o_orderdate", date_format(col("o_orderdate"), "dd/MM/yyyy"))
    val tmp = graft.ops.InterStage.scratchDir("graft_k7probe_")
    val shards = writeShards(orders, tmp)
    graft.warehouse.Jobs.batchSplit(s, shards, s"$tmp/out",
      "o_orderdate", "dd/MM/yyyy", Seq("1997-01-01", "1999-01-01"))
    (1 to 3).map { i =>
      s.read.option("header", "true").csv(s"$tmp/out/$i")
        .agg(count(lit(1)).as("n_rows"),
          sum(col("o_orderkey").cast("long")).as("key_sum"))
        .select(lit(i).as("batch"), col("n_rows"), col("key_sum"))
    }.reduce(_ unionByName _).count()
  }

  private val formA = (orders: DataFrame, tmp: String) => {
    orders.withColumn("__par", pmod(col("o_orderkey"), lit(2)))
      .write.mode("overwrite").option("header", "true")
      .partitionBy("__par").csv(s"$tmp/in")
    Seq(s"$tmp/in/__par=0", s"$tmp/in/__par=1")
  }
  private val formB = (orders: DataFrame, tmp: String) => {
    orders.where(col("o_orderkey") % 2 === 0).coalesce(1)
      .write.mode("overwrite").option("header", "true").csv(s"$tmp/in/even")
    orders.where(col("o_orderkey") % 2 =!= 0).coalesce(1)
      .write.mode("overwrite").option("header", "true").csv(s"$tmp/in/odd")
    Seq(s"$tmp/in/even", s"$tmp/in/odd")
  }
  private val formC = (orders: DataFrame, tmp: String) => {
    orders.withColumn("__par", pmod(col("o_orderkey"), lit(2)))
      .coalesce(1)
      .write.mode("overwrite").option("header", "true")
      .partitionBy("__par").csv(s"$tmp/in")
    Seq(s"$tmp/in/__par=0", s"$tmp/in/__par=1")
  }

  def main(args: Array[String]): Unit = {
    val rounds = args.headOption.flatMap(_.toIntOption).getOrElse(5)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.range(1000).selectExpr("sum(id)").collect()
    // Same reference path + core-count gate as Bench/QueryProbe: ratios
    // against stamps from a different core count fabricate "drift".
    val refPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_REF", "bench_reference.json")
    val cpusMatch = Bench.refCpusMatches(refPath)
    val canary = Bench.measureCanary(spark)
    val canaryRef = Bench.canaryReference(refPath).filter(_ => cpusMatch)
    println(f"K7PROBE canary $canary%.3f s" + canaryRef.fold("")(r =>
      f" drift ${canary / r}%.2fx"))
    val sh = Bench.measureShuffleCanary(spark)
    val shRef = Bench.canaryReference(refPath, "_shuffleCanary")
      .filter(_ => cpusMatch)
    println(f"K7PROBE shuffleCanary $sh%.3f s" + shRef.fold("")(r =>
      f" shDrift ${sh / r}%.2fx"))
    val forms = Seq("A_partitionBy" -> formA, "B_r20_two_pass" -> formB,
      "C_coalesce1_partitionBy" -> formC)
    val times = scala.collection.mutable.Map[String, Vector[Double]]()
      .withDefaultValue(Vector.empty)
    // warmup round (not recorded) so JIT/committer classes are hot for all
    forms.foreach { case (_, f) => gate(spark, sfDir, f) }
    for (_ <- 1 to rounds; (name, f) <- forms) {
      val t0 = System.nanoTime()
      gate(spark, sfDir, f)
      spark.sharedState.cacheManager.clearCache()
      times(name) = times(name) :+ (System.nanoTime() - t0) / 1e9
    }
    for ((name, _) <- forms) {
      val ts = times(name).sorted
      println(f"K7PROBE $name%-24s min=${ts.head}%.3f med=${ts(ts.size / 2)}%.3f " +
        ts.map(t => f"$t%.3f").mkString("runs=[", ", ", "]"))
    }
    spark.stop()
  }
}
