package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.ops.TextOps

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

    val docs = Tables.load(spark, sfDir, "documents")
    docs.count()
    val P = TextOps.HashPrime

    def md5h60(c: org.apache.spark.sql.Column) =
      conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast(LongType)

    // v1: current — hash inside transform (interpreted)
    val v1 = docs.select(col("doc_id"),
      TextOps.shingleHashes(array_distinct(
        TextOps.wordShingles(TextOps.tokens(col("text")), 3))).as("hs"))
      .select(col("doc_id"), explode(col("hs")).as("s"))
    t("v1 transform+sha2")(v1.count()); t("v1 again")(v1.count())

    // v2: explode strings, hash top-level (codegen) with sha2
    val v2 = docs.select(col("doc_id"), explode(array_distinct(
        TextOps.wordShingles(TextOps.tokens(col("text")), 3))).as("sh"))
      .select(col("doc_id"), pmod(TextOps.h60(col("sh")), lit(P)).as("s"))
    t("v2 explode+sha2")(v2.count()); t("v2 again")(v2.count())

    // v3: explode strings, md5 top-level
    val v3 = docs.select(col("doc_id"), explode(array_distinct(
        TextOps.wordShingles(TextOps.tokens(col("text")), 3))).as("sh"))
      .select(col("doc_id"), pmod(md5h60(col("sh")), lit(P)).as("s"))
    t("v3 explode+md5")(v3.count()); t("v3 again")(v3.count())

    // v4: shingle building alone (no hash)
    val v4 = docs.select(col("doc_id"), explode(array_distinct(
      TextOps.wordShingles(TextOps.tokens(col("text")), 3))).as("sh"))
    t("v4 shingles only")(v4.count()); t("v4 again")(v4.count())

    // v5: posexplode tokens, window-lead shingle strings, top-level hash,
    // distinct on the 60-bit hash (no interpreted HOF anywhere)
    import org.apache.spark.sql.expressions.Window
    val wd = Window.partitionBy("doc_id").orderBy("pos")
    val v5 = docs.select(col("doc_id"), posexplode(TextOps.tokens(col("text"))))
      .toDF("doc_id", "pos", "w")
      .select(col("doc_id"),
        concat_ws(" ", col("w"), lead("w", 1).over(wd), lead("w", 2).over(wd)).as("sh"),
        lead("w", 2).over(wd).isNotNull.as("full"))
      .where(col("full"))
      .select(col("doc_id"), TextOps.h60(col("sh")).as("h"))
      .groupBy(col("doc_id"), col("h")).agg(count(lit(1)))
    t("v5 window-lead")(v5.count()); t("v5 again")(v5.count())

    // t4 grams: posexplode of transform-hash vs explode-then-hash
    val g1 = docs.select(col("doc_id"), posexplode(transform(
      TextOps.charShingles(col("text"), 8), g => pmod(TextOps.h60(g), lit(4294967296L)))))
    t("t4 v1 transform+sha2")(g1.count())
    val g2 = docs.select(col("doc_id"), posexplode(
        TextOps.charShingles(col("text"), 8)))
      .select(col("doc_id"), col("pos"), pmod(TextOps.h60(col("col")), lit(4294967296L)).as("gh"))
    t("t4 v2 explode+sha2")(g2.count())
    val g3 = docs.select(col("doc_id"), posexplode(
        TextOps.charShingles(col("text"), 8)))
      .select(col("doc_id"), col("pos"), pmod(md5h60(col("col")), lit(4294967296L)).as("gh"))
    t("t4 v3 explode+md5")(g3.count())

    // t4 v5: explode a position sequence, substr top-level (zero HOFs)
    val g5 = docs.where(length(col("text")) >= 8)
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(1), length(col("text")) - 7)).as("pos"))
      .select(col("doc_id"), col("pos"),
        pmod(TextOps.h60(col("text").substr(col("pos"), lit(8))), lit(4294967296L)).as("gh"))
    t("t4 v5 seq+substr+sha2")(g5.count()); t("t4 v5 again")(g5.count())

    spark.stop()
  }
}
