package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** d10 (C4-style segment dedup) and t15 (temperature-scaled mixture
  * resampling) semantics on a hand-crafted corpus with analytically known
  * answers. The DuckDB gates pin exact values on the generated tables;
  * these pin the *contract* on inputs engineered to hit the interesting
  * cases (whole-document dup, partial segment overlap, integer quota
  * arithmetic) that the generator corpus does not guarantee to contain.
  */
class SegmentDedupSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  private def writeDocs(rows: Seq[Row]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_segdedup_").toString
    spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 2), schema)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def toks(prefix: String, n: Int): String =
    (1 to n).map(i => s"$prefix$i").mkString(" ")

  test("d10 keeps first occurrences only and rebuilds in segment order") {
    // doc 1: 25 tokens -> segments [w1..w10][w11..w20][w21..w25], all novel.
    // doc 2: byte-identical to doc 1 -> every segment already seen, kept 0.
    // doc 3: seg1 duplicates doc1's seg1, seg2 is novel, seg3 duplicates
    //        doc1's seg3 -> only the middle segment survives.
    val d1 = toks("w", 25)
    val d3 = (1 to 10).map(i => s"w$i") ++ (1 to 10).map(i => s"x$i") ++
      (21 to 25).map(i => s"w$i")
    val dir = writeDocs(Seq(
      Row(1L, d1, "en", "syn", d1.length.toLong),
      Row(2L, d1, "en", "syn", d1.length.toLong),
      Row(3L, d3.mkString(" "), "en", "syn", 0L)))
    val out = SparkEntry.queries("d10_segment_dedup")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) === ((3L, 3L, d1)), "first doc must survive intact")
    assert(out(2L) === ((3L, 0L, "")), "exact dup must be emptied in place")
    assert(out(3L) === ((3L, 1L, (1 to 10).map(i => s"x$i").mkString(" "))),
      "only the novel middle segment of doc 3 survives")
  }

  test("t15 quotas follow the sqrt-temperature law and select deterministically") {
    // lang a: 400 docs x 10 tokens (c_tok 4000); lang b: 100 x 10 (1000).
    // wi = floor(sqrt(c_tok)*1e6): a 63245553, b 31622776; ntarget = 250.
    // quota_a = 250*wi_a div sum = 166, quota_b = 83 — b's natural share
    // is 20% but its quota share is 33%: the sqrt upsamples low-resource.
    val ten = toks("t", 10)
    val dir = writeDocs(
      (1L to 400L).map(i => Row(i, ten, "a", "syn", 0L)) ++
      (401L to 500L).map(i => Row(i, ten, "b", "syn", 0L)))
    val rows = SparkEntry.queries("t15_mixture_resample")(spark, dir).collect()
    val quotas = rows.map(r => r.getString(1) -> r.getLong(2)).distinct.toMap
    assert(quotas === Map("a" -> 166L, "b" -> 83L))
    // Bernoulli selection rates: p_a = thr_a/2^20 ~ 0.415, p_b ~ 0.83.
    // Binomial sd is ~0.03 for both, so the rate ordering is ~7 sigma —
    // the per-row-decidable threshold must visibly upsample lang b.
    val byLang = rows.groupBy(_.getString(1)).view.mapValues(_.length.toDouble)
    assert(byLang("b") / 100.0 > byLang("a") / 400.0 + 0.1,
      s"low-resource lang not upsampled: $byLang")
    // Hash-threshold selection is a pure row predicate: re-running must
    // return the identical id set under any partitioning.
    val again = SparkEntry.queries("t15_mixture_resample")(spark, dir)
      .collect().map(_.getLong(0)).sorted
    assert(again.toSeq === rows.map(_.getLong(0)).sorted.toSeq)
  }
}
