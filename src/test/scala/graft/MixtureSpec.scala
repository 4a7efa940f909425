package graft

import org.apache.spark.sql.functions._
import graft.ops.TextOps

/** The mixture-control operators' edge cases, which no gate corpus
  * reaches: t23's whole reason to exist is the n < 10 stratum (smallest
  * gate stratum: 64 docs), and t24's admission rule matters exactly when
  * one row exceeds the whole budget (largest gate doc: 577 chars vs a
  * 5000 budget).
  */
class MixtureSpec extends SparkSpec {
  import spark.implicits._

  test("stratifiedSplit assigns exactly ceil(n/10) to val for every stratum size") {
    // strata of size 1, 2, 9, 10, 11, 23 — the boundary ladder around the
    // 10% bucket; ceil(n/10) = 1,1,1,1,2,3
    val sizes = Map("s1" -> 1, "s2" -> 2, "s9" -> 9, "s10" -> 10,
      "s11" -> 11, "s23" -> 23)
    val rows = sizes.toSeq.flatMap { case (lang, n) =>
      (1 to n).map(i => (s"$lang-$i", lang))
    }
    val out = TextOps.stratifiedSplit(rows.toDF("doc_id", "lang"),
      "lang", "doc_id", "x42")
    val valCounts = out.where(col("split") === "val")
      .groupBy("lang").agg(count(lit(1)).as("nv"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((lang, n) <- sizes)
      assert(valCounts.getOrElse(lang, 0L) == (n + 9) / 10,
        s"stratum $lang (n=$n): val=${valCounts.get(lang)}, want ${(n + 9) / 10}")
    // total rows preserved; split is deterministic across invocations
    assert(out.count() == rows.size)
    val again = TextOps.stratifiedSplit(rows.toDF("doc_id", "lang"),
      "lang", "doc_id", "x42")
    assert(out.exceptAll(again).isEmpty && again.exceptAll(out).isEmpty)
  }

  test("weightBudgetCap admits the first row even when it alone exceeds the budget") {
    // g1: first-in-hash-order row is huge — the old cum<=B rule dropped
    // the whole group (stratum starvation); the admit-while-budget-
    // remains rule keeps exactly the rows whose PRECEDING mass < B.
    val rows = Seq(
      ("a1", "g1", 9000L), ("a2", "g1", 10L),
      ("b1", "g2", 40L), ("b2", "g2", 40L), ("b3", "g2", 40L))
    val out = TextOps.weightBudgetCap(rows.toDF("doc_id", "src", "w"),
      "src", "doc_id", "w", 100L, "x42")
    val g1 = out.where(col("src") === "g1").collect()
    assert(g1.length == 1, s"g1 must contribute exactly its first row, got ${g1.length}")
    // g2: all three fit? 40+40+40: third row's preceding mass is 80 < 100
    // -> admitted (overshoot <= one row); a fourth row would see 120 and stop
    assert(out.where(col("src") === "g2").count() == 3)
    // invariant: every admitted row's preceding cumulative mass < budget
    assert(out.where(col("cum_w") - col("w") >= 100L).count() == 0)
  }

  test("weightBudgetCap refuses negative weights (prefix property breaks)") {
    // A negative weight makes cum_w non-monotone: rows past the budget
    // could re-admit. The contract is enforced in-plan (raise_error), so
    // the failure is loud at execution, not a silently wrong mixture.
    val rows = Seq(("a1", "g1", 60L), ("a2", "g1", -30L), ("a3", "g1", 60L))
    val e = intercept[Exception] {
      TextOps.weightBudgetCap(rows.toDF("doc_id", "src", "w"),
        "src", "doc_id", "w", 100L, "x42").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("negative w")), msgs(e).mkString(" | "))
  }

  test("both operators plan ONE exchange (the group shuffle) and nothing else") {
    val docs = (1 to 200).map(i => (i.toLong, s"l${i % 5}", s"s${i % 7}", 50L))
      .toDF("doc_id", "lang", "source", "n_chars")
    for (df <- Seq(
        TextOps.stratifiedSplit(docs, "lang", "doc_id", "x"),
        TextOps.weightBudgetCap(docs, "source", "doc_id", "n_chars", 500L, "x"))) {
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      val exchanges = plan.linesIterator.count(_.contains("Exchange"))
      assert(exchanges == 1, s"expected one group shuffle:\n${plan.take(1500)}")
    }
  }
}
