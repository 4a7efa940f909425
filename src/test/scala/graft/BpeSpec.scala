package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** t16 BPE trainer semantics on the textbook corpus (low/lower/newest),
  * where the merge sequence is hand-computable — including a first-round
  * frequency TIE that pins the deterministic (freq DESC, p1, p2)
  * tie-break, and greedy-application correctness for the induced vocab.
  */
class BpeSpec extends SparkSpec {

  private lazy val dir: String = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("text", StringType),
      StructField("lang", StringType),
      StructField("source", StringType),
      StructField("n_chars", LongType)))
    val d = java.nio.file.Files.createTempDirectory("graft_bpe_").toString
    spark.createDataFrame(
        spark.sparkContext.parallelize(Seq(
          Row(1L, "low low lower", "en", "syn", 0L),
          Row(2L, "low lower newest", "en", "syn", 0L)), 2), schema)
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("t16 learns the hand-computed merge sequence with deterministic ties") {
    // word dict: low:3 lower:2 newest:1. Round 1 pairs: (l,o)=5 and
    // (o,w)=5 tie -> p1 order picks (l,o). Round 2: (lo,w)=5. Round 3:
    // (low,</w>)=3 beats (low,e)/(e,r)/(r,</w>)=2.
    val merges = SparkEntry.queries("t16_bpe_merges")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3))).sortBy(_._1)
    assert(merges.toSeq === Seq(
      (1L, "l", "o", 5L), (2L, "lo", "w", 5L), (3L, "low", "</w>", 3L)))
  }

  test("t16b vocabulary reflects greedy application of all three merges") {
    // low -> [low</w>]x3; lower -> [low,e,r,</w>]x2;
    // newest -> [n,e,w,e,s,t,</w>]x1.
    val vocab = SparkEntry.queries("t16b_bpe_vocab")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(vocab === Map(
      "low</w>" -> 3L, "low" -> 2L, "e" -> 4L, "r" -> 2L, "</w>" -> 3L,
      "n" -> 1L, "w" -> 1L, "s" -> 1L, "t" -> 1L))
  }

  test("t16c encodes documents with the learned merges") {
    // low -> 1 subword (low</w>), lower -> 4 (low,e,r,</w>), newest -> 7.
    val enc = SparkEntry.queries("t16c_bpe_encode")(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(enc === Map(1L -> ((3L, 6L)), 2L -> ((3L, 12L))))
  }

  test("checkpointed trainer learns the identical merge sequence and vocab") {
    // bpeTrainCheckpointed is the production-round-count twin (per-round
    // InterStage checkpoint, merge rule folded back as literals); on the
    // same corpus and round count it must be indistinguishable from the
    // gate's lineage-accreting bpeStages.
    val (merges, fin) = graft.queries.TextQueries
      .bpeTrainCheckpointed(spark, dir, 3)
    assert(merges === Seq(
      (1L, "l", "o", 5L), (2L, "lo", "w", 5L), (3L, "low", "</w>", 3L)))
    // differential pin against the lineage-accreting reference shape: the
    // two trainers must agree rule-for-rule, not just on hand-checked data
    val (refMerges, refFin) = graft.queries.TextQueries.bpeStages(spark, dir)
    assert(refMerges.reduce(_.union(_)).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_._1).toSeq === merges)
    assert(refFin.exceptAll(fin).isEmpty && fin.exceptAll(refFin).isEmpty)
    val vocab = fin.select(org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.col("syms")).as("sym"),
        org.apache.spark.sql.functions.col("wc"))
      .groupBy("sym").agg(org.apache.spark.sql.functions.sum("wc").as("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(vocab === Map(
      "low</w>" -> 3L, "low" -> 2L, "e" -> 4L, "r" -> 2L, "</w>" -> 3L,
      "n" -> 1L, "w" -> 1L, "s" -> 1L, "t" -> 1L))
    // a trainer run past dictionary exhaustion stops instead of looping
    val (all, _) = graft.queries.TextQueries.bpeTrainCheckpointed(spark, dir, 1000)
    assert(all.size < 1000 && all.take(3).map(_._1) == Seq(1L, 2L, 3L))
  }

  test("durable trainer resumes across sessions from the persisted prefix") {
    val state = java.nio.file.Files
      .createTempDirectory("graft_bpestate_").toString + "/st"
    val d = Sf0001
    val r1 = scala.collection.mutable.ArrayBuffer.empty[Int]
    val (m10, _) = graft.queries.TextQueries.bpeTrainCheckpointed(
      spark, d, 10, (r, _) => { r1 += r; () }, Some(state))
    assert(r1.toSeq == (1 to 10) && m10.size == 10)

    // A NEW session resumes: rounds 1-10 fast-forward from the state dir
    // (onRound fires only for live-trained rounds — its silence for 1-10
    // is the no-argmax-jobs assertion), 11-20 train live.
    val s2 = spark.newSession()
    val r2 = scala.collection.mutable.ArrayBuffer.empty[Int]
    val (m20, fin20) = graft.queries.TextQueries.bpeTrainCheckpointed(
      s2, d, 20, (r, _) => { r2 += r; () }, Some(state))
    assert(r2.toSeq == (11 to 20), s"resumed run re-trained rounds: $r2")
    assert(m20.take(10) == m10)

    // State hygiene: each commit prunes dicts older than round N-1, so a
    // 20-round train leaves exactly the newest two rounds' word-dicts on
    // state storage (at production round counts the unpruned alternative
    // is tens of thousands of full corpus-dict copies). Merge rules — one
    // row per round — are all retained.
    def dictRounds(): Seq[Int] =
      new java.io.File(s"$state/dict").listFiles()
        .filter(_.getName.startsWith("r="))
        .map(_.getName.stripPrefix("r=").toInt).toSeq.sorted
    assert(dictRounds() == Seq(19, 20), s"dict rounds on disk: ${dictRounds()}")

    // identical to a cold 20-round run (the JVM-lifetime InterStage path)
    val (cold, coldFin) =
      graft.queries.TextQueries.bpeTrainCheckpointed(spark, d, 20)
    assert(m20 == cold)
    assert(fin20.exceptAll(coldFin).isEmpty && coldFin.exceptAll(fin20).isEmpty)

    // asking for FEWER rounds than persisted returns the exact prefix and
    // that round's dict, training nothing. Round 5's dict was PRUNED
    // (only 19 and 20 remain), so this exercises bpeReplay: the dict is
    // rebuilt by applying the committed rules to a fresh init — and must
    // equal a live 5-round train's symbol table exactly.
    val (m5, fin5) = graft.queries.TextQueries.bpeTrainCheckpointed(
      spark, d, 5, (r, _) => fail(s"round $r re-trained on a full prefix"),
      Some(state))
    assert(m5 == m10.take(5))
    val (_, live5) = graft.queries.TextQueries.bpeTrainCheckpointed(spark, d, 5)
    assert(fin5.exceptAll(live5).isEmpty && live5.exceptAll(fin5).isEmpty,
      "replayed round-5 dict differs from a live 5-round train")

    // A crash mid-merge-write leaves merges/r=N existing but uncommitted
    // (FileOutputCommitter creates the dir before job commit; _SUCCESS is
    // the commit point). That round must drop out of the resumable prefix
    // and re-train identically — not wedge every future resume on an
    // unreadable directory.
    val fs = new org.apache.hadoop.fs.Path(state)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$state/merges/r=20/_SUCCESS"), false)
    val r3 = scala.collection.mutable.ArrayBuffer.empty[Int]
    val (m20b, _) = graft.queries.TextQueries.bpeTrainCheckpointed(
      spark, d, 20, (r, _) => { r3 += r; () }, Some(state))
    assert(r3.toSeq == Seq(20), s"expected exactly round 20 to re-train: $r3")
    assert(m20b == m20)
    // the crash-retrain path re-prunes: still exactly the newest two dicts
    assert(dictRounds() == Seq(19, 20), s"dict rounds on disk: ${dictRounds()}")

    // corpus guard: the same state dir under a different corpus fails loudly
    val e = intercept[IllegalArgumentException] {
      graft.queries.TextQueries.bpeTrainCheckpointed(spark, dir, 3,
        stateDir = Some(state))
    }
    assert(e.getMessage.contains("different corpus"))
  }

  test("t16 plan never funnels word rows through one partition") {
    // The pair-count shuffle is keyed by the symbol pair and the apply
    // side by word; the only tiny-side artifacts allowed are the 1-row
    // argmax broadcasts. A SinglePartition exchange would mean the
    // trainer sorted or folded the whole dictionary in one task.
    val q = SparkEntry.queries("t16b_bpe_vocab")(spark, dir)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(!plan.contains("Exchange SinglePartition"), plan.take(2000))
  }
}
