package graft

import org.apache.spark.sql.functions._
import graft.ops.TextOps

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  test("wordShingles: n-grams in order; short docs -> empty") {
    val df = Seq("a b c d", "a b").toDF("t")
      .select(TextOps.wordShingles(TextOps.tokens(col("t")), 3).as("s"))
    val rows = df.as[Seq[String]].collect()
    assert(rows(0) == Seq("a b c", "b c d"))
    assert(rows(1).isEmpty)
  }

  test("h60 matches a reference sha2 prefix parse") {
    // sha256("abc") = ba7816bf8f01cfe... -> first 15 hex = 0x0ba7816bf8f01cf...
    val got = Seq("abc").toDF("t").select(TextOps.h60(col("t")).as("h")).as[Long].head()
    assert(got == java.lang.Long.parseLong(
      "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad".take(15), 16))
    assert(got == graft.ops.Multimodal.h60("abc")) // driver-side twin agrees
  }

  test("minhash signature match rate approximates Jaccard") {
    // Two docs sharing exactly half their shingles: J = 1/3.
    val shared = (0 until 50).map(i => s"s$i")
    val a = shared ++ (0 until 50).map(i => s"a$i")
    val b = shared ++ (0 until 50).map(i => s"b$i")
    val k = 128
    val df = Seq(a, b).toDF("shs")
      .select(TextOps.minhashSignature(TextOps.shingleHashes(col("shs")), k).as("sig"))
    val Array(sa, sb) = df.as[Seq[Long]].collect()
    val matches = sa.zip(sb).count { case (x, y) => x == y }
    val est = matches.toDouble / k
    assert(math.abs(est - 1.0 / 3.0) < 0.15, s"est=$est expected ~0.333")
  }

  test("native simhash60 is bit-identical to the fold form on real docs") {
    val docs = Tables.load(spark, Sf0001, "documents")
    val diff = docs.select(
      TextOps.simhash60(TextOps.tokens(col("text"))).as("native"),
      TextOps.simhash60Fold(TextOps.tokens(col("text"))).as("fold"))
      .where(col("native") =!= col("fold"))
    assert(diff.count() == 0)
  }

  test("simhash_agg over exploded hashes matches the per-row array form on real docs") {
    val docs = Tables.load(spark, Sf0001, "documents")
    val viaAgg = docs
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("w"))
      .select(col("doc_id"), TextOps.h60(col("w")).as("h"))
      .repartition(7) // force partial buffers to merge across partitions
      .groupBy(col("doc_id"))
      .agg(graft.functions.SimHashAgg.simhashAgg(col("h")).as("simhash"))
    val viaRow = docs.select(col("doc_id"),
      TextOps.simhash60(TextOps.tokens(col("text"))).as("simhash"))
    assert(viaAgg.exceptAll(viaRow).count() == 0)
    assert(viaRow.exceptAll(viaAgg).count() == 0)
  }

  test("simhash_agg is SQL-callable and ignores null hashes") {
    graft.functions.GraftFunctions.register(spark)
    Seq((1L, Some(3L)), (1L, None), (2L, Some(0L)))
      .toDF("g", "h").createOrReplaceTempView("simagg_in")
    val out = spark.sql(
      "SELECT g, simhash_agg(h) sh FROM simagg_in GROUP BY g ORDER BY g")
      .as[(Long, Long)].collect()
    // g=1: one hash 3 -> bits 0,1 positive, rest negative -> sig = 3
    // g=2: one hash 0 -> every bit sums -1 -> sig = 0
    assert(out.toSeq == Seq((1L, 3L), (2L, 0L)))
  }

  test("relational simhashRows matches the native per-row form on real docs") {
    val docs = Tables.load(spark, Sf0001, "documents")
    val native = docs.select(col("doc_id"),
      TextOps.simhash60(TextOps.tokens(col("text"))).as("simhash"))
    val relational = TextOps.simhashRows(docs, "doc_id", "text")
    assert(native.exceptAll(relational).count() == 0)
    assert(relational.exceptAll(native).count() == 0)
  }

  test("simhash: identical docs collide; disjoint docs differ") {
    val df = Seq("x y z x y", "x y z x y", "p q r s t").toDF("t")
      .select(TextOps.simhash60(TextOps.tokens(col("t"))).as("h")).as[Long].collect()
    assert(df(0) == df(1))
    assert(df(0) != df(2))
  }

  test("winnowing fingerprints: deterministic; near-identical docs share most fingerprints") {
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val edited = base.replace("today", "tomoro")
    val df = Seq((1L, base), (2L, base), (3L, edited)).toDF("doc_id", "text")
    val out = TextOps.winnowFingerprints(df, "doc_id", "text").orderBy("doc_id").collect()
    assert(out(0).getAs[String]("fp_digest") == out(1).getAs[String]("fp_digest"))
    assert(out(0).getAs[String]("fp_digest") != out(2).getAs[String]("fp_digest"))
    assert(out.forall(_.getAs[Long]("n_fingerprints") > 0))
  }

  test("repeated spans: cross-doc shared region found, merged maximal, unique doc clean") {
    // Docs 1 and 2 share a 40-char region (surrounded by unique prose);
    // doc 3 repeats a 25-char phrase within itself; doc 4 is unique.
    val shared = "0123456789abcdefghijklmnopqrstuvwxyzABCD" // 40 chars
    val phrase = "repeat me twice exactly !" // 25 chars
    val df = Seq(
      (1L, s"unique lead-in text one. $shared and a unique tail here."),
      (2L, s"a different opening now: $shared closing words differ too."),
      (3L, s"$phrase middle filler text $phrase"),
      (4L, "entirely singular content with no duplicated twenty-gram at all"))
      .toDF("doc_id", "text")
    val spans = TextOps.repeatedSpanRows(df, "doc_id", "text", 20)
      .orderBy("doc_id", "span_start")
      .collect()
      .map(r => (r.getLong(0), r.getAs[Long]("span_start"), r.getAs[Long]("span_len")))
    // Docs 1/2: exactly one maximal span each. The duplicated region is
    // the 40 shared chars PLUS the space on each side (both docs embed it
    // as " <shared> "), so 42 chars starting at position 25 (1-based).
    val d1 = spans.filter(_._1 == 1L)
    val d2 = spans.filter(_._1 == 2L)
    assert(d1.length == 1 && d2.length == 1)
    assert(d1.head._3 == 42L && d2.head._3 == 42L)
    assert(d1.head._2 == 25L)
    // Doc 3: the phrase occurs at positions 1 and 47; the two 25-char
    // covered regions are > 20 apart, so two disjoint spans of 25.
    val d3 = spans.filter(_._1 == 3L)
    assert(d3.map(_._3).toSeq == Seq(25L, 25L))
    // Doc 4: nothing.
    assert(!spans.exists(_._1 == 4L))
  }

  test("band digests: equal signatures share all bands, perturbed share fewer") {
    val sig1 = (1L to 12L).toSeq
    val sig2 = sig1.updated(0, 99L) // perturb first band only
    val df = Seq(sig1, sig2).toDF("sig")
      .select(TextOps.bandDigests(col("sig"), 4, 3).as("b")).as[Seq[String]].collect()
    assert(df(0).drop(1) == df(1).drop(1)) // bands 1..3 identical
    assert(df(0).head != df(1).head)       // band 0 differs
  }
}
