package graft

import org.apache.spark.sql.functions._
import graft.ops.Relational

/** The incremental-SCD2 algebra, property-tested: for ANY in-order cut of
  * an event stream into batches, folding `scd2Merge` over the batches must
  * equal one `scd2Compress` pass over everything. Randomized streams with
  * the hostile shapes — null tiers (leading, trailing, interleaved),
  * timestamp ties broken by event_id, users whose events straddle every
  * cut, single-event users — because the StreamingSpec end-to-end test
  * only exercises two cuts of one real corpus.
  */
class Scd2MergeSpec extends SparkSpec {
  import spark.implicits._

  private def compress(rows: Seq[(Long, Long, Long, Option[Long])]) =
    Relational.scd2Compress(
      rows.toDF("user_id", "event_id", "tus", "tier")).drop("anchor_eid")

  test("merge over any batch cut equals single-pass compression (randomized)") {
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      val nEvents = 60 + rnd.nextInt(60)
      // ~6 users, tus drawn from a SMALL range so ties are common; tier
      // null with p=0.25 so null runs appear in every position
      val stream = (0 until nEvents).map { i =>
        (rnd.nextInt(6).toLong, i.toLong, (1000 + rnd.nextInt(20)).toLong,
          if (rnd.nextInt(4) == 0) Option.empty[Long] else Some(rnd.nextInt(3).toLong))
      }.sortBy(e => (e._3, e._2)) // in-order delivery: (tus, event_id)
      // MULTISET compare: the tiny tus range makes duplicate closed
      // segments common, and a Set would forgive a merge that drops or
      // doubles one copy of a twin.
      def multiset(df: org.apache.spark.sql.DataFrame) =
        df.collect().toSeq.map(_.toString).sorted
      val expected = multiset(compress(stream))

      // 2-4 cuts at random order-index positions, plus one EXPLICITLY
      // empty batch spliced in (distinct cut points can never produce an
      // empty slice, and the no-new-events micro-batch is a real path)
      val nCuts = 1 + rnd.nextInt(3)
      val cuts = (Seq(0, nEvents) ++ (1 to nCuts).map(_ => rnd.nextInt(nEvents + 1)))
        .distinct.sorted
      val sliced = cuts.zip(cuts.tail).map { case (a, b) => stream.slice(a, b) }
      val batches = sliced.patch(1 + rnd.nextInt(sliced.size),
        Seq(Seq.empty[(Long, Long, Long, Option[Long])]), 0)
      val folded = batches.tail.foldLeft(
        Relational.scd2Compress(batches.head
          .toDF("user_id", "event_id", "tus", "tier"))) { (segs, batch) =>
        Relational.scd2Merge(segs,
          batch.toDF("user_id", "event_id", "tus", "tier"))
      }
      val got = multiset(folded.drop("anchor_eid"))
      assert(got == expected,
        s"seed=$seed cuts=$cuts: merged history diverged from single pass\n" +
          s"missing: ${expected.diff(got)}\nextra: ${got.diff(expected)}")
    }
  }
}
