package graft

import org.apache.spark.sql.functions._
import graft.ops.TextOps

/** TextOps.editDistanceJoin (PassJoin-style segment blocking) must equal
  * the brute-force all-pairs levenshtein filter — including indel-shifted
  * segments, the short-string slivers, and the tau boundary. The t22 gate
  * checks the same identity cross-engine against DuckDB's levenshtein.
  */
class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  private def brute(df: org.apache.spark.sql.DataFrame, tau: Int) =
    df.select(col("id").as("id1"), col("s").as("s1"))
      .join(df.select(col("id").as("id2"), col("s").as("s2")),
        col("id1") < col("id2"))
      .withColumn("dist", levenshtein(col("s1"), col("s2")).cast("long"))
      .where(col("dist") <= tau)
      .select("id1", "id2", "dist")

  test("blocked join == brute force on the sf0.001 corpus prefixes") {
    val t = Tables.load(spark, Sf0001, "documents")
      .select(col("doc_id").as("id"), substring(col("text"), 1, 30).as("s"))
    val got = TextOps.editDistanceJoin(t, "id", "s", 2)
    val want = brute(t, 2)
    assert(got.count() > 0) // discriminative: the corpus has near-dup prefixes
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  test("indel shifts, short strings, and the tau boundary are all exact") {
    val rows = Seq(
      1L -> "abcdefghij",
      2L -> "Xabcdefghij", // 1 insertion at front: every segment shifts
      3L -> "abcdefghijXY", // 2 insertions at end
      4L -> "abcdefghijXYZ", // 3 edits from id 1: outside tau
      5L -> "abcXdefgYhij", // 2 inserts mid-string shift later segments
      6L -> "", // short sliver
      7L -> "ab", // short sliver; (6,7) is a short-short pair
      8L -> "abcd", // long side of the short-long pair (7,8)
      9L -> "zzzzzzzzzz")
    val t = rows.toDF("id", "s")
    val got = TextOps.editDistanceJoin(t, "id", "s", 2)
    assert(got.except(brute(t, 2)).isEmpty && brute(t, 2).except(got).isEmpty)
    val pairs = got.select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(pairs((1L, 2L)) && pairs((1L, 3L)) && pairs((1L, 5L)))
    assert(pairs((6L, 7L)) && pairs((7L, 8L)))
    assert(!pairs((1L, 4L)))
  }
}
