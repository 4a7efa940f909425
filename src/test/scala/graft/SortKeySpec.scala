package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => ScTest}
import graft.functions.{SortKeyBits, SortKeyF}
import graft.ops.Relational

/** The order-exact double↔long codec behind the bounded-heap top-k
  * (Relational.topKByScore): descKey must reverse the double order
  * totally and descKeyInv must invert it bit-for-bit — the two properties
  * that make the heap form provably equal to the row_number window it
  * replaced in the ANN re-rank paths.
  */
class SortKeySpec extends SparkSpec {
  import spark.implicits._

  private val finiteDoubles: Gen[Double] = Gen.oneOf(
    Gen.chooseNum(-1.0, 1.0),                      // cosine range
    Gen.chooseNum(Double.MinValue, Double.MaxValue),
    Gen.oneOf(0.0, -0.0, Double.MinPositiveValue,
      -Double.MinPositiveValue, 1.0, -1.0))

  test("descKey reverses double order exactly; descKeyInv is the exact inverse") {
    val res = ScTest.check(
      ScTest.Parameters.default.withMinSuccessfulTests(300),
      Prop.forAll(finiteDoubles, finiteDoubles) { (a: Double, b: Double) =>
        val (ka, kb) = (SortKeyBits.descKey(a), SortKeyBits.descKey(b))
        val orderOk = if (a < b) ka > kb else if (a > b) ka < kb else true
        val roundTrip =
          java.lang.Double.doubleToRawLongBits(SortKeyBits.descKeyInv(ka)) ==
            java.lang.Double.doubleToRawLongBits(a)
        orderOk && roundTrip
      })
    assert(res.passed, s"sort-key property: ${res.status}")
  }

  test("codegen'd column expressions round-trip bit-for-bit") {
    val xs = Seq(0.0, -0.0, 1.0, -1.0, 0.4999999999, math.Pi, -math.E,
      Double.MinPositiveValue, Double.MaxValue, Double.MinValue)
    val bad = xs.toDF("x")
      .withColumn("rt", SortKeyF.descKeyInv(SortKeyF.descKey(col("x"))))
      .where(col("rt") =!= col("x") ||
        (col("x") === 0.0 && col("rt").cast("string") =!= col("x").cast("string")))
    assert(bad.count() == 0)
  }

  test("topKByScore equals the row_number window it replaces") {
    val rnd = new scala.util.Random(7)
    // Deliberate duplicate scores so tie-breaks are exercised.
    val rows = (1 to 500).map(i =>
      (i.toLong % 7, i.toLong, math.rint(rnd.nextDouble() * 20) / 20 - 0.5))
    val df = rows.toDF("g", "id", "score")
    val viaAgg = Relational.topKByScore(df, Seq("g"), col("score"), col("id"),
        3, "id", "score")
      .select("g", "id", "score").as[(Long, Long, Double)].collect().toSet
    val viaWindow = Relational.topKPerGroup(df, Seq(col("g")),
        Seq(col("score").desc, col("id")), 3)
      .select("g", "id", "score").as[(Long, Long, Double)].collect().toSet
    assert(viaAgg == viaWindow)
    assert(viaAgg.nonEmpty)
  }
}
