package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => ScTest}
import graft.ops.Relational
import graft.ops.Relational.Bucket

/** The SURVEY §5.4 property-based tests, as promised: ScalaCheck over the
  * two cleanse primitives every pipeline row passes through. Uses raw
  * ScalaCheck (`Prop`/`Test.check`) rather than scalatestplus — the
  * offline jar set ships scalatest and scalacheck only.
  *
  * Each generated case evaluates a BATCH of values in one Spark job
  * (listOfN inside the generator), so 30 cases cost 30 tiny jobs, not
  * 30 × N.
  */
class RelationalPropertySpec extends SparkSpec {
  import spark.implicits._

  private def check(label: String, cases: Int)(p: Prop): Unit = {
    val res = ScTest.check(
      ScTest.Parameters.default.withMinSuccessfulTests(cases), p)
    assert(res.passed, s"$label: ${res.status}")
  }

  // Band generator: arbitrary count (including zero), arbitrary optional
  // finite bounds in arbitrary order — bucketize promises totality for
  // ANY strategy, not just well-formed ascending ones.
  private val genBound: Gen[Option[Double]] =
    Gen.option(Gen.chooseNum(-1e6, 1e6))
  private val genBucket: Gen[Bucket] = for {
    lo <- genBound; hi <- genBound
    label <- Gen.oneOf("B0", "B1", "B2", "B3", "B4")
  } yield Bucket(lo, hi, label)
  private val genBands: Gen[List[Bucket]] = Gen.choose(0, 5)
    .flatMap(n => Gen.listOfN(n, genBucket))

  // Value generator: full double range plus the adversarial corners.
  private val genValue: Gen[java.lang.Double] = Gen.frequency(
    6 -> Gen.chooseNum(-1e6, 1e6).map(java.lang.Double.valueOf),
    2 -> Gen.oneOf(Seq(0.0, -0.0, Double.MinValue, Double.MaxValue,
      Double.MinPositiveValue, Double.NegativeInfinity,
      Double.PositiveInfinity, Double.NaN).map(java.lang.Double.valueOf)),
    1 -> Gen.const(null: java.lang.Double))

  test("property: bucketize is total — label ∈ strategy ∪ {nullLabel} for all of ℝ ∪ {null}") {
    check("bucketize totality", 25)(Prop.forAll(
      genBands, Gen.listOfN(60, genValue)) { (bands, xs) =>
      val legal = bands.map(_.label).toSet + "Unknown"
      val out = xs.toDF("x")
        .select(Relational.bucketize(col("x"), bands).as("b"))
        .as[String].collect()
      out.length == xs.length && out.forall(legal.contains)
    })
  }

  test("property: bucketize matches the first-matching-band model (NaN-free reals)") {
    // The executable model: first band in declaration order whose
    // half-open condition holds; null and no-match -> nullLabel. NaN is
    // excluded HERE (covered by the totality property above): Spark
    // orders NaN greater than every double, Scala's >= says false — the
    // engine semantics, not a bug (SparkSpec pins the pipeline's actual
    // NaN handling upstream where values are cleansed before bucketize).
    def model(x: java.lang.Double, bands: List[Bucket]): String =
      if (x == null) "Unknown"
      else bands.find { b =>
        val loOk = b.lo.forall(x >= _); val hiOk = b.hi.forall(x < _)
        loOk && hiOk
      }.fold("Unknown")(_.label)
    val genReal: Gen[java.lang.Double] =
      genValue.suchThat(v => v == null || !v.isNaN)
    check("bucketize model", 25)(Prop.forAll(
      genBands, Gen.listOfN(60, genReal)) { (bands, xs) =>
      val got = xs.toDF("x")
        .select(Relational.bucketize(col("x"), bands).as("b"))
        .as[String].collect().toSeq
      got == xs.map(model(_, bands))
    })
  }

  // Pipe-free non-null strings: hashId joins with '|' before sha2, so
  // injectivity is promised only for inputs that can't forge the
  // separator (("a|", "b") and ("a", "|b") both serialize to "a||b") and
  // contain no nulls (concat_ws SKIPS nulls: ("a", null) ≡ ("a")). The
  // pipeline feeds it cleansed key columns, which satisfy both.
  private val genKey: Gen[String] =
    Gen.chooseNum(1, 8).flatMap(n => Gen.listOfN(n,
      Gen.frequency(8 -> Gen.alphaNumChar, 1 -> Gen.oneOf(' ', '-', '_')))
      .map(_.mkString))

  test("property: hashId is deterministic and injective on pipe-free inputs") {
    check("hashId", 25)(Prop.forAll(
      Gen.listOfN(40, Gen.zip(genKey, genKey))) { pairs =>
      val df = pairs.toDF("a", "b")
      def run() = df
        .select(col("a"), col("b"),
          Relational.hashId(Seq(col("a"), col("b"))).as("h"))
        .as[(String, String, String)].collect().toSeq
      val h1 = run(); val h2 = run()
      val byInput = h1.groupBy(r => (r._1, r._2)).view.mapValues(_.map(_._3))
      // determinism: same run-to-run AND same for equal tuples in-run
      val deterministic = h1 == h2 && byInput.values.forall(_.distinct.size == 1)
      // injectivity-on-inputs: distinct tuples -> distinct digests
      val hashesPerTuple = byInput.mapValues(_.head).toMap
      deterministic &&
        hashesPerTuple.values.toSeq.distinct.size == hashesPerTuple.size &&
        hashesPerTuple.values.forall(_.length == 64)
    })
  }
}
