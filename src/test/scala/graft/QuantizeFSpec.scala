package graft

import org.apache.spark.sql.functions._
import graft.functions.QuantizeF

class QuantizeFSpec extends SparkSpec {
  import spark.implicits._

  // the interpreted HOF reference form the native loops replaced
  private def hofCodes = transform(col("embedding"),
    x => least(greatest(round((x.cast("double") + 1.0) * 127.5, 0), lit(0.0)),
      lit(255.0)).cast("int"))
  private def hofCodeSum = aggregate(hofCodes, lit(0L), (a, c) => a + c)
  private def hofSqErr = aggregate(
    zip_with(col("embedding"), hofCodes,
      (x, c) => { val r = c.cast("double") / 127.5 - 1.0
        (x.cast("double") - r) * (x.cast("double") - r) }),
    lit(0.0), (a, v) => a + v)

  test("quant_code_sum and quant_sq_err are bit-identical to the HOF fold") {
    val e = Tables.load(spark, Sf0001, "embeddings")
    val diff = e.select(
      QuantizeF.quantCodeSum(col("embedding")).as("ncs"), hofCodeSum.as("hcs"),
      QuantizeF.quantSqErr(col("embedding")).as("nse"), hofSqErr.as("hse"))
      .where(col("ncs") =!= col("hcs") || col("nse") =!= col("hse"))
    assert(diff.count() == 0)
  }

  test("quantization edge values clamp and round like the Column form") {
    val df = Seq(Seq(-1f, 1f, 0f, 0.5f, -0.99999994f)).toDF("embedding")
    val row = df.select(
      QuantizeF.quantCodeSum(col("embedding")).as("ncs"), hofCodeSum.as("hcs"))
      .as[(Long, Long)].head()
    assert(row._1 == row._2)
    assert(row._1 == 0L + 255L + 128L + 191L + 0L)
  }

  test("quant_codes / adc_dot / adc_self_dot match the HOF reference") {
    val e = Tables.load(spark, Sf0001, "embeddings")
    // HOF reference for the ADC dot: dequant(code_i) * x_i left fold
    val hofAdcDot = aggregate(
      zip_with(hofCodes, col("embedding"),
        (c, x) => (c.cast("double") / 127.5 - 1.0) * x.cast("double")),
      lit(0.0), (a, v) => a + v)
    val hofSelfDot = aggregate(
      transform(hofCodes, c => { val r = c.cast("double") / 127.5 - 1.0; r * r }),
      lit(0.0), (a, v) => a + v)
    val diff = e.select(
      QuantizeF.quantCodes(col("embedding")).as("nc"), hofCodes.as("hc"),
      QuantizeF.adcDot(QuantizeF.quantCodes(col("embedding")), col("embedding")).as("nd"),
      hofAdcDot.as("hd"),
      QuantizeF.adcSelfDot(QuantizeF.quantCodes(col("embedding"))).as("ns"),
      hofSelfDot.as("hs"))
      .where(col("nc") =!= col("hc") || col("nd") =!= col("hd") ||
        col("ns") =!= col("hs"))
    assert(diff.count() == 0)
  }

  test("lut_sum matches the HOF lookup fold") {
    // codes index into a 2-slot-per-subspace LUT: lut[j*2 + codes[j]]
    val df = Seq((Seq(0, 1, 1, 0), Seq(1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0)))
      .toDF("codes", "lut")
    val hof = aggregate(
      zip_with(col("codes"), sequence(lit(0), lit(3)),
        (c, j) => element_at(col("lut"), (j * 2 + c + 1).cast("int"))),
      lit(0.0), (a, v) => a + v)
    val row = df.select(QuantizeF.lutSum(col("codes"), col("lut"), 2).as("n"),
      hof.as("h")).as[(Double, Double)].head()
    assert(row._1 == row._2)
    assert(row._1 == 1.0 + 4.0 + 6.0 + 7.0)
  }

  test("quant expressions stay inside whole-stage codegen") {
    val e = Tables.load(spark, Sf0001, "embeddings")
    val plan = e.select(QuantizeF.quantCodeSum(col("embedding")),
      QuantizeF.quantSqErr(col("embedding")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [quant_code_sum"), plan.take(500))
  }
}
