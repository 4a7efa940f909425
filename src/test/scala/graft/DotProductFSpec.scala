package graft

import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions
import graft.ops.VectorOps

class DotProductFSpec extends SparkSpec {
  import spark.implicits._

  test("dot_f is bit-identical to the HOF fold on real embeddings") {
    val e = Tables.load(spark, Sf0001, "embeddings")
    val pairs = e.as("x").join(e.as("y"), col("x.vec_id") < col("y.vec_id"))
    val diff = pairs.select(
      GraftFunctions.dot_f(col("x.embedding"), col("y.embedding")).as("native"),
      VectorOps.dotFold(col("x.embedding"), col("y.embedding")).as("fold"))
      .where(col("native") =!= col("fold")) // bitwise: any ULP diff fails =!=
    assert(diff.count() == 0)
  }

  test("dot_f null and length semantics") {
    val df = Seq(
      (Some(Seq(1f, 2f)), Some(Seq(3f, 4f))),
      (None, Some(Seq(1f))),
      (Some(Seq(1f, 2f, 5f)), Some(Seq(2f)))).toDF("a", "b")
    val out = df.select(GraftFunctions.dot_f(col("a"), col("b")).as("d"))
      .as[Option[Double]].collect()
    assert(out(0).contains(11.0))
    assert(out(1).isEmpty)        // null input -> null
    assert(out(2).contains(2.0))  // min-length semantics
  }

  test("dot_f double-array and mixed float/double operands match the fold") {
    // float embedding x double centroid — the e6 IVF scoring shape
    val e = Tables.load(spark, Sf0001, "embeddings")
      .withColumn("dvec", transform(col("embedding"), x => x.cast("double") * 1.5))
    val diff = e.select(
      GraftFunctions.dot_f(col("embedding"), col("dvec")).as("mixed"),
      VectorOps.dotFold(col("embedding"), col("dvec")).as("foldMixed"),
      GraftFunctions.dot_f(col("dvec"), col("dvec")).as("dd"),
      VectorOps.dotFold(col("dvec"), col("dvec")).as("foldDd"))
      .where(col("mixed") =!= col("foldMixed") || col("dd") =!= col("foldDd"))
    assert(diff.count() == 0)
  }

  test("all native functions are SQL-callable after registration") {
    GraftFunctions.register(spark)
    val r = spark.sql("SELECT dot_f(array(1.0f, 2.0f), array(3.0f, 4.0f)) AS d")
      .as[Double].head()
    assert(r == 11.0)
    val q = spark.sql(
      "SELECT quant_code_sum(array(0.0f)) AS cs, quant_sq_err(array(1.0f)) AS se, " +
        "simhash60(array(3L)) AS sh")
    val row = q.head()
    assert(row.getLong(0) == 128L)
    assert(row.getDouble(1) == 0.0)
    assert(row.getLong(2) == 3L) // bits 0 and 1 positive, others negative
    val agg = spark.sql(
      "SELECT topk_pairs(o, i, 2) AS t FROM VALUES (3L, 30L), (1L, 10L), " +
        "(2L, 20L) AS v(o, i)")
      .selectExpr("t[0].ord", "t[0].id", "t[1].ord", "t[1].id").head()
    assert((agg.getLong(0), agg.getLong(1), agg.getLong(2), agg.getLong(3)) ==
      ((1L, 10L, 2L, 20L)))
  }

  test("topk_pairs k validation: arity, fractional, non-positive, decimal") {
    GraftFunctions.register(spark)
    def err(sql: String): org.apache.spark.sql.AnalysisException =
      intercept[org.apache.spark.sql.AnalysisException](spark.sql(sql).collect())
    // wrong arity is a user-facing analysis error, not an IndexOutOfBounds
    assert(err("SELECT topk_pairs(o, i) FROM VALUES (1L, 1L) AS v(o, i)")
      .getCondition == "WRONG_NUM_ARGS.WITHOUT_SUGGESTION")
    assert(err("SELECT topk_pairs(o, i, 2, 3) FROM VALUES (1L, 1L) AS v(o, i)")
      .getCondition == "WRONG_NUM_ARGS.WITHOUT_SUGGESTION")
    // fractional / non-positive / non-foldable k
    assert(err("SELECT topk_pairs(o, i, 2.5) FROM VALUES (1L, 1L) AS v(o, i)")
      .getCondition == "INVALID_PARAMETER_VALUE.INTEGER")
    assert(err("SELECT topk_pairs(o, i, 0) FROM VALUES (1L, 1L) AS v(o, i)")
      .getCondition == "INVALID_PARAMETER_VALUE.INTEGER")
    assert(err("SELECT topk_pairs(o, i, o) FROM VALUES (1L, 1L) AS v(o, i)")
      .getCondition == "INVALID_PARAMETER_VALUE.INTEGER")
    // integral-valued Decimal is accepted like Spark builtins accept it
    val dec = spark.sql(
      "SELECT topk_pairs(o, i, CAST(2 AS DECIMAL(10, 0))) AS t " +
        "FROM VALUES (3L, 30L), (1L, 10L), (2L, 20L) AS v(o, i)")
      .selectExpr("size(t)").head().getInt(0)
    assert(dec == 2)
    val dec2 = spark.sql(
      "SELECT topk_pairs(o, i, CAST(2.0 AS DECIMAL(10, 1))) AS t " +
        "FROM VALUES (3L, 30L), (1L, 10L) AS v(o, i)")
      .selectExpr("size(t)").head().getInt(0)
    assert(dec2 == 2) // scale > 0 but integral value: still accepted
  }

  test("dot_f stays inside whole-stage codegen") {
    val e = Tables.load(spark, Sf0001, "embeddings")
    val plan = e.select(GraftFunctions.dot_f(col("embedding"), col("embedding")))
      .queryExecution.executedPlan.toString
    // the "*(n)" prefix marks operators fused into a WholeStageCodegen stage
    assert(plan.contains("*(1) Project [dot_f"), plan.take(500))
  }
}
