package graft

import org.apache.spark.sql.functions._
import graft.ops.Relational

/** Z-order is a LAYOUT claim, so the spec measures layout: after
  * clustering on (a, b), every file's min/max span on EACH dimension must
  * be a small fraction of the global range — that is what lets parquet
  * footer stats skip files for a predicate on either column. A
  * single-column sort is the control: its sort column narrows but the
  * other dimension spans ~the full range in every file (no skipping).
  */
class ZorderSpec extends SparkSpec {

  /** Mean per-file (max−min)/(globalMax−globalMin) of `c` for the parquet
    * files under `path` — 1.0 means every file covers the whole range
    * (zero skipping), files^(-1/dims) is the z-order ideal.
    */
  private def meanSpan(path: String, c: String): Double = {
    val df = spark.read.parquet(path)
    val g = df.agg(min(col(c)).cast("double"), max(col(c)).cast("double")).head()
    val range = g.getDouble(1) - g.getDouble(0)
    val spans = df.groupBy(input_file_name().as("f"))
      .agg(((max(col(c)) - min(col(c))).cast("double") / range).as("s"))
      .agg(avg(col("s"))).head().getDouble(0)
    spans
  }

  test("zorderBy narrows per-file spans on BOTH dimensions; single sort only on one") {
    // A uniform 2-D grid — the shape where the ideal is crisp: 16 files,
    // 2 dims -> ideal span ~ 16^(-1/2) = 0.25 per dimension.
    val n = 64
    val grid = spark.range(n.toLong * n)
      .select((col("id") % n).as("a"), (col("id") / n).cast("long").as("b"),
        col("id").as("payload"))
    val zdir = java.nio.file.Files.createTempDirectory("graft_z_").toString
    val sdir = java.nio.file.Files.createTempDirectory("graft_s_").toString
    Relational.zorderBy(grid, Seq("a", "b"), 16)
      .write.mode("overwrite").parquet(zdir)
    grid.repartitionByRange(16, col("a")).sortWithinPartitions(col("a"))
      .write.mode("overwrite").parquet(sdir)

    val (za, zb) = (meanSpan(zdir, "a"), meanSpan(zdir, "b"))
    val (sa, sb) = (meanSpan(sdir, "a"), meanSpan(sdir, "b"))
    // z-order: both dimensions narrow (allow slack over the 0.25 ideal for
    // range-partition boundary effects)
    assert(za < 0.5, s"zorder dim a mean span $za")
    assert(zb < 0.5, s"zorder dim b mean span $zb")
    // control: the single-column sort narrows its own dimension only
    assert(sa < 0.2, s"sorted dim a mean span $sa")
    assert(sb > 0.9, s"sorted dim b mean span $sb — control should NOT narrow b")
    // and content is untouched (layout-only contract)
    assert(spark.read.parquet(zdir).exceptAll(grid).isEmpty &&
      grid.exceptAll(spark.read.parquet(zdir)).isEmpty)
  }

  test("zorderBy ranks nulls at the origin and survives constant columns") {
    import spark.implicits._
    val df = Seq[(java.lang.Long, java.lang.Long)](
      (null, 5L), (1L, 5L), (2L, 5L), (100L, 5L))
      .toDF("a", "b")
    // constant b: degenerate range must not divide by zero; null a must
    // not be dropped or crash
    val out = Relational.zorderBy(df, Seq("a", "b"), 2)
    assert(out.count() == 4)
    assert(out.where(col("a").isNull).count() == 1)
  }
}
