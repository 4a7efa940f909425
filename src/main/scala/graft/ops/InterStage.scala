package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-JVM inter-stage table materialization: write a stage output to a
  * session-temp parquet once, read it back many times.
  *
  * This replaces `persist()` inside query builders for three reasons:
  *   - nothing stays in the Spark block cache after a query runs, so
  *     library callers can't leak cached blocks (persist-without-unpersist
  *     was the round-2 hazard);
  *   - the same stage output is shared across queries in one session — the
  *     shingle inverted index feeds both the Jaccard and the MinHash dedup
  *     passes, and is computed once;
  *   - at cluster scale this is exactly how a multi-stage dedup pipeline
  *     runs: each stage writes a table, downstream stages scan it with
  *     column pruning and filter pushdown (which in-memory persist can't do).
  *
  * The temp root lives for the JVM and is removed by a shutdown hook.
  */
object InterStage {

  private lazy val root: java.nio.file.Path = {
    val p = java.nio.file.Files.createTempDirectory("graft_interstage_")
    sys.addShutdownHook {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(p.toFile)
    }
    p
  }

  private val done = scala.collection.concurrent.TrieMap.empty[String, String]

  /** Cache key for a stage derived from `dir/table.parquet` that changes
    * when the source file changes — fixture dirs that rewrite their parquet
    * between runs re-materialize instead of serving stale data.
    */
  def tableKey(dir: String, table: String): String = {
    val f = new java.io.File(s"$dir/$table.parquet")
    s"$dir/$table@${f.lastModified}:${f.length}"
  }

  /** Materialize `df` under `key` if not already done this JVM; return a
    * reader over the parquet. `df` is by-name: never constructed on a hit.
    */
  def materialize(spark: SparkSession, key: String, df: => DataFrame): DataFrame = {
    val path = done.getOrElseUpdate(key, {
      val p = root.resolve(
        "t" + java.lang.Integer.toHexString(key.hashCode) + "_" + done.size).toString
      df.write.mode("overwrite").parquet(p)
      p
    })
    spark.read.parquet(path)
  }
}
