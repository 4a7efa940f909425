package graft

import org.apache.spark.sql.functions._
import graft.ops.Graph

class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("connectedComponents labels components with their min id") {
    // two components {1,2,3,9} and {5,7}, singleton {4}
    val nodes = Seq(1L, 2L, 3L, 4L, 5L, 7L, 9L).toDF("id")
    val edges = Seq((2L, 1L), (3L, 9L), (2L, 3L), (5L, 7L)).toDF("a", "b")
    val out = Graph.connectedComponents(nodes, "id", edges, col("a"), col("b"))
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 9L -> 1L,
      4L -> 4L, 5L -> 5L, 7L -> 5L))
  }

  test("connectedComponents converges on a long path (multi-round propagation)") {
    // path 0-1-2-...-19: min label must travel the full diameter
    val n = 20
    val nodes = (0 until n).map(_.toLong).toDF("id")
    val edges = (0 until n - 1).map(i => (i.toLong, i + 1L)).toDF("a", "b")
    val out = Graph.connectedComponents(nodes, "id", edges, col("a"), col("b"))
      .as[(Long, Long)].collect()
    assert(out.length == n && out.forall(_._2 == 0L))
  }

  test("connectedComponents with a reliable checkpoint dir matches local mode") {
    val ckpt = java.nio.file.Files.createTempDirectory("graft_cc_ckpt_")
    // The op only claims the session-global dir when none is set; another
    // suite in the shared session may have set one, so pin it here — the
    // rdd-* placement assertion below must see THIS directory.
    spark.sparkContext.setCheckpointDir(ckpt.toString)
    val nodes = Seq(1L, 2L, 3L, 4L, 5L, 7L, 9L).toDF("id")
    val edges = Seq((2L, 1L), (3L, 9L), (2L, 3L), (5L, 7L)).toDF("a", "b")
    val out = Graph.connectedComponents(nodes, "id", edges, col("a"), col("b"),
      checkpointDir = Some(ckpt.toString)).as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 9L -> 1L,
      4L -> 4L, 5L -> 5L, 7L -> 5L))
    // reliable checkpoints actually landed on storage (rdd-* block dirs)
    def files(f: java.io.File): Seq[java.io.File] =
      Option(f.listFiles()).toSeq.flatten.flatMap(c => c +: files(c))
    assert(files(ckpt.toFile).exists(_.getName.startsWith("rdd-")))
  }

  test("connectedComponents with no edges returns every node as its own cluster") {
    val nodes = Seq(10L, 20L).toDF("id")
    val edges = Seq.empty[(Long, Long)].toDF("a", "b")
    val out = Graph.connectedComponents(nodes, "id", edges, col("a"), col("b"))
      .as[(Long, Long)].collect().toMap
    assert(out == Map(10L -> 10L, 20L -> 20L))
  }
}
