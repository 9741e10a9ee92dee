package graft

import graft.operators.{ConnectedComponents, TextOps}
import org.apache.spark.sql.functions._

/** Star-contraction connected components vs a test-side union-find ground
  * truth, on the graph shapes that break naive approaches. */
class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  /** Test-side union-find ground truth: component minimum per node. */
  private def unionFind(nodes: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map(nodes.map(n => n -> n): _*)
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      r
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // path-compress to the minimum root (unions always kept the min as root)
    nodes.map(n => n -> find(n)).toMap
  }

  private def run(nodes: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Long] =
    ConnectedComponents.labels(
      nodes.toDF("id"),
      edges.toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("long path with permuted ids converges to one component") {
    // Path in shuffled id order — diameter 40, min in the middle; label
    // propagation would need ~40 rounds, star-contraction must not.
    val perm = scala.util.Random.shuffle((1L to 41L).toList)
    val edges = perm.zip(perm.tail)
    val nodes = perm
    val got = run(nodes, edges)
    assert(got.values.toSet == Set(1L))
  }

  test("multiple components, singletons, self-loops, duplicate edges") {
    val nodes = (1L to 12L).toSeq
    val edges = Seq[(Long, Long)](
      (2, 5), (5, 7), (7, 2),       // triangle {2,5,7}
      (3, 9), (9, 3), (3, 3),       // pair with dup + self-loop {3,9}
      (10, 11), (11, 12))           // path {10,11,12}
    val got = run(nodes, edges)
    assert(got == unionFind(nodes, edges))
    assert(got(7L) == 2L && got(9L) == 3L && got(12L) == 10L)
    assert(got(1L) == 1L && got(4L) == 4L) // singletons self-label
  }

  test("random graph matches union-find ground truth") {
    val rnd = new scala.util.Random(42)
    val nodes = (1L to 200L).toSeq
    val edges = Seq.fill(120)((rnd.nextInt(200).toLong + 1, rnd.nextInt(200).toLong + 1))
      .filter { case (a, b) => a != b }
    val got = run(nodes, edges)
    assert(got == unionFind(nodes, edges))
    // non-vacuity guard: a mergeless fixture (every node its own label)
    // would pass the equality without exercising label propagation
    assert(got.exists { case (n, l) => n != l },
      "fixture produced no multi-node component")
  }

  test("reliable=true without a checkpoint dir fails fast with a clear message") {
    // must run BEFORE the reliable-checkpoint test: setCheckpointDir has
    // no unset, so this asserts the fresh-context behavior
    assume(spark.sparkContext.getCheckpointDir.isEmpty)
    val e = intercept[IllegalArgumentException] {
      ConnectedComponents.labels(
        Seq(1L, 2L).toDF("id"), Seq((1L, 2L)).toDF("a", "b"), reliable = true)
        .collect()
    }
    assert(e.getMessage.contains("setCheckpointDir"))
  }

  test("reliable-checkpoint path produces identical labels to localCheckpoint") {
    // The cluster-grade configuration: per-round state in a fault-tolerant
    // checkpoint dir instead of executor block storage. Same fixpoint.
    val dir = java.nio.file.Files.createTempDirectory("graft-cc-ckpt").toString
    val hadCkpt = spark.sparkContext.getCheckpointDir
    spark.sparkContext.setCheckpointDir(dir)
    try {
      val rnd = new scala.util.Random(7)
      val nodes = (1L to 150L).toSeq
      val edges = Seq.fill(90)((rnd.nextInt(150).toLong + 1, rnd.nextInt(150).toLong + 1))
        .filter { case (a, b) => a != b }
      val reliable = ConnectedComponents.labels(
          nodes.toDF("id"), edges.toDF("a", "b"), reliable = true)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(reliable == run(nodes, edges))
      assert(reliable == unionFind(nodes, edges))
      // the reliable path really wrote checkpoint files
      val wrote = new java.io.File(dir).listFiles()
      assert(wrote != null && wrote.nonEmpty, "no checkpoint files written")
    } finally {
      hadCkpt.foreach(spark.sparkContext.setCheckpointDir)
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("cluster labels refine candidate pairs: pair endpoints share a cluster") {
    val labels = TextOps.clusterLabels(spark, sf)
    val pairs = TextOps.minhashPairs(spark, sf)
    val la = labels.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("cluster_id", "ca")
    val lb = labels.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("cluster_id", "cb")
    val broken = pairs.join(la, "doc_a").join(lb, "doc_b")
      .where(col("ca") =!= col("cb"))
    assert(broken.isEmpty, "a candidate pair crossed two clusters")
    // cluster_id is a real member of the cluster and its minimum
    val bad = labels.where(col("cluster_id") > col("doc_id"))
    assert(bad.isEmpty)
  }
}
