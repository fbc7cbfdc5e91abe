package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Connected-component labeling: correctness on multi-component graphs, the
  * pointer-jumping round bound — a path graph longer than maxIters converges
  * anyway, which plain neighbor-min propagation (O(diameter) rounds)
  * provably could not do — and local-vs-distributed path parity (the
  * bounded-collect union-find must label identically to the iterative
  * propagation on every graph shape). */
class ClusterCCSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  // maxLocalEdges = 0 forces the ITERATIVE path (the default gate would
  // route these tiny fixtures through the driver union-find)
  private def run(n: Long, edges: Seq[(Long, Long)],
      maxIters: Int = 50, maxLocalEdges: Long = 0L): Map[Long, Long] = {
    import spark.implicits._
    val ids = (0L until n).toDF("id")
    val pairs = edges.toDF("id_a", "id_b")
    Dedup.clusterNearDups(ids, pairs, maxIters, maxLocalEdges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("path graph of 300 nodes converges under the 50-round cap") {
    // diameter 299: neighbor-min alone needs 299 rounds; pointer jumping
    // needs ~log2(299) ≈ 9. Converging at all inside maxIters = 50 is
    // itself the proof the indirection works.
    val labels = run(300, (0L until 299L).map(i => (i, i + 1)))
    assert(labels.values.toSet === Set(0L))
  }

  test("multiple components + isolated nodes get their own minima") {
    // components {0,1,2}, {5,6}, isolated {3,4}
    val labels = run(7, Seq((1L, 2L), (0L, 1L), (5L, 6L)))
    assert(labels === Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 3L,
      4L -> 4L, 5L -> 5L, 6L -> 5L))
  }

  test("edge direction does not matter (undirected expansion)") {
    val a = run(4, Seq((3L, 0L), (2L, 3L)))
    val b = run(4, Seq((0L, 3L), (3L, 2L)))
    assert(a === b)
    assert(a(2) === 0L && a(3) === 0L && a(1) === 1L)
  }

  test("local union-find path labels identically to the iterative path") {
    val shapes = Seq(
      ("path", (0L until 99L).map(i => (i, i + 1))),
      ("two components + isolates", Seq((1L, 2L), (0L, 1L), (5L, 6L))),
      ("star from a high id", (0L until 9L).map(i => (9L, i))),
      ("duplicate + reversed edges",
        Seq((3L, 0L), (0L, 3L), (3L, 0L), (2L, 3L))),
      ("empty edge set", Seq.empty[(Long, Long)]))
    shapes.foreach { case (name, edges) =>
      val n = 100L
      val iter = run(n, edges)                       // forced iterative
      val local = run(n, edges, maxLocalEdges = 1000000L)
      assert(local === iter, s"shape: $name")
    }
  }
}
