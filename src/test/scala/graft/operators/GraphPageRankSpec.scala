package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Bit-exactness pins for the r14 PageRank restructure (degree + dangling
  * probe fused into one aggregation; deg carried through the rank frame;
  * per-vertex Q30 shares). The catalog oracle already hash-gates the
  * lineitem-derived graphs end-to-end; these pin the operator against a
  * hand-unrolled Q30 reference on graphs small enough to compute in the
  * test itself, so a future regression names the operator, not the query.
  */
class GraphPageRankSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val Q = 1073741824.0 // 2^30
  private val D = 0.85

  test("pageRank matches the unrolled Q30 reference bit-for-bit") {
    import spark.implicits._
    // undirected square + a chord, pre-expanded to directed pairs
    val und = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L))
    val edges = und.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val df = edges.toDF("src", "dst")
    val got = Graph.pageRank(df, iterations = 3).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap

    // reference: same formula, unrolled in Scala
    val out = edges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val deg = out.view.mapValues(_.size.toLong).toMap
    val n = deg.size.toDouble
    val base = (1.0 - D) / n
    var rank = deg.keys.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to 3) {
      val q = rank.map { case (v, r) => v -> math.floor(r / deg(v) * Q).toLong }
      val in = edges.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
      rank = rank.keys.map { v =>
        v -> (base + D * (in(v).map(q).sum.toDouble / Q))
      }.toMap
    }
    assert(got.keySet == rank.keySet)
    rank.foreach { case (v, r) =>
      assert(got(v)._1 == r, s"vertex $v") // exact, no tolerance
      assert(got(v)._2 == deg(v))
    }
  }

  test("pageRankDigraph matches the unrolled reference incl. dangling mass") {
    import spark.implicits._
    // 1 -> 2 -> 3, 1 -> 3: vertex 3 is a sink, vertex 1 a pure source
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L))
    val df = edges.toDF("src", "dst")
    val got = Graph.pageRankDigraph(df, iterations = 3).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap

    val vs = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val deg = vs.map(v => v -> edges.count(_._1 == v).toLong).toMap
    val n = vs.size.toDouble
    val base = (1.0 - D) / n
    var rank = vs.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to 3) {
      val dq = vs.filter(deg(_) == 0L)
        .map(v => math.floor(rank(v) * Q).toLong).sum
      val q = vs.filter(deg(_) > 0L)
        .map(v => v -> math.floor(rank(v) / deg(v) * Q).toLong).toMap
      rank = vs.map { v =>
        val sq = edges.filter(_._2 == v).map(e => q(e._1)).sum
        // IEEE order exactly as the operator writes it:
        // base + d·(sq/Q) + d·(dq/Q)/n
        v -> (base + D * (sq.toDouble / Q) + D * (dq.toDouble / Q) / n)
      }.toMap
    }
    assert(got.keySet == rank.keySet)
    rank.foreach { case (v, r) =>
      assert(got(v)._1 == r, s"vertex $v")
      assert(got(v)._2 == deg(v))
    }
  }

  test("sampled estimation audit (doc prefilter on) equals the census restricted to the sample") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rng = new scala.util.Random(41)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsi", "zeta")
    def doc(): String =
      Seq.fill(18 + rng.nextInt(12))(vocab(rng.nextInt(vocab.size))).mkString(" ")
    val base = Seq.tabulate(60)(i => (i.toLong, doc()))
    val corpus = (base ++ base.take(8).map { case (i, t) => (500L + i, t) })
      .toDF("doc_id", "text")
    def rows(mod: Int) = Dedup.minhashEstimationAudit(
        corpus, "doc_id", "text", samplePairsMod = mod)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    val census = rows(1)  // mod = 1: prefilter structurally off
    val sampled = rows(3) // mod = 3: broadcast semi-join prefilter on
    // the sample predicate over the census must reproduce the sampled run
    val predicate = census.filter { case (a, b, _, _, _) =>
      val h = corpus.sparkSession.range(1).select(
        pmod(graft.functions.hash60(lit(s"estsamp#${a}_$b")), lit(3L)))
        .head().getLong(0)
      h == 0L
    }
    assert(sampled == predicate)
    assert(sampled.nonEmpty && sampled.size < census.size)
  }
}
