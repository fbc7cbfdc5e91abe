package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Gram aggregation + driver-side PCA eigensolve: the aggregate matches a
  * brute-force quantized outer-product sum, is partitioning-invariant, and
  * the power iteration recovers the dominant eigenpair of the result. */
class EmbeddingsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val d = 4
  // deterministic small corpus with strong correlation along (1,1,0,0)
  private val vecs: Seq[Array[Double]] = (0 until 40).map { i =>
    val t = (i % 7).toDouble - 3.0
    Array(t * 0.5 + 0.01 * (i % 3), t * 0.5, 0.05 * ((i % 5) - 2), 0.02)
  }

  private def df = {
    import spark.implicits._
    vecs.map(v => Tuple1(v.toSeq)).toDF("embedding")
  }

  private def bruteGram: Map[(Long, Long), Long] = {
    val q = vecs.map(_.map(x => math.floor(x * Embeddings.QScale).toLong))
    (for { i <- 0 until d; j <- i until d } yield
      (i.toLong, j.toLong) ->
        q.map(v => v(i) * v(j)).sum).toMap
  }

  test("gramMatrix equals brute-force quantized sums, any partitioning") {
    for (parts <- Seq(1, 3, 7)) {
      val got = Embeddings.gramMatrix(df.repartition(parts), "embedding", d)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(got === bruteGram, s"parts=$parts")
    }
  }

  test("gramMatrix emits each upper-triangle cell exactly once, in order") {
    val cells = Embeddings.gramMatrix(df, "embedding", d)
      .orderBy("i", "j").collect().map(r => (r.getLong(0), r.getLong(1)))
    val expected = for { i <- 0 until d; j <- i until d }
      yield (i.toLong, j.toLong)
    assert(cells.toSeq === expected)
  }

  test("topEigen recovers a known dominant eigenpair") {
    // [[4,1],[1,3]]: eigenvalues (7±√5)/2, dominant ≈ 4.618
    val g = Array(Array(4.0, 1.0), Array(1.0, 3.0))
    val (lambda, v) = Embeddings.topEigen(g)
    assert(math.abs(lambda - (7.0 + math.sqrt(5.0)) / 2.0) < 1e-9)
    // residual ||Gv − λv|| ≈ 0 and the sign convention holds
    val r0 = g(0)(0) * v(0) + g(0)(1) * v(1) - lambda * v(0)
    val r1 = g(1)(0) * v(0) + g(1)(1) * v(1) - lambda * v(1)
    assert(math.abs(r0) < 1e-9 && math.abs(r1) < 1e-9)
    assert(v(if (math.abs(v(0)) >= math.abs(v(1))) 0 else 1) > 0.0)
  }

  test("end-to-end PCA: top component captures the planted correlation") {
    val rows = Embeddings.gramMatrix(df, "embedding", d).collect()
      .map(r => (r.getLong(0).toInt, r.getLong(1).toInt, r.getLong(2)))
    val dense = Embeddings.toDense(rows.toSeq, d)
    val (lambda, v) = Embeddings.topEigen(dense)
    assert(lambda > 0.0)
    // the dominant direction of this corpus is ±(1,1,0,0)/√2
    assert(math.abs(math.abs(v(0)) - math.abs(v(1))) < 0.1)
    assert(math.abs(v(0)) > 0.6 && math.abs(v(2)) < 0.2 && math.abs(v(3)) < 0.2)
    // projection variance along v >= variance along every coordinate axis
    // (v is the top principal axis of the second-moment matrix)
    val proj = df.select(Embeddings.project(df.toDF(), "embedding", v).as("p"))
      .agg(sum(col("p") * col("p")).as("ss")).head().getDouble(0)
    val axisSS = (0 until d).map { i =>
      df.select(col("embedding")(i).as("x"))
        .agg(sum(col("x") * col("x"))).head().getDouble(0)
    }
    axisSS.foreach(a => assert(proj >= a - 1e-6))
  }

  test("topEigens: deflation recovers an ordered orthogonal eigenbasis") {
    // diag(5, 3, 1) rotated is overkill — diagonal already exercises the
    // ordering, deflation, and orthogonality contracts
    val g = Array(
      Array(5.0, 0.0, 0.0),
      Array(0.0, 3.0, 0.0),
      Array(0.0, 0.0, 1.0))
    val eigs = Embeddings.topEigens(g, 3)
    assert(eigs.map(_._1).zip(Seq(5.0, 3.0, 1.0))
      .forall { case (a, b) => math.abs(a - b) < 1e-9 })
    // each eigenvector is an axis (up to the sign convention), and the
    // basis is orthonormal
    for (Seq((_, u), (_, v)) <- eigs.combinations(2)) {
      val dot = u.zip(v).map { case (a, b) => a * b }.sum
      assert(math.abs(dot) < 1e-9)
    }
    eigs.foreach { case (_, v) =>
      assert(math.abs(v.map(x => x * x).sum - 1.0) < 1e-9)
    }
  }

  test("kmeansCentroids: full shape, partitioning-invariant, objective improves") {
    import spark.implicits._
    val rng = new scala.util.Random(41)
    val centers = Seq.tabulate(4)(_ => Array.fill(8)(rng.nextGaussian() * 4))
    val data = Seq.tabulate(120) { i =>
      (i.toLong, centers(i % 4).map(x => x + 0.25 * rng.nextGaussian()).toSeq)
    }
    val df = data.toDF("vec_id", "embedding")
    val out = Embeddings.kmeansCentroids(df, "vec_id", "embedding",
      k = 4, iters = 2).collect()
    assert(out.length == 4 * 8)
    assert(out.map(_.getLong(0)).toSet === Set(0L, 1L, 2L, 3L))
    // same result from any input partitioning (fixed-point means)
    val out2 = Embeddings.kmeansCentroids(df.repartition(7), "vec_id",
      "embedding", k = 4, iters = 2).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet ===
      out2.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet)
    // Lloyd refinement helps: mean best-cosine of the corpus against the
    // 2-iteration centroids beats the raw hash seeds
    def cents(rows: Array[org.apache.spark.sql.Row]): Seq[Array[Double]] =
      rows.groupBy(_.getLong(0)).toSeq.map { case (_, rs) =>
        val a = new Array[Double](8)
        rs.foreach(r => a(r.getLong(1).toInt) = r.getDouble(2))
        a
      }
    def cos(a: Seq[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val seeds = Similarity.deterministicCentroids(
      df.select(col("vec_id").as("kid"),
        transform(col("embedding"), x => x.cast("double")).as("cvec")),
      "kid", "cvec", 4, "km").map(_._2)
    val refined = cents(out)
    def objective(cs: Seq[Array[Double]]): Double =
      data.map { case (_, v) => cs.map(c => cos(v, c)).max }.sum / data.size
    assert(objective(refined) > objective(seeds.toSeq),
      f"refined=${objective(refined)}%.4f seeds=${objective(seeds.toSeq)}%.4f")
  }

  test("gram aggregation rejects a wrong-width vector loudly") {
    import spark.implicits._
    val bad = Seq(Tuple1(Seq(1.0, 2.0))).toDF("embedding")
    val ex = intercept[Exception] {
      Embeddings.gramMatrix(bad, "embedding", d).collect()
    }
    assert(ex.getMessage != null)
  }
}
