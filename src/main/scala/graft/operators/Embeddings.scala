package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Single-pass Gram-matrix aggregation over quantized embedding vectors —
  * the distributed half of PCA / whitening.
  *
  * Input rows are the Q20 fixed-point form of a d-vector
  * (`floor(x · 2²⁰)` — exact in IEEE double, power-of-two multiply); the
  * buffer accumulates the upper-triangle outer-product sums
  * `G[i][j] = Σ_n q_n[i] · q_n[j]` as exact integers. Integer addition is
  * associative and commutative, so the result is independent of partition
  * count and merge order — the property that makes the operator
  * exact-hash oracle-checkable.
  *
  * Scale rationale: the obvious relational formulation (posexplode twice,
  * groupBy (i, j)) materializes n·d² rows — at 100 TB of 1k-dim vectors
  * that is 10⁶× the input. This aggregate keeps the d·(d+1)/2-long buffer
  * (d=64 → 2080 longs = 16 KB) per map task and reduces partials pairwise:
  * one scan, zero explode, and a final reduction whose volume is
  * `partitions · 16 KB` regardless of row count. The d² driver-side
  * eigensolve on the result is legitimately driver work (64×64).
  *
  * Overflow bound: |q| ≤ |x|·2²⁰, so with |x| ≤ 8 each product is
  * ≤ 2⁴⁶ and the Long sum holds > 2¹⁷ ≈ 130k billion-row shards of
  * headroom (n · 2⁴⁶ < 2⁶³ ⇒ n < 1.3·10⁵ · 10⁹). Inputs outside [-8, 8]
  * should be scaled first; embeddings are unit-norm-ish in practice.
  */
case class QVec(q: Seq[Long])

class GramAgg(d: Int) extends Aggregator[QVec, Array[Long], Seq[Long]] {
  private val len = d * (d + 1) / 2

  override def zero: Array[Long] = new Array[Long](len)

  override def reduce(buf: Array[Long], in: QVec): Array[Long] = {
    val v = in.q.toArray
    require(v.length == d, s"expected $d components, got ${v.length}")
    var idx = 0
    var i = 0
    while (i < d) {
      val qi = v(i)
      var j = i
      while (j < d) {
        buf(idx) += qi * v(j)
        idx += 1
        j += 1
      }
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < len) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq
  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()
}

object Embeddings {

  /** Q20 quantization scale (2²⁰). */
  val QScale = 1048576.0

  /** Quantize an ARRAY column of floats/doubles to Q20 longs. */
  def quantizeQ20(vec: Column): Column =
    transform(vec, x => floor(x.cast("double") * lit(QScale)).cast("long"))

  /** Upper-triangle Gram matrix of the `vecCol` embedding column as
    * (i, j, g) rows, i ≤ j, g the exact integer sum of Q20 products.
    * One aggregation — no explode, no shuffle of vector data (partials
    * merge pairwise). */
  def gramMatrix(df: DataFrame, vecCol: String, d: Int): DataFrame = {
    // one-field product input: the single call-site column maps to QVec.q
    // (same udaf application pattern as TopKAgg's two-column site)
    val gram = udaf(new GramAgg(d), Encoders.product[QVec])
    val agg = df
      .select(quantizeQ20(col(vecCol)).as("q"))
      .agg(gram(col("q")).as("g"))
    expandTriangle(agg, "g", d)
  }

  /** Expand a one-row frame holding a packed upper-triangle array column
    * into (i, j, g) rows. Linear index k of the (i, j) walk (i-major, j
    * from i to d-1; row i starts at offset(i) = i·d − i·(i−1)/2).
    * Inverting: i = ⌊d + ½ − √((d+½)² − 2k)⌋, and at the exact row
    * boundaries the radicand is the perfect square (d−i+½)², so the floor
    * is exact in IEEE double — no off-by-one at any k. */
  def expandTriangle(packed: DataFrame, arrCol: String, d: Int): DataFrame = {
    val dHalf = d.toDouble + 0.5
    packed.select(posexplode(col(arrCol)).as(Seq("k", "g")))
      .select(col("k").cast("long").as("k"), col("g"))
      .withColumn("i", expr(
        s"CAST($dHalf - sqrt($dHalf * $dHalf - 2.0D * k) AS BIGINT)"))
      .withColumn("j", (col("k") - col("i") * lit(d.toLong)
        + col("i") * (col("i") - 1) / 2 + col("i")).cast("long"))
      .select(col("i"), col("j"), col("g"))
  }

  /** Dominant eigenpair of a symmetric d×d matrix by power iteration —
    * the driver-side half of PCA (d×d is bounded, never data-sized).
    * Deterministic: fixed all-ones start, fixed iteration count, sign
    * convention = largest-|component| entry positive (first on ties). */
  def topEigen(g: Array[Array[Double]], iters: Int = 200): (Double, Array[Double]) = {
    val d = g.length
    var v = Array.fill(d)(1.0 / math.sqrt(d.toDouble))
    var lambda = 0.0
    var it = 0
    while (it < iters) {
      val w = new Array[Double](d)
      var i = 0
      while (i < d) {
        var s = 0.0
        var j = 0
        while (j < d) { s += g(i)(j) * v(j); j += 1 }
        w(i) = s
        i += 1
      }
      var n2 = 0.0
      var k = 0
      while (k < d) { n2 += w(k) * w(k); k += 1 }
      val n = math.sqrt(n2)
      require(n > 0.0, "power iteration hit the zero vector (rank-0 input?)")
      lambda = n
      var m = 0
      while (m < d) { w(m) /= n; m += 1 }
      v = w
      it += 1
    }
    // sign convention: the largest-|x| component (earliest on ties) positive
    var best = 0
    var i = 1
    while (i < d) { if (math.abs(v(i)) > math.abs(v(best))) best = i; i += 1 }
    if (v(best) < 0.0) { var m = 0; while (m < d) { v(m) = -v(m); m += 1 } }
    (lambda, v)
  }

  /** Seeded k-means with `iters` EXACT Lloyd iterations: seeds are the
    * deterministic hash sample ([[Similarity.deterministicCentroids]] —
    * no RNG), each iteration assigns every vector to its nearest centroid
    * by clamped cosine (literal argmax — a per-row expression, no join,
    * no shuffle of vector data) and recomputes centroids as fixed-point
    * means (floor(x·2³⁰) integer sums — partition-order independent, so
    * the result is exact-hash reproducible on any engine; a float AVG
    * would not be). A list that loses every member keeps its previous
    * centroid (iteration 1 cannot: every seed self-assigns).
    *
    * Scale shape per iteration: one corpus scan + one partial-aggregating
    * shuffle on (k·dims) keys; centroids live as plan literals and the
    * driver holds only k·dims doubles. Returns (p, pos, centroid) rows.
    */
  def kmeansCentroids(df: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int): DataFrame = {
    val spark = df.sparkSession
    val c = df.select(col(idCol).as("kid"),
      col(vecCol).cast("array<double>").as("cvec"))
    val seeds = Similarity.deterministicCentroids(c, "kid", "cvec", k, "km")
      .zipWithIndex.map { case ((_, v), p) => (p.toLong, v) }
    require(seeds.nonEmpty, "k-means needs a non-empty corpus")
    var cents = seeds
    var it = 0
    while (it < iters) {
      val asg = c
        .withColumn("cnrm",
          sqrt(graft.functions.VectorExpressions.sqNormNative(col("cvec"))))
        .withColumn("p", graft.functions.VectorExpressions
          .nearestCentroidIdNative(col("cvec"), col("cnrm"), cents))
      val meanRows = asg
        .select(col("p"), posexplode(col("cvec")))
        .groupBy("p", "pos")
        .agg(sum(floor(col("col") * lit(1073741824.0)).cast("decimal(28,0)"))
            .as("sq"),
          count(lit(1)).as("n"))
        .select(col("p"), col("pos"),
          (col("sq").cast("double") / lit(1073741824.0) /
            col("n").cast("double")).as("mv"))
        .collect()
      val d = seeds.head._2.length
      val meanByP = meanRows.groupBy(_.getLong(0)).map { case (p, rows) =>
        val arr = new Array[Double](d)
        rows.foreach(r => arr(r.getInt(1)) = r.getDouble(2))
        p -> arr
      }
      cents = cents.map { case (p, prev) => (p, meanByP.getOrElse(p, prev)) }
      it += 1
    }
    import spark.implicits._
    cents.toSeq.flatMap { case (p, v) =>
      v.zipWithIndex.map { case (x, i) => (p, i.toLong, x) }
    }.toDF("p", "pos", "centroid")
  }

  /** Top-m eigenpairs of a symmetric PSD d×d matrix (e.g. a Gram matrix
    * from [[gramMatrix]]) by power iteration with deflation — the full
    * driver-side PCA readout. After each component the matrix is deflated
    * by λ·v·vᵀ, so successive iterations converge to the next-largest
    * eigenpair; for whitening, scale each projection by 1/√λ. Still d×d
    * driver work — bounded by the embedding dimension, never the corpus. */
  def topEigens(g: Array[Array[Double]], m: Int,
      iters: Int = 200): Seq[(Double, Array[Double])] = {
    val d = g.length
    val work = Array.tabulate(d, d)((i, j) => g(i)(j))
    (0 until math.min(m, d)).map { _ =>
      val (lam, v) = topEigen(work, iters)
      var i = 0
      while (i < d) {
        var j = 0
        while (j < d) { work(i)(j) -= lam * v(i) * v(j); j += 1 }
        i += 1
      }
      (lam, v)
    }
  }

  /** Expand (i, j, g) upper-triangle rows (as collected from
    * [[gramMatrix]]) into the full symmetric matrix, rescaled from Q20²
    * back to input units. The collect is d·(d+1)/2 rows — bounded by the
    * embedding dimension, never by the corpus. */
  def toDense(rows: Seq[(Int, Int, Long)], d: Int): Array[Array[Double]] = {
    val m = Array.ofDim[Double](d, d)
    rows.foreach { case (i, j, g) =>
      val x = g.toDouble / (QScale * QScale)
      m(i)(j) = x
      m(j)(i) = x
    }
    m
  }

  /** Project each row's embedding onto a fixed loading vector (the PCA
    * readout): dot product against the literal loadings — broadcast-free,
    * codegen'd, one scan. */
  def project(df: DataFrame, vecCol: String, loadings: Array[Double]): Column = {
    val lit64 = array(loadings.toIndexedSeq.map(lit(_)): _*)
    graft.functions.dotProduct(
      col(vecCol).cast("array<double>"), lit64)
  }
}
