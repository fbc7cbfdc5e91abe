package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Similarity, SparkTestSession}

/** [[PqCodesExpr]] must be bit-identical to the composable form it
  * replaced (per-subspace `sqrt(aggregate(zip_with(...)))` distances
  * ranked by `array_sort` on (distance asc, code asc)) — the composable
  * form is also what the DuckDB oracle re-derives, so this parity IS the
  * oracle-compat proof for the native encode. Deterministic pseudo-random
  * vectors/codebooks over many shapes, plus the tie and NaN corners. */
class PqCodesProps extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def prng(seed: Long): Iterator[Double] = {
    var x = seed
    Iterator.continually {
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17
      (x & 0xfffff).toDouble / 0xfffff.toDouble - 0.5
    }
  }

  private def check(m: Int, ks: Int, subDim: Int, nVecs: Int, seed: Long,
      mutate: Array[Double] => Unit = _ => ()): Unit = {
    import spark.implicits._
    val dims = m * subDim
    val r = prng(seed)
    val cb: IndexedSeq[IndexedSeq[Seq[Double]]] = IndexedSeq.tabulate(m)(_ =>
      IndexedSeq.tabulate(ks)(_ => Seq.fill(subDim)(r.next())))
    val vecs = (0 until nVecs).map { i =>
      val a = Array.fill(dims)(r.next()); mutate(a); (i.toLong, a.toSeq)
    }
    val df = vecs.toDF("id", "vec")
    val out = df.select(col("id"),
        VectorExpressions.pqCodesNative(col("vec"), cb, subDim).as("native"),
        array((0 until m).map(s =>
          Similarity.pqCode(col("vec"), s, cb(s), subDim)): _*).as("composable"))
      .collect()
    out.foreach { row =>
      val n = row.getSeq[Int](1); val c = row.getSeq[Int](2)
      assert(n == c, s"id=${row.getLong(0)} native=$n composable=$c " +
        s"(m=$m ks=$ks subDim=$subDim seed=$seed)")
    }
  }

  test("native codes == composable codes across shapes") {
    check(m = 8, ks = 16, subDim = 8, nVecs = 60, seed = 7L)
    check(m = 4, ks = 3, subDim = 5, nVecs = 60, seed = 99L)
    check(m = 1, ks = 16, subDim = 1, nVecs = 60, seed = 1234L)
    check(m = 2, ks = 1, subDim = 4, nVecs = 20, seed = 5L)
  }

  test("exact-tie picks the smallest code on both forms") {
    // all-zero vectors against a codebook whose entries 0 and 2 are equal:
    // several distances tie exactly; both forms must break to smallest j
    import spark.implicits._
    val subDim = 3; val m = 2; val ks = 4
    val entry = Seq(0.25, -0.5, 0.125) // dyadic: distances tie bit-exactly
    val other = Seq(9.0, 9.0, 9.0)
    val cb = IndexedSeq.fill(m)(IndexedSeq(entry, other, entry, entry))
    val df = Seq((0L, Seq.fill(m * subDim)(0.0))).toDF("id", "vec")
    val row = df.select(
        VectorExpressions.pqCodesNative(col("vec"), cb, subDim).as("n"),
        array((0 until m).map(s =>
          Similarity.pqCode(col("vec"), s, cb(s), subDim)): _*).as("c"))
      .head()
    assert(row.getSeq[Int](0) == Seq(0, 0))
    assert(row.getSeq[Int](1) == Seq(0, 0))
  }

  test("NaN vector elements: NaN distances never beat finite ones") {
    check(m = 2, ks = 4, subDim = 4, nVecs = 30, seed = 42L,
      mutate = a => a(1) = Double.NaN) // subspace 0 all-NaN dists, 1 finite
  }

  test("a null vector ELEMENT propagates to a null code array (both paths)") {
    // parity with the composable zip_with/aggregate form (null element ->
    // null distance -> null sort key), NOT a silent encode-as-0.0
    import spark.implicits._
    val subDim = 2; val m = 2; val ks = 2
    val cb = IndexedSeq.fill(m)(IndexedSeq(Seq(0.0, 0.0), Seq(1.0, 1.0)))
    // codegen path: vec depends on a column so ConstantFolding can't
    // pre-evaluate it on the driver
    val df = Seq(0L, 1L).toDF("id").withColumn("vec",
      array(col("id").cast("double"), lit(null).cast("double"),
        lit(0.5), lit(0.25)))
    val rows = df.select(
      VectorExpressions.pqCodesNative(col("vec"), cb, subDim).as("n"))
      .collect()
    assert(rows.forall(_.isNullAt(0)))
    // interpreted path (direct eval, bypassing codegen)
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val child = Literal.create(Seq[java.lang.Double](1.0, null, 0.5, 0.25),
      ArrayType(DoubleType, containsNull = true))
    val flat = Array(0.0, 0.0, 1.0, 1.0, 0.0, 0.0, 1.0, 1.0)
    assert(PqCodesExpr(child, flat, m, ks, subDim).eval(null) == null)
  }
}
