package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Similarity, SparkTestSession}

/** [[NearestCentroidIdExpr]] must agree with the sorted-array form it
  * replaced on the corpus side —
  * `element_at(array_sort(array(struct(-guarded_cos, id)...)), 1).list_id`
  * — which is also what the DuckDB oracles re-derive, so this parity IS
  * the oracle-compat proof for the native assignment. Random vectors and
  * centroid tables (including non-sorted, non-positional ids), plus the
  * duplicate-centroid tie, the zero-norm NaN corner, and a NaN element. */
class NearestCentroidProps extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def prng(seed: Long): Iterator[Double] = {
    var x = seed
    Iterator.continually {
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17
      (x & 0xfffff).toDouble / 0xfffff.toDouble - 0.5
    }
  }

  private def check(dims: Int, nCents: Int, nVecs: Int, seed: Long,
      mutate: Array[Double] => Unit = _ => ()): Unit = {
    import spark.implicits._
    val r = prng(seed)
    // deliberately non-sorted, non-contiguous ids — ties break on VALUE
    val cents: Array[(Long, Array[Double])] = Array.tabulate(nCents)(j =>
      ((j * 37L + 11L) % (nCents * 5L), Array.fill(dims)(r.next())))
    val vecs = (0 until nVecs).map { i =>
      val a = Array.fill(dims)(r.next()); mutate(a); (i.toLong, a.toSeq)
    }
    val df = vecs.toDF("id", "vec")
      .withColumn("nrm", sqrt(VectorExpressions.sqNormNative(col("vec"))))
    val out = df.select(col("id"),
        VectorExpressions.nearestCentroidIdNative(col("vec"), col("nrm"),
          cents).as("native"),
        element_at(Similarity.nearestCentroids(col("vec"), col("nrm"),
          cents), 1).getField("list_id").as("sorted"))
      .collect()
    out.foreach { row =>
      assert(row.getLong(1) == row.getLong(2),
        s"id=${row.getLong(0)} native=${row.getLong(1)} " +
          s"sorted=${row.getLong(2)} (dims=$dims nCents=$nCents seed=$seed)")
    }
  }

  test("native assignment == sorted-array assignment across shapes") {
    check(dims = 64, nCents = 16, nVecs = 80, seed = 7L)
    check(dims = 8, nCents = 3, nVecs = 80, seed = 99L)
    check(dims = 1, nCents = 8, nVecs = 40, seed = 1234L)
  }

  test("duplicate centroids: exact cosine tie breaks to the smaller id") {
    import spark.implicits._
    val v = Array(0.5, -0.25, 0.125)
    // same vector under three ids, listed out of order
    val cents: Array[(Long, Array[Double])] =
      Array((9L, v.clone), (2L, v.clone), (5L, v.clone))
    val df = Seq((0L, v.toSeq)).toDF("id", "vec")
      .withColumn("nrm", sqrt(VectorExpressions.sqNormNative(col("vec"))))
    val row = df.select(
        VectorExpressions.nearestCentroidIdNative(col("vec"), col("nrm"),
          cents).as("native"),
        element_at(Similarity.nearestCentroids(col("vec"), col("nrm"),
          cents), 1).getField("list_id").as("sorted"))
      .head()
    assert(row.getLong(0) == 2L && row.getLong(1) == 2L)
  }

  test("zero-norm vector: native survives where the sorted form raises (ANSI)") {
    // 0/0 under ANSI mode (the Spark 4 default, and this suite's session)
    // makes the composable form's Divide THROW before clampCosine's NaN
    // passthrough can see it — a latent crash on hostile input (an
    // all-zero embedding). The native expression's NaN -> -inf guard is
    // the DuckDB-matching behavior: every cosine ties at -inf and the
    // smallest centroid id wins.
    import spark.implicits._
    val cents: Array[(Long, Array[Double])] =
      Array((9L, Array(1.0, 2.0)), (2L, Array(3.0, -1.0)), (5L, Array(0.5, 0.5)))
    val df = Seq((0L, Seq(0.0, 0.0))).toDF("id", "vec")
      .withColumn("nrm", sqrt(VectorExpressions.sqNormNative(col("vec"))))
    assert(df.select(VectorExpressions.nearestCentroidIdNative(col("vec"),
        col("nrm"), cents)).head().getLong(0) == 2L)
    val e = intercept[Exception] {
      df.select(element_at(Similarity.nearestCentroids(col("vec"), col("nrm"),
        cents), 1).getField("list_id")).head()
    }
    assert(e.getMessage.contains("DIVIDE_BY_ZERO"), e.getMessage.take(120))
  }

  test("NaN element: NaN cosines never beat finite ones") {
    check(dims = 8, nCents = 5, nVecs = 30, seed = 77L,
      mutate = a => a(0) = Double.NaN)
  }

  test("a null vector ELEMENT propagates to a null assignment (both paths)") {
    // parity with the composable cosine (null element -> null dot -> null
    // sort key), NOT a silent treat-as-0.0
    import spark.implicits._
    val cents: Array[(Long, Array[Double])] =
      Array((1L, Array(1.0, 0.0)), (2L, Array(0.0, 1.0)))
    // codegen path: vec depends on a column so ConstantFolding can't
    // pre-evaluate it on the driver
    val df = Seq(0L, 1L).toDF("id").withColumn("vec",
        array(col("id").cast("double"), lit(null).cast("double")))
      .withColumn("nrm", lit(1.0))
    val rows = df.select(VectorExpressions.nearestCentroidIdNative(
      col("vec"), col("nrm"), cents).as("n")).collect()
    assert(rows.forall(_.isNullAt(0)))
    // interpreted path (direct eval, bypassing codegen)
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val vecLit = Literal.create(Seq[java.lang.Double](1.0, null),
      ArrayType(DoubleType, containsNull = true))
    assert(NearestCentroidIdExpr(vecLit, Literal(1.0), Array(1L, 2L),
      Array(1.0, 0.0, 0.0, 1.0), Array(1.0, 1.0), 2).eval(null) == null)
  }
}
