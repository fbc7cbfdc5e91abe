package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expressions for the vector hot path (ANN / near-dup at
  * 100 TB): a tight primitive loop over the array buffers with whole-stage
  * codegen, replacing the interpreted higher-order `aggregate`/`zip_with`
  * lambda chain (~10× less per-row overhead, no per-element boxing).
  *
  * Float semantics are the exact sequential left-fold the SQL oracle
  * (DuckDB list_cosine_similarity / the fold in graft.functions) uses, so
  * results stay bit-identical.
  */
case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes() =
    org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0; var i = 0
    while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double ${ev.value}acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${ev.value}acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = ${ev.value}acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** Sum of squares (squared L2 norm), same fold order as
  * `aggregate(transform(a, x -> x*x), 0.0, +)`. */
case class SqNormExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes() =
    org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var acc = 0.0; var i = 0; val n = x.numElements()
    while (i < n) { val v = x.getDouble(i); acc += v * v; i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val v = ctx.freshName("v")
      s"""
         |int $n = $a.numElements();
         |double ${ev.value}acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $v = $a.getDouble($i);
         |  ${ev.value}acc += $v * $v;
         |}
         |${ev.value} = ${ev.value}acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** All `m` product-quantization sub-codes of a vector in ONE pass: for
  * subspace s, the code is the argmin over the `ks` literal codebook
  * entries of the L2 distance `sqrt(Σ_i (vec[s·subDim+i] − cb[s][j][i])²)`
  * — ties to the smallest j, NaN distances never win. Bit-identical to the
  * composable form it replaces (per-entry `sqrt(aggregate(zip_with(...)))`
  * then `array_sort` by (distance asc, j asc)): the inner accumulation is
  * the same sequential left-fold, and the strict `<` selection reproduces
  * array_sort's NaN-last, earliest-index-tie ranking. The composable form
  * re-entered the expression interpreter m·ks times per row (the
  * higher-order lambdas are CodegenFallback); this is one codegen'd loop.
  * `codebook` is flattened `[s][j][i]` at offset `(s·ks + j)·subDim`.
  * A null ELEMENT anywhere in the read window propagates to a null
  * result — the same semantics as the zip_with/aggregate chain this
  * replaces (null element → null distance → null sort key), instead of
  * silently encoding the element as 0.0. */
case class PqCodesExpr(child: Expression, codebook: Array[Double],
    m: Int, ks: Int, subDim: Int) extends UnaryExpression {
  require(codebook.length == m * ks * subDim,
    s"codebook length ${codebook.length} != m*ks*subDim ${m * ks * subDim}")
  // null-element inputs produce null output even when the child column
  // itself is declared non-nullable
  override def nullable: Boolean = true
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def checkInputDataTypes() =
    org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val scan = math.min(x.numElements(), m * subDim)
    var p = 0
    while (p < scan) { if (x.isNullAt(p)) return null; p += 1 }
    val codes = new Array[Int](m)
    var s = 0
    while (s < m) {
      var bestJ = 0
      var bestD = Double.NaN
      var j = 0
      while (j < ks) {
        var acc = 0.0
        val base = (s * ks + j) * subDim
        var i = 0
        while (i < subDim) {
          val d = x.getDouble(s * subDim + i) - codebook(base + i)
          acc += d * d
          i += 1
        }
        val dist = math.sqrt(acc)
        if (j == 0 || dist < bestD ||
            (java.lang.Double.isNaN(bestD) && !java.lang.Double.isNaN(dist))) {
          bestD = dist; bestJ = j
        }
        j += 1
      }
      codes(s) = bestJ
      s += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cb = ctx.addReferenceObj("pqCodebook", codebook, "double[]")
      val codes = ctx.freshName("codes"); val s = ctx.freshName("s")
      val j = ctx.freshName("j"); val i = ctx.freshName("i")
      val bestJ = ctx.freshName("bestJ"); val bestD = ctx.freshName("bestD")
      val acc = ctx.freshName("acc"); val base = ctx.freshName("base")
      val d = ctx.freshName("d"); val dist = ctx.freshName("dist")
      val p = ctx.freshName("p"); val scan = ctx.freshName("scan")
      s"""
         |int $scan = java.lang.Math.min($a.numElements(), ${m * subDim});
         |for (int $p = 0; $p < $scan; $p++) {
         |  if ($a.isNullAt($p)) { ${ev.isNull} = true; break; }
         |}
         |if (!${ev.isNull}) {
         |int[] $codes = new int[$m];
         |for (int $s = 0; $s < $m; $s++) {
         |  int $bestJ = 0; double $bestD = Double.NaN;
         |  for (int $j = 0; $j < $ks; $j++) {
         |    double $acc = 0.0;
         |    int $base = ($s * $ks + $j) * $subDim;
         |    for (int $i = 0; $i < $subDim; $i++) {
         |      double $d = $a.getDouble($s * $subDim + $i) - $cb[$base + $i];
         |      $acc += $d * $d;
         |    }
         |    double $dist = java.lang.Math.sqrt($acc);
         |    if ($j == 0 || $dist < $bestD ||
         |        (Double.isNaN($bestD) && !Double.isNaN($dist))) {
         |      $bestD = $dist; $bestJ = $j;
         |    }
         |  }
         |  $codes[$s] = $bestJ;
         |}
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** The corpus-side centroid ASSIGNMENT in one codegen'd pass: the list id
  * of the literal centroid with the highest guarded cosine to `vec`
  * (NaN → −∞, clamp to [−1, 1]), ties to the SMALLEST id — bit-identical
  * to `element_at(array_sort(array(struct(-guarded, id)...)), 1).list_id`,
  * which it replaces on the corpus side (that form builds nLists structs
  * per row and sorts them through an interpreted comparator, because
  * `array_sort` is a higher-order function and CodegenFallback). The
  * cosine arithmetic is the same sequential fold as [[DotProductExpr]]
  * over the same driver-precomputed centroid norms; the selection compares
  * with `Double.compare` (−0.0 < 0.0, matching the struct ordering).
  * Query-side probing keeps the sorted-array form (it needs the top
  * nProbe, and the query side is a handful of rows).
  * A null ELEMENT in the read window propagates to a null assignment —
  * the same semantics as the zip_with/aggregate cosine it replaces,
  * instead of silently treating the element as 0.0. */
case class NearestCentroidIdExpr(left: Expression, right: Expression,
    centIds: Array[Long], centVecs: Array[Double], centNorms: Array[Double],
    dims: Int) extends BinaryExpression {
  require(centIds.length == centNorms.length &&
    centVecs.length == centIds.length * dims, "centroid table shape mismatch")
  // null-element vectors produce a null assignment even when both child
  // columns are declared non-nullable
  override def nullable: Boolean = true
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def checkInputDataTypes() =
    org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val scan = math.min(x.numElements(), dims)
    var p = 0
    while (p < scan) { if (x.isNullAt(p)) return null; p += 1 }
    val vn = b.asInstanceOf[Double]
    var bestNc = Double.NaN; var bestId = 0L; var j = 0
    while (j < centIds.length) {
      val n = math.min(x.numElements(), dims)
      var dot = 0.0; var i = 0; val base = j * dims
      while (i < n) { dot += x.getDouble(i) * centVecs(base + i); i += 1 }
      val raw = dot / (vn * centNorms(j))
      val guarded =
        if (java.lang.Double.isNaN(raw)) Double.NegativeInfinity
        else math.min(math.max(raw, -1.0), 1.0)
      val nc = -guarded
      val c = java.lang.Double.compare(nc, bestNc)
      if (j == 0 || c < 0 || (c == 0 && centIds(j) < bestId)) {
        bestNc = nc; bestId = centIds(j)
      }
      j += 1
    }
    bestId
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val ids = ctx.addReferenceObj("centIds", centIds, "long[]")
      val vecs = ctx.addReferenceObj("centVecs", centVecs, "double[]")
      val norms = ctx.addReferenceObj("centNorms", centNorms, "double[]")
      val j = ctx.freshName("j"); val i = ctx.freshName("i")
      val n = ctx.freshName("n"); val dot = ctx.freshName("dot")
      val base = ctx.freshName("base"); val raw = ctx.freshName("raw")
      val g = ctx.freshName("g"); val nc = ctx.freshName("nc")
      val c = ctx.freshName("c")
      val bestNc = ctx.freshName("bestNc"); val bestId = ctx.freshName("bestId")
      val p = ctx.freshName("p"); val scan = ctx.freshName("scan")
      s"""
         |int $scan = java.lang.Math.min($a.numElements(), $dims);
         |for (int $p = 0; $p < $scan; $p++) {
         |  if ($a.isNullAt($p)) { ${ev.isNull} = true; break; }
         |}
         |if (!${ev.isNull}) {
         |double $bestNc = Double.NaN; long $bestId = 0L;
         |for (int $j = 0; $j < $ids.length; $j++) {
         |  int $n = java.lang.Math.min($a.numElements(), $dims);
         |  double $dot = 0.0; int $base = $j * $dims;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $dot += $a.getDouble($i) * $vecs[$base + $i];
         |  }
         |  double $raw = $dot / ($b * $norms[$j]);
         |  double $g = Double.isNaN($raw) ? Double.NEGATIVE_INFINITY
         |    : java.lang.Math.min(java.lang.Math.max($raw, -1.0), 1.0);
         |  double $nc = -$g;
         |  int $c = Double.compare($nc, $bestNc);
         |  if ($j == 0 || $c < 0 || ($c == 0 && $ids[$j] < $bestId)) {
         |    $bestNc = $nc; $bestId = $ids[$j];
         |  }
         |}
         |${ev.value} = $bestId;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

object VectorExpressions {
  def dotNative(a: Column, b: Column): Column =
    column(DotProductExpr(expression(a), expression(b)))
  def sqNormNative(a: Column): Column = column(SqNormExpr(expression(a)))

  /** [[NearestCentroidIdExpr]] over the `(id, vector)` centroid table. */
  def nearestCentroidIdNative(vec: Column, vecNorm: Column,
      cents: Array[(Long, Array[Double])]): Column = {
    val dims = cents.head._2.length
    val flat = new Array[Double](cents.length * dims)
    cents.zipWithIndex.foreach { case ((_, arr), j) =>
      System.arraycopy(arr, 0, flat, j * dims, dims) }
    column(NearestCentroidIdExpr(expression(vec), expression(vecNorm),
      cents.map(_._1), flat,
      cents.map { case (_, arr) => math.sqrt(arr.map(x => x * x).sum) },
      dims))
  }

  /** [[PqCodesExpr]] over a nested codebook `cb(s)(j)` of subvectors. */
  def pqCodesNative(vec: Column, cb: IndexedSeq[IndexedSeq[Seq[Double]]],
      subDim: Int): Column = {
    val m = cb.length; val ks = cb.head.length
    val flat = new Array[Double](m * ks * subDim)
    for (s <- 0 until m; j <- 0 until ks; i <- 0 until subDim)
      flat((s * ks + j) * subDim + i) = cb(s)(j)(i)
    column(PqCodesExpr(expression(vec), flat, m, ks, subDim))
  }
}
