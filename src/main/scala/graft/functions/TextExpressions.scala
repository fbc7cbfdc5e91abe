package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Character k-gram shingles as a single linear pass.
  *
  * The composable form `transform(sequence(...), i -> substr(s, i, k))` is
  * O(len²) per row: SQL substr counts codepoints, so every window re-scans the
  * string from the start. This expression walks the string once (O(len·k)),
  * which is what makes shingle-based dedup viable on long documents at scale.
  *
  * Semantics match `substr(s, i, k)` for BMP text (the SQL oracle counts
  * codepoints; both agree outside supplementary planes). Short inputs
  * (< k chars) yield the whole string as the single shingle.
  */
case class CharShinglesExpr(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes() =
    if (child.dataType.isInstanceOf[org.apache.spark.sql.types.StringType])
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"requires STRING input, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    if (s.length < k) {
      new GenericArrayData(Array[Any](UTF8String.fromString(s)))
    } else {
      val n = s.length - k + 1
      val out = new Array[Any](n)
      var i = 0
      while (i < n) {
        out(i) = UTF8String.fromString(s.substring(i, i + k))
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Hashing-trick classifier dot product as ONE per-row pass over a token
  * array: md5 each token once ("clf#" + token, the hash60 family), bucket
  * = hash mod weights.length, fold the bucket weights into a single long.
  *
  * Replaces the `aggregate(transform(tokens, ...))` lambda pair, whose
  * interpreted eval allocated two closures per token and re-entered the
  * expression interpreter per element — the documented HOF tradeoff this
  * expression removes from the classifier's scan-time hot path. Bit-parity
  * with the SQL oracle: hash = first 60 bits of md5 (top 8 bytes >>> 4),
  * nonnegative, so `% dim` equals pmod; weights are the same literal table
  * on both engines. */
case class ClassifierSumExpr(child: Expression, weightsU6: Seq[Long])
    extends UnaryExpression with CodegenFallback {
  private val weights = weightsU6.toArray
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def checkInputDataTypes() = child.dataType match {
    case ArrayType(StringType, _) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"requires ARRAY<STRING> input, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val md = java.security.MessageDigest.getInstance("MD5")
    val dim = weights.length
    var sum = 0L
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      // SQL callers of graft_classifier_sum can pass ARRAY<STRING> with null
      // elements; a null token contributes nothing rather than NPE-ing.
      if (!arr.isNullAt(i)) {
        val tok = arr.getUTF8String(i).toString
        md.reset()
        val d = md.digest(("clf#" + tok)
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        var top = 0L
        var b = 0
        while (b < 8) { top = (top << 8) | (d(b) & 0xffL); b += 1 }
        sum += weights(((top >>> 4) % dim).toInt)
      }
      i += 1
    }
    Long.box(sum)
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** SORTED DISTINCT xxhash64 of every k-char shingle, one pass per document:
  * the per-doc "shingle set" representation the exact-verification joins of
  * [[graft.operators.Dedup.minhashEstimationAudit]] ship per candidate
  * pair. Equivalent to
  * `sort_array(array_distinct(transform(charShingles(s,k), xxhash64)))`
  * but with none of that chain's costs: no ARRAY<STRING> materialization
  * (each window is hashed and dropped), no higher-order-function
  * interpreter re-entry, and the per-pair intersection downstream becomes
  * a primitive merge over two sorted long arrays
  * ([[SortedLongIntersectCountExpr]]) instead of `array_intersect`'s
  * per-row hash set over strings. Distinct hashes == distinct shingles up
  * to a 2⁻⁶⁴-per-within-doc-pair xxhash64 collision — the same accepted
  * trade as [[WordSpanHashesExpr]] (README gate-face note); the string
  * window semantics mirror [[CharShinglesExpr]] exactly (UTF-16 windows,
  * whole string when shorter than k). Hash = Spark's `xxhash64` (seed 42)
  * of the shingle string, bit-identical to `xxhash64(charShingles(...))`. */
case class CharShingleHashesSortedExpr(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {
  require(k >= 1, s"k must be >= 1, got $k")
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def checkInputDataTypes() =
    if (child.dataType.isInstanceOf[StringType])
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"requires STRING input, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val raw =
      if (s.length < k)
        Array(org.apache.spark.sql.catalyst.expressions.XXH64
          .hashUTF8String(UTF8String.fromString(s), 42L))
      else {
        val n = s.length - k + 1
        val out = new Array[Long](n)
        var i = 0
        while (i < n) {
          out(i) = org.apache.spark.sql.catalyst.expressions.XXH64
            .hashUTF8String(UTF8String.fromString(s.substring(i, i + k)), 42L)
          i += 1
        }
        out
      }
    java.util.Arrays.sort(raw)
    // in-place dedupe of the sorted run
    var w = 0
    var r = 0
    while (r < raw.length) {
      if (w == 0 || raw(r) != raw(w - 1)) { raw(w) = raw(r); w += 1 }
      r += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(raw, w))
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** |A ∩ B| of two SORTED distinct long arrays as one linear merge — the
  * per-pair evaluator of the estimation audit's exact verification. Zero
  * allocation and zero hashing per pair (vs `array_intersect`, which
  * builds a hash set and an output array per row); with ~10³-element doc
  * shingle sets and ~10⁵ audited pairs the merge is the difference
  * between the verification being join-copy-bound and compute-bound.
  * Inputs MUST be sorted ascending and duplicate-free
  * ([[CharShingleHashesSortedExpr]] guarantees both); null if either
  * side is null. */
case class SortedLongIntersectCountExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with CodegenFallback {
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def checkInputDataTypes() = (left.dataType, right.dataType) match {
    case (ArrayType(org.apache.spark.sql.types.LongType, _),
          ArrayType(org.apache.spark.sql.types.LongType, _)) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"requires two ARRAY<BIGINT> inputs, got $other")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val b = r.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var c = 0L
    while (i < na && j < nb) {
      val va = a.getLong(i); val vb = b.getLong(j)
      if (va < vb) i += 1
      else if (va > vb) j += 1
      else { c += 1; i += 1; j += 1 }
    }
    c
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** Sliding-window span hashes over a word array in one codegen'd pass:
  * element p is `xxhash64(words[p], ..., words[p+k-1])` — bit-identical to
  * Spark's variadic xxhash64 (seed 42, each word's hash chained as the
  * next seed via the same `XXH64.hashUTF8String` primitive, null elements
  * leaving the seed untouched). Replaces the composable
  * `transform(sequence(0, n-k), p -> xxhash64(element_at...))`, whose
  * higher-order lambda is CodegenFallback and re-enters the expression
  * interpreter once per span with k `element_at` calls inside — the
  * documented dominant cost of the exact-substring pass. Fewer than k
  * words yield an empty array (the composable form's size guard, folded
  * in). */
case class WordSpanHashesExpr(child: Expression, k: Int)
    extends UnaryExpression {
  require(k >= 1, s"k must be >= 1, got $k")
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def checkInputDataTypes() =
    org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess

  override def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = x.numElements()
    if (n < k) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](n - k + 1)
    var p = 0
    while (p < out.length) {
      var h = 42L
      var i = 0
      while (i < k) {
        val w = x.getUTF8String(p + i)
        if (w != null)
          h = org.apache.spark.sql.catalyst.expressions.XXH64
            .hashUTF8String(w, h)
        i += 1
      }
      out(p) = h
      p += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val out = ctx.freshName("out")
      val p = ctx.freshName("p"); val i = ctx.freshName("i")
      val h = ctx.freshName("h"); val w = ctx.freshName("w")
      s"""
         |int $n = $a.numElements();
         |long[] $out = ($n < $k) ? new long[0] : new long[$n - $k + 1];
         |for (int $p = 0; $p < $out.length; $p++) {
         |  long $h = 42L;
         |  for (int $i = 0; $i < $k; $i++) {
         |    org.apache.spark.unsafe.types.UTF8String $w =
         |      $a.getUTF8String($p + $i);
         |    if ($w != null) {
         |      $h = org.apache.spark.sql.catalyst.expressions.XXH64
         |        .hashUTF8String($w, $h);
         |    }
         |  }
         |  $out[$p] = $h;
         |}
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

object TextExpressions {
  def charShinglesNative(c: Column, k: Int): Column =
    column(CharShinglesExpr(expression(c), k))

  /** [[CharShingleHashesSortedExpr]]: the doc's sorted distinct shingle
    * hashes. */
  def sortedShingleHashes(c: Column, k: Int): Column =
    column(CharShingleHashesSortedExpr(expression(c), k))

  /** [[SortedLongIntersectCountExpr]]: |A ∩ B| of two sorted long arrays. */
  def sortedIntersectCount(a: Column, b: Column): Column =
    column(SortedLongIntersectCountExpr(expression(a), expression(b)))

  /** [[WordSpanHashesExpr]]: xxhash64 of every k-word sliding window. */
  def wordSpanHashesNative(words: Column, k: Int): Column =
    column(WordSpanHashesExpr(expression(words), k))

  /** Exact-integer classifier weight sum of `tokens` (ARRAY<STRING>)
    * against the literal micro-unit weight table. */
  def classifierSumNative(tokens: Column, weightsU6: Seq[Long]): Column =
    column(ClassifierSumExpr(expression(tokens), weightsU6))
}
