package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Whole MinHash signature as ONE linear pass over the (already normalized)
  * text: walk the k-char shingle windows, md5 each shingle ONCE, and fold
  * all `numHashes` affine minima in place.
  *
  * Why an expression and not the relational form: the explode+groupBy
  * signature shuffles every (doc, shingle) row — by far the largest shuffle
  * in the dedup family (~10^3 rows per document) — and the pure-Column
  * array form (`array_min(transform(...))` per hash) recomputes the md5
  * base array once per hash function. This pass is per-row (no shuffle, no
  * state), md5 runs once per shingle, and the output feeds batch and
  * STREAMING paths alike.
  *
  * Bit-parity with the SQL oracle: shingle = substr window of the
  * normalized text (whole string when shorter than k, matching
  * [[CharShinglesExpr]]); base hash = first 15 md5 hex chars as a long
  * (= the digest's first 8 bytes unsigned, >>> 4) mod the Mersenne prime;
  * k-th value = (A_k * h + B_k) mod P — identical to
  * `MIN((A_k * (hash60(shingle) % P) + B_k) % P)` in DuckDB. MIN is
  * duplicate-insensitive, so not deduplicating windows matches the
  * oracle's `list_distinct` semantics.
  */
case class MinhashSigExpr(child: Expression, k: Int, numHashes: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes() =
    if (child.dataType.isInstanceOf[org.apache.spark.sql.types.StringType])
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"requires STRING input, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val md = java.security.MessageDigest.getInstance("MD5")
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val win = if (s.length < k) s.length else k
    val n = if (s.length < k) 1 else s.length - k + 1
    var i = 0
    while (i < n) {
      md.reset()
      val d = md.digest(s.substring(i, i + win)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      var top = 0L
      var b = 0
      while (b < 8) { top = (top << 8) | (d(b) & 0xffL); b += 1 }
      val h = (top >>> 4) % MinhashP
      var j = 0
      while (j < numHashes) {
        val v = (minhashA(j) * h + minhashB(j)) % MinhashP
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins.map(Long.box).toArray[Any])
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** 64-bit SimHash (bits 0..59) as ONE per-row pass: space-split the
  * normalized text, DISTINCT the tokens (hash set — O(tokens), unlike
  * array_distinct's O(n²) string compares), md5 each distinct token once,
  * accumulate per-bit votes, emit the majority mask. Replaces an
  * explode → dropDuplicates → groupBy chain that shuffled every
  * (doc, token) row twice. Bit-parity: token hash = hash60 (first 15 md5
  * hex chars); bit b set iff strictly more than half the distinct tokens
  * have bit b set — identical to the relational
  * `SUM((h >> b) & 1) * 2 > COUNT(*)` vote. */
case class SimhashExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def checkInputDataTypes() =
    if (child.dataType.isInstanceOf[org.apache.spark.sql.types.StringType])
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"requires STRING input, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val md = java.security.MessageDigest.getInstance("MD5")
    val seen = new java.util.HashSet[String]()
    val votes = new Array[Int](60)
    var n = 0
    // split(" ", -1) matches Spark's split(col, " ") incl. the [""] result
    // for empty text
    s.split(" ", -1).foreach { tok =>
      if (seen.add(tok)) {
        n += 1
        md.reset()
        val d = md.digest(tok.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        var top = 0L
        var b = 0
        while (b < 8) { top = (top << 8) | (d(b) & 0xffL); b += 1 }
        val h = top >>> 4
        var i = 0
        while (i < 60) { votes(i) += ((h >>> i) & 1L).toInt; i += 1 }
      }
    }
    var sig = 0L
    var i = 0
    while (i < 60) { if (votes(i) * 2 > n) sig |= (1L << i); i += 1 }
    Long.box(sig)
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Winnowing fingerprints (the MOSS selection rule): hash every k-char
  * gram of the normalized text, slide a window of `w` consecutive gram
  * hashes, and select each window's RIGHTMOST minimum; the deduplicated
  * selections are the document's fingerprints. Guarantees every match of
  * length ≥ w+k-1 between two documents shares a fingerprint, at ~2/(w+1)
  * the density of full shingling.
  *
  * One pass per row via a monotone deque (pop-back on `>=` implements the
  * rightmost tie-break; selections are non-decreasing in position, so
  * consecutive-duplicate suppression yields the distinct set in order).
  * Gram hash = hash60 (first 15 md5 hex chars) — same portable hash as the
  * shingle family, so the SQL oracle reproduces it exactly. Short texts
  * (< k chars: one whole-text gram; < w grams: one window over all grams)
  * degrade like [[CharShinglesExpr]]. Returns ARRAY<STRUCT<pos, fp>> with
  * 1-based gram positions. */
case class WinnowExpr(child: Expression, k: Int, w: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("pos", LongType, nullable = false),
      org.apache.spark.sql.types.StructField("fp", LongType, nullable = false))),
    containsNull = false)
  override def checkInputDataTypes() =
    if (child.dataType.isInstanceOf[org.apache.spark.sql.types.StringType])
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"requires STRING input, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val md = java.security.MessageDigest.getInstance("MD5")
    val win = if (s.length < k) s.length else k
    val g = if (s.length < k) 1 else s.length - k + 1
    val hs = new Array[Long](g)
    var i = 0
    while (i < g) {
      md.reset()
      val d = md.digest(s.substring(i, i + win)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      var top = 0L
      var b = 0
      while (b < 8) { top = (top << 8) | (d(b) & 0xffL); b += 1 }
      hs(i) = top >>> 4
      i += 1
    }
    val ww = if (g < w) g else w
    val dq = new java.util.ArrayDeque[Int]()
    val out = new scala.collection.mutable.ArrayBuffer[Any]()
    var lastSel = -1
    i = 0
    while (i < g) {
      while (!dq.isEmpty && hs(dq.peekLast) >= hs(i)) dq.pollLast()
      dq.addLast(i)
      while (dq.peekFirst < i - ww + 1) dq.pollFirst()
      if (i >= ww - 1) {
        val sel = dq.peekFirst
        if (sel != lastSel) {
          out += org.apache.spark.sql.catalyst.InternalRow((sel + 1).toLong, hs(sel))
          lastSel = sel
        }
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

object MinhashExpressions {
  /** `numHashes` affine-family minima over `c`'s k-shingles, as
    * ARRAY<LONG>. `c` must already be normalized text ([[normText]]). */
  def minhashSigNative(c: Column, k: Int, numHashes: Int): Column =
    column(MinhashSigExpr(expression(c), k, numHashes))

  /** 64-bit SimHash (bits 0..59) of `c`'s distinct space-separated tokens.
    * `c` must already be normalized text ([[normText]]). */
  def simhashNative(c: Column): Column =
    column(SimhashExpr(expression(c)))

  /** Winnowing fingerprints of `c` (normalized text): ARRAY<STRUCT<pos, fp>>
    * of each w-window's rightmost-minimum k-gram hash, deduplicated. */
  def winnowNative(c: Column, k: Int, w: Int): Column =
    column(WinnowExpr(expression(c), k, w))
}
