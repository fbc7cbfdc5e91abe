package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level building blocks shared by the operators. Everything here is
  * composed from Spark built-ins (codegen-friendly, no UDFs) and is chosen to
  * be bit-reproducible in ANSI SQL / DuckDB so operators stay oracle-checkable.
  */
package object functions {

  /** Portable 60-bit hash: first 15 hex chars of md5, as a non-negative long.
    * Reproducible in DuckDB as
    * `CAST(concat('0x', substr(md5(x), 1, 15)) AS BIGINT)`. */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Seeded variant for minhash families: hash60 of value + '#' + seed. */
  def hash60Seeded(c: Column, seed: Int): Column =
    hash60(concat(c, lit("#" + seed)))

  /** Whitespace-normalized lowercase form used for fingerprinting. */
  def normText(c: Column): Column =
    regexp_replace(lower(trim(c)), "\\s+", " ")

  /** Exact-duplicate document fingerprint (md5 of the normalized text). */
  def docFingerprint(c: Column): Column = md5(normText(c))

  /** Whitespace token count. */
  def tokenCount(c: Column): Column =
    when(length(trim(c)) === 0, lit(0L))
      .otherwise(size(split(trim(c), "\\s+")).cast("long"))

  /** Character k-gram shingles of the normalized text (ARRAY<STRING>).
    * Short texts (< k chars) yield the whole text as a single shingle. */
  def charShingles(c: Column, k: Int): Column =
    TextExpressions.charShinglesNative(normText(c), k)

  /** Dot product of two ARRAY<DOUBLE> columns (sequential left fold — the
    * deterministic order matters for float parity with the oracle). */
  def dotProduct(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  /** L2 norm. */
  def l2Norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x * x), lit(0.0), (acc, v) => acc + v))

  /** Clamp to [-1, 1] with NaN passthrough: float error can push a
    * self-similarity to 1.0000000000000002, but a zero-norm vector's 0/0
    * must STAY NaN — Spark's NaN-is-largest ordering would otherwise resolve
    * least(greatest(NaN, -1), 1) to 1.0, turning a zero embedding into a
    * "perfect match" for everything (DuckDB's list_cosine_similarity yields
    * NaN there). */
  private def clampCosine(raw: Column): Column =
    when(isnan(raw), raw).otherwise(least(greatest(raw, lit(-1.0)), lit(1.0)))

  /** Cosine similarity of two ARRAY<DOUBLE> columns, clamped to [-1, 1]
    * (matches DuckDB's list_cosine_similarity exactly, incl. NaN for
    * zero-norm inputs). */
  def cosineSim(a: Column, b: Column): Column =
    clampCosine(dotProduct(a, b) / (l2Norm(a) * l2Norm(b)))

  /** Count of non-overlapping occurrences of literal `needle` in `c` —
    * `(len(c) - len(replace(c, needle, ''))) / len(needle)`, the same
    * arithmetic DuckDB evaluates, so counts match exactly. Literal
    * `replace`, not a regex — ~5× cheaper per call at scan time. */
  def occurrences(c: Column, needle: String): Column =
    ((length(c) - length(call_function("replace", c, lit(needle), lit("")))) /
      lit(needle.length)).cast("long")

  /** Fast-path cosine via the codegen'd native expressions (identical float
    * fold order to [[cosineSim]] — bit-equal results, ~10× less overhead). */
  def cosineSimNative(a: Column, b: Column): Column =
    clampCosine(
      VectorExpressions.dotNative(a, b) /
        (sqrt(VectorExpressions.sqNormNative(a)) * sqrt(VectorExpressions.sqNormNative(b))))

  /** Cosine from a precomputed dot and per-side norms (for joins where norms
    * are computed once per vector instead of once per pair). */
  def cosineFromNorms(dot: Column, normA: Column, normB: Column): Column =
    clampCosine(dot / (normA * normB))

  // --- portable minhash family -------------------------------------------
  // One md5 per shingle; the k-th hash is an affine transform mod a Mersenne
  // prime. Matches the SQL form ((A_k * (h % P) + B_k) % P) exactly.
  val MinhashP = 2147483647L                    // 2^31 - 1
  def minhashA(k: Int): Long = 1103515245L + 2L * k + 1L
  def minhashB(k: Int): Long = 12345L + 1000003L * k

  def minhashHash(shingle: Column, k: Int): Column =
    (lit(minhashA(k)) * (hash60(shingle) % MinhashP) + lit(minhashB(k))) % MinhashP

  /** Z-order (Morton) interleave of the low 16 bits of two non-negative
    * longs: bit i of `x` lands at output position 2i, bit i of `y` at 2i+1.
    * Inputs are masked to 16 bits (callers must pre-scale coordinates into
    * [0, 65535]); the result fits in 32 bits. Pure shift/and/add — stays in
    * whole-stage codegen, and the identical 32-term sum is expressible in
    * ANSI SQL for the oracle (see RelationalQueries.zorderSql). Used for
    * data-layout clustering: sorting by z-value co-locates rows that are
    * close in BOTH dimensions, which turns per-file min/max statistics into
    * effective two-dimensional data skipping at scan time. */
  def zorder16(x: Column, y: Column): Column = {
    val xm = x.bitwiseAND(lit(65535L))
    val ym = y.bitwiseAND(lit(65535L))
    (0 until 16).flatMap { i =>
      Seq(shiftleft(shiftright(xm, i).bitwiseAND(lit(1L)), 2 * i),
        shiftleft(shiftright(ym, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ + _)
  }
}
