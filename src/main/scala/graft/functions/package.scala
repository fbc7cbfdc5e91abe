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
  def charShingles(c: Column, k: Int): Column = {
    val n = normText(c)
    when(length(n) < k, array(n)).otherwise(
      transform(sequence(lit(1), length(n) - (k - 1)), i => n.substr(i, lit(k))))
  }

  /** Dot product of two ARRAY<DOUBLE> columns (sequential left fold — the
    * deterministic order matters for float parity with the oracle). */
  def dotProduct(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  /** L2 norm. */
  def l2Norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x * x), lit(0.0), (acc, v) => acc + v))

  /** Cosine similarity of two ARRAY<DOUBLE> columns, clamped to [-1, 1]
    * (float error can push a self-similarity to 1.0000000000000002; the clamp
    * also matches DuckDB's list_cosine_similarity exactly). */
  def cosineSim(a: Column, b: Column): Column =
    least(greatest(dotProduct(a, b) / (l2Norm(a) * l2Norm(b)), lit(-1.0)), lit(1.0))

  /** Count of non-overlapping occurrences of literal `needle` in `c` —
    * `(len(c) - len(replace(c, needle, ''))) / len(needle)`, the same
    * arithmetic DuckDB evaluates, so counts match exactly. */
  def occurrences(c: Column, needle: String): Column =
    ((length(c) - length(regexp_replace(c, java.util.regex.Pattern.quote(needle), ""))) /
      lit(needle.length)).cast("long")
}
