package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (range) join: all pairs of left/right rows sharing the equi-keys
  * whose times lie within `delta` of each other — the Flink-style interval
  * join, the symmetric sibling of [[AsOfJoin]].
  *
  * A raw `l.t BETWEEN r.t - delta AND r.t + delta` predicate gives Catalyst
  * nothing to hash on: it plans a per-key cartesian (or a broadcast
  * nested-loop), O(n·m) per key — a scale killer for hot keys. Instead the
  * time axis is quantized into buckets of width `delta`; a qualifying pair
  * differs by at most one bucket, so the left side is exploded to its three
  * adjacent buckets and joined as a plain EQUI-join on (keys, bucket), with
  * the exact |Δt| <= delta predicate applied after. Work is proportional to
  * genuinely-near pairs (3× left fan-out, hash-spread by (key, bucket)), and
  * each qualifying pair is emitted exactly once — the probe that hits is the
  * unique one equal to the right row's bucket.
  */
object IntervalJoin {

  /** Floor division as integer arithmetic: `div` truncates toward zero, so
    * for a negative time a qualifying pair straddling 0 could land two
    * buckets apart and be silently dropped (and diverge from DuckDB's
    * floor `//`). `x - pmod(x, d)` is the largest multiple of d ≤ x, making
    * the quotient a true floor for any sign. */
  private def floorDiv(timeCol: String, delta: Long): String =
    s"(CAST(`$timeCol` AS BIGINT) - pmod(CAST(`$timeCol` AS BIGINT), ${delta}L)) div ${delta}L"

  /** @param left      probe side (columns kept as-is)
    * @param right     build side (payload columns are suffixed `_r`)
    * @param keyCols   equi-key columns present on both sides
    * @param leftTime  time column on `left` (integral; any sign)
    * @param rightTime time column on `right` (same unit as `leftTime`)
    * @param delta     max |leftTime - rightTime| (inclusive), > 0
    * @param payload   right columns to carry (beyond key/time)
    */
  def join(left: DataFrame, right: DataFrame, keyCols: Seq[String],
           leftTime: String, rightTime: String, delta: Long,
           payload: Seq[String]): DataFrame = {
    require(delta > 0, "delta must be positive")
    // integral floor division, NOT `/`: double division loses ulps past 2^53
    // — a nanosecond epoch is ~2^60, and one wrong bucket silently drops pairs
    val l = left
      .withColumn("_bl", expr(floorDiv(leftTime, delta)))
      .withColumn("_probe", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("_bucket", col("_bl") + col("_probe"))
    val r = right.select(
      (keyCols.map(col) :+
        col(rightTime).cast("long").as("_tr") :+
        expr(floorDiv(rightTime, delta)).as("_bucket")) ++
        payload.map(c => col(c).as(s"${c}_r")): _*)
    l.join(r, keyCols :+ "_bucket")
      .where(abs(col(leftTime).cast("long") - col("_tr")) <= delta)
      .withColumn(s"${rightTime}_r", col("_tr"))
      .drop("_bl", "_probe", "_bucket", "_tr")
  }
}
