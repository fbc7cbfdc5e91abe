package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Change-data-capture materialization: apply an out-of-order changelog of
  * upserts and deletes onto a base snapshot — the MERGE INTO shape every
  * incremental 100 TB ingest pipeline runs (Delta/Hudi/Iceberg style), as a
  * plain two-stage Spark plan:
  *
  *   1. latest-wins per key: `groupBy(key).agg(max_by(payload, seq))` — ONE
  *      partial-aggregating shuffle; map-side combine keeps only one row per
  *      key per map task, so changelog volume (not key count) never crosses
  *      the wire more than once, and the state per key is a single struct.
  *   2. merge: ONE full-outer equi-join of the collapsed delta against the
  *      base. Keys absent from the delta pass through unchanged; keys whose
  *      last operation is a delete tombstone are dropped; everything else
  *      takes the delta payload (insert if the base never had the key).
  *
  * At scale the collapsed delta is usually a small fraction of the base, so
  * Catalyst/AQE broadcasts it and the base is never shuffled at all; when the
  * delta is huge both sides hash-partition on the key — either way there is
  * no plan shape that rescans the base per changelog row.
  *
  * Sequence ties are the caller's contract: `seqCols` must be a total order
  * per key (the catalog uses (o_orderdate, o_orderkey), unique by orderkey).
  */
object Cdc {

  val DeleteOp = "D"

  /** Collapse a changelog to its latest state per key: (key, op, payload...).
    * Pure aggregation — usable alone to maintain a "current state" table, and
    * the identical expression runs incrementally under Structured Streaming
    * (see the `stream_cdc_apply` catalog entry). */
  def latestState(changelog: DataFrame, keyCol: String, seqCols: Seq[String],
      opCol: String, payloadCols: Seq[String]): DataFrame = {
    val payload = struct((opCol +: payloadCols).map(col): _*)
    val seq = struct(seqCols.map(col): _*)
    changelog.groupBy(col(keyCol))
      .agg(max_by(payload, seq).as("__last"))
      .select(col(keyCol) +: (opCol +: payloadCols)
        .map(c => col(s"__last.$c").as(c)): _*)
  }

  /** MERGE the collapsed changelog onto `base`. Both frames must expose
    * `keyCol`; payload columns present in both are taken from the delta when
    * the key has churn, from the base otherwise. Output adds a `src` column
    * ('cdc' when the delta won, 'base' for untouched rows) so downstream
    * incremental consumers can cheaply isolate the changed partition. */
  def merge(base: DataFrame, latest: DataFrame, keyCol: String,
      payloadCols: Seq[String], opCol: String = "op"): DataFrame = {
    val b = payloadCols.foldLeft(base)((d, c) => d.withColumnRenamed(c, s"__b_$c"))
    val fromDelta: Column = col(opCol).isNotNull
    b.join(latest, Seq(keyCol), "full_outer")
      .where(col(opCol).isNull || col(opCol) =!= DeleteOp)
      .select(
        col(keyCol) +:
          payloadCols.map(c =>
            when(fromDelta, col(c)).otherwise(col(s"__b_$c")).as(c)) :+
          when(fromDelta, lit("cdc")).otherwise(lit("base")).as("src"): _*)
  }

  /** End-to-end: collapse + merge in one call. */
  def applyChangelog(base: DataFrame, changelog: DataFrame, keyCol: String,
      seqCols: Seq[String], opCol: String,
      payloadCols: Seq[String]): DataFrame =
    merge(base, latestState(changelog, keyCol, seqCols, opCol, payloadCols),
      keyCol, payloadCols, opCol)
}
