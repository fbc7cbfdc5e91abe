package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, the most recent right row at or before the
  * left row's time, per key ("backward" as-of, ties take the right row).
  *
  * Composed Spark-first as the classic tagged-union + window trick instead of
  * a custom physical operator: union both sides with a side tag, sort within
  * each key by (time, side), and carry the last-seen right payload forward
  * with `last(..., ignoreNulls)`. One shuffle on the key, no range join, no
  * per-key collect — at 100 TB this is a single sort-based window over the
  * union, which beats the O(left × right-per-key) theta-join Spark would
  * otherwise plan for `r.ts <= l.ts` + argmax.
  */
object AsOfJoin {

  /** @param left      probe side
    * @param right     quote side (payload columns are suffixed `_asof`)
    * @param keyCols   equi-key columns present on both sides
    * @param leftTime  time column on `left`
    * @param rightTime time column on `right`
    * @param payload   right columns to carry (beyond key/time)
    */
  def backward(left: DataFrame, right: DataFrame, keyCols: Seq[String],
               leftTime: String, rightTime: String,
               payload: Seq[String]): DataFrame = {
    val l = left.withColumn("_t", col(leftTime)).withColumn("_side", lit(1))
    val r = right.select(
      (keyCols.map(col) :+ col(rightTime).as("_t")) ++
        payload.map(c => col(c).as(s"${c}_asof")): _*)
      .withColumn("_side", lit(0))
    val lCols = left.columns
    val union = l.select(
      (lCols.map(col) ++ payload.map(c => lit(null).cast(
        right.schema(c).dataType).as(s"${c}_asof")) :+
        col("_t") :+ col("_side")).toIndexedSeq: _*)
      .unionByName(r.select(
        (keyCols.map(col) ++ lCols.filterNot(keyCols.contains).map(c =>
          lit(null).cast(left.schema(c).dataType).as(c)) ++
          payload.map(c => col(s"${c}_asof")) :+ col("_t") :+ col("_side")).toIndexedSeq: _*))
    // The carried payload is ONE struct that is null exactly on left rows:
    // last(_p, ignoreNulls) then picks the last right ROW atomically. Per-
    // column last(ignoreNulls) would tear rows — a right row with a genuine
    // NULL in one payload column would contribute its other columns while
    // that column fell back to an older row's value.
    val tagged = union.withColumn("_p",
      when(col("_side") === 0, struct(payload.map(c => col(s"${c}_asof")): _*)))
    // right rows sort before left rows at equal time => "at or before";
    // equal-time right rows tiebreak on the first payload column scanning
    // DESC, so the smallest value deterministically wins the last() pick
    // (mirrors forward())
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("_t").asc, col("_side").asc,
        col(s"${payload.head}_asof").desc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = tagged.withColumn("_pc", last(col("_p"), ignoreNulls = true).over(w))
    val restored = payload.foldLeft(carried) { (acc, c) =>
      acc.withColumn(s"${c}_asof", col(s"_pc.${c}_asof"))
    }
    restored.where(col("_side") === 1).drop("_t", "_side", "_p", "_pc")
  }

  /** Forward as-of: for every left row, the EARLIEST right row at or after
    * its time, per key. Same tagged-union shape scanned in descending time;
    * the first payload column must uniquely identify right rows (it breaks
    * equal-time ties toward the smallest value, deterministically). */
  def forward(left: DataFrame, right: DataFrame, keyCols: Seq[String],
              leftTime: String, rightTime: String,
              payload: Seq[String]): DataFrame = {
    val l = left.withColumn("_t", col(leftTime)).withColumn("_side", lit(1))
    val r = right.select(
      (keyCols.map(col) :+ col(rightTime).as("_t")) ++
        payload.map(c => col(c).as(s"${c}_asof")): _*)
      .withColumn("_side", lit(0))
    val lCols = left.columns
    val union = l.select(
      (lCols.map(col) ++ payload.map(c => lit(null).cast(
        right.schema(c).dataType).as(s"${c}_asof")) :+
        col("_t") :+ col("_side")).toIndexedSeq: _*)
      .unionByName(r.select(
        (keyCols.map(col) ++ lCols.filterNot(keyCols.contains).map(c =>
          lit(null).cast(left.schema(c).dataType).as(c)) ++
          payload.map(c => col(s"${c}_asof")) :+ col("_t") :+ col("_side")).toIndexedSeq: _*))
    // atomic whole-row carry, see backward()
    val tagged = union.withColumn("_p",
      when(col("_side") === 0, struct(payload.map(c => col(s"${c}_asof")): _*)))
    // descending time: the last right seen before a left row is the one with
    // the smallest time >= the left's; right ids scan descending so the
    // smallest id wins equal-time ties (left rows order among themselves is
    // irrelevant — they carry nothing)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("_t").desc, col("_side").asc,
        col(s"${payload.head}_asof").desc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = tagged.withColumn("_pc", last(col("_p"), ignoreNulls = true).over(w))
    val restored = payload.foldLeft(carried) { (acc, c) =>
      acc.withColumn(s"${c}_asof", col(s"_pc.${c}_asof"))
    }
    restored.where(col("_side") === 1).drop("_t", "_side", "_p", "_pc")
  }
}
