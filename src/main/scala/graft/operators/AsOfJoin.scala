package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Generic as-of join: for each left row, attach the right row with the
  * greatest `rightTs <= leftTs` within the same `keys` (DuckDB
  * `ASOF JOIN ... ON l.ts >= r.ts` semantics, left-outer: unmatched
  * left rows keep null right columns).
  *
  * Scalable plan — NOT a per-key cross product: both sides are tagged
  * and unioned, shuffled ONCE on `keys`, sorted within partitions by
  * `(ts, side)` (right rows first at equal ts, so equal timestamps
  * match), and the latest right payload is carried forward with a
  * running `last(_, ignoreNulls)` window. Cost ≅ one sort-merge join
  * shuffle; per-key data need not fit in memory (window is a running
  * frame, not a full-partition buffer).
  *
  * Reference had no as-of *join* operator, but surfaces `as of`
  * time-travel (reference: parsing/IceParser.scala:96) — this is the
  * event-data analogue required by SURVEY.md §2 B15.
  */
object AsOfJoin {

  def apply(left: DataFrame, right: DataFrame, keys: Seq[String],
            leftTs: String, rightTs: String): DataFrame = {
    val rPayloadCols = right.columns.filterNot(c => keys.contains(c) || c == rightTs)
    val lPayloadCols = left.columns.filterNot(c => keys.contains(c) || c == leftTs)
    val rpayStruct = struct(rPayloadCols.map(col) :+ col(rightTs).as("right_ts"): _*)
    val rpayType = right.select(rpayStruct.as("__rpay")).schema("__rpay").dataType

    val lNorm = left.select(
      keys.map(col) ++
        Seq(col(leftTs).as("__ts"), lit(1).as("__is_left"),
            lit(null).cast(rpayType).as("__rpay")) ++
        lPayloadCols.map(col): _*)
    val rNorm = right.select(
      keys.map(col) ++
        Seq(col(rightTs).as("__ts"), lit(0).as("__is_left"),
            rpayStruct.as("__rpay")) ++
        lPayloadCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__is_left"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    lNorm.unionByName(rNorm)
      .withColumn("__m", last(col("__rpay"), ignoreNulls = true).over(w))
      .filter(col("__is_left") === 1)
      .select(
        keys.map(col) ++
          Seq(col("__ts").as(leftTs)) ++
          lPayloadCols.map(col) ++
          rPayloadCols.map(c => col(s"__m.$c").as(c)) :+
          col("__m.right_ts").as("right_ts"): _*)
  }
}
