package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — an operator Spark lacks natively, composed from built-ins
  * per the preference order (compose > custom Expression > custom plan):
  * union both sides with a marker, one pass of `last(..., ignoreNulls)` over
  * a (keys, time, marker) window, keep left rows. ONE shuffle on the join
  * keys, no point-in-time self-join explosion; at scale this is the
  * sort-merge-friendly formulation (the window sort co-locates with the
  * exchange), and skewed keys split under AQE like any window.
  */
object AsOfJoin {

  /** For each `left` row, attach the `right` row with the greatest
    * `rightTime <= leftTime` within the same `keys` (inner semantics: left
    * rows with no prior right row are dropped). `rightCols` must not collide
    * with left column names. Right-side ties on (keys, time) must be
    * pre-deduped by the caller for deterministic output.
    *
    * The right payload rides as ONE packed struct filled with a single
    * `last(ignoreNulls)` pass, so every matched value comes from the SAME
    * right row even when right columns are individually nullable, and the
    * match marker is the struct itself (never-null for a real right row) —
    * not a payload column.
    */
  def asof(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      rightCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val rStructType = org.apache.spark.sql.types.StructType(rightCols.map(right.schema(_)))
    val l = left
      .withColumn("_t", col(leftTime))
      .withColumn("_is_left", lit(1))
      .select((keys.map(col) ++ Seq(col("_t"), col("_is_left"))
        ++ leftCols.filterNot(keys.contains).map(col)
        ++ Seq(lit(null).cast(rStructType).as("_r"))): _*)
    val r = right
      .withColumn("_t", col(rightTime))
      .withColumn("_is_left", lit(0))
      .select((keys.map(col) ++ Seq(col("_t"), col("_is_left"))
        ++ leftCols.filterNot(keys.contains)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c))
        ++ Seq(struct(rightCols.map(col): _*).as("_r"))): _*)
    // right rows sort BEFORE left rows at equal time → "<=" semantics
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_t").asc, col("_is_left").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = l.unionByName(r)
      .withColumn("_r", last(col("_r"), ignoreNulls = true).over(w))
    filled.filter(col("_is_left") === 1 && col("_r").isNotNull)
      .select((keys.map(col) ++ leftCols.filterNot(keys.contains).map(col)
        ++ rightCols.map(c => col(s"_r.$c").as(c))): _*)
  }

  /** Range join: each left row matched to the bucket whose [lo, hi) interval
    * contains `value`. Small bucket tables broadcast (BroadcastNestedLoop
    * with the range predicate); Catalyst handles the strategy.
    */
  def rangeJoin(left: DataFrame, buckets: DataFrame, value: Column,
      lo: Column, hi: Column): DataFrame =
    left.join(broadcast(buckets), value >= lo && value < hi)
}
