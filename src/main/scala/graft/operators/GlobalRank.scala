package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-safe global rank / ntile over a (unique) key — the COPY-phase
  * PK-range chunking primitive (reference A6: snapshot rows stream in PK
  * order and are fenced by LASTPK watermarks,
  * `cmd/internal/planetscale_edge_database.go:383-393`).
  *
  * `ntile(k) OVER (ORDER BY key)` with no partition key moves the whole
  * table through ONE partition (Spark warns exactly that) — correct at
  * sf0.1, dead at 100 TB. This formulation keeps every stage distributed:
  *
  *  1. `repartitionByRange(key)` — the same shuffle a global sort needs,
  *     but each partition stays independent afterwards;
  *  2. per-partition local rank (window PARTITIONED by partition id);
  *  3. partition row-count offsets via an O(P²) broadcast self-join of the
  *     P-row count relation (P = shuffle partitions — trivially small);
  *  4. global rank = offset + local rank; ntile is then a closed-form
  *     expression of (rank, total).
  *
  * Determinism: RangePartitioner samples with a fixed per-partition seed, so
  * boundaries (and therefore pids) are stable across recomputation.
  */
object GlobalRank {

  /** `parts <= 0` (the default) sizes the range partitioning from
    * `spark.sql.shuffle.partitions` — the knob a cluster already tunes to
    * its scale — instead of a hard-coded constant; the offset join stays
    * O(P²) on a P-row relation, trivial even at P in the thousands.
    */
  private def resolveParts(df: DataFrame, parts: Int): Int =
    if (parts > 0) parts
    else math.max(1, df.sparkSession.sessionState.conf.numShufflePartitions)

  /** Adds `rankCol` (1-based global rank by `key` ascending) and `totalCol`
    * (total row count). `key` values must be unique (PK semantics).
    */
  def withGlobalRank(df: DataFrame, key: Column, rankCol: String,
      totalCol: String, parts: Int = 0): DataFrame = {
    val local = df.repartitionByRange(resolveParts(df, parts), key)
      .withColumn("_grk_pid", spark_partition_id())
      .withColumn("_grk_lrank",
        row_number().over(Window.partitionBy(col("_grk_pid")).orderBy(key)))
    val counts = local.groupBy(col("_grk_pid")).agg(count(lit(1)).as("_grk_cnt"))
    // prefix-sum offsets without a (partitionless) window: P×P broadcast join
    val offs = counts.toDF("_grk_pid", "_grk_cnt")
      .crossJoin(broadcast(counts.toDF("_grk_pid2", "_grk_cnt2")))
      .groupBy(col("_grk_pid"))
      .agg(
        sum(when(col("_grk_pid2") < col("_grk_pid"), col("_grk_cnt2")).otherwise(0L)).as("_grk_off"),
        sum(col("_grk_cnt2")).as("_grk_total"))
    local.join(broadcast(offs), Seq("_grk_pid"))
      .withColumn(rankCol, col("_grk_off") + col("_grk_lrank"))
      .withColumn(totalCol, col("_grk_total"))
      .drop("_grk_pid", "_grk_lrank", "_grk_off", "_grk_total")
  }

  /** Exact `ntile(tiles) OVER (ORDER BY key)` semantics, distributed: the
    * first `total % tiles` tiles get `total/tiles + 1` rows, the rest
    * `total/tiles` (SQL-standard ntile).
    */
  def ntileByRange(df: DataFrame, key: Column, tiles: Int, chunkCol: String,
      parts: Int = 0): DataFrame = {
    val ranked = withGlobalRank(df, key, "_grk_rank", "_grk_tot", parts)
    val q = (col("_grk_tot") / tiles).cast("long")          // base tile size
    val r = col("_grk_tot") % tiles                          // tiles of size q+1
    val bigSpan = (q + 1) * r                                // rows in big tiles
    val chunk = when(col("_grk_rank") <= bigSpan,
        floor((col("_grk_rank") - 1) / (q + 1)) + 1)
      .otherwise(r + floor((col("_grk_rank") - bigSpan - 1) / q) + 1)
    ranked.withColumn(chunkCol, chunk.cast("int"))
      .drop("_grk_rank", "_grk_tot")
  }
}
