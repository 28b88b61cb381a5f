package graft.streaming

import graft.functions.VGtidRankExpr.vgtid_rank
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-time streaming analytics over the change stream — the watermark /
  * windowed-aggregation / stateful-processing surface of the engine (the
  * reference is cursor-ordered and needs none of this, SURVEY.md §2 Part B
  * "Streaming"; these operators exist for the pipelines built ON TOP of the
  * ingested stream).
  */
object StreamMonitor {

  /** Windowed per-shard event rates with a watermark for late data: the
    * changelog has no wall-clock column (positions, not timestamps), so
    * event time is derived deterministically from the per-shard sequence —
    * a synthetic-but-monotone event clock (1 event = 1 second from epoch).
    */
  def shardRates(stream: DataFrame, windowSecs: Int = 60, lateSecs: Int = 30): DataFrame =
    stream
      .withColumn("event_time", timestamp_seconds(col("event_seq")))
      .withWatermark("event_time", s"$lateSecs seconds")
      .groupBy(window(col("event_time"), s"$windowSecs seconds"), col("shard"))
      .agg(count(lit(1)).as("events"),
        max(vgtid_rank(col("vgtid"))).as("max_rank"))
      .select(col("window.start").as("w_start"), col("shard"), col("events"), col("max_rank"))

  /** STREAM-STREAM interval join: each delete correlated with the writes of
    * the same key in the preceding `horizonSecs` of event time — "how long
    * did content live before deletion". Both sides are watermarked and the
    * join condition carries the event-time range bound, so Spark can expire
    * buffered state (the canonical bounded-state stream-stream join; an
    * unbounded-condition join would accumulate state forever at 100 TB).
    */
  def deleteLatency(stream: DataFrame, horizonSecs: Int = 600,
      lateSecs: Int = 60): DataFrame = {
    val base = stream
      .withColumn("event_time", timestamp_seconds(col("event_seq")))
      .withColumn("_repo", coalesce(col("after.repo"), col("before.repo")))
      .withColumn("_path", coalesce(col("after.path"), col("before.path")))
    val writes = base.filter(col("op") =!= "delete")
      .select(col("_repo").as("w_repo"), col("_path").as("w_path"),
        col("event_time").as("w_time"))
      .withWatermark("w_time", s"$lateSecs seconds")
    val deletes = base.filter(col("op") === "delete")
      .select(col("_repo").as("repo"), col("_path").as("path"),
        col("event_time").as("d_time"))
      .withWatermark("d_time", s"$lateSecs seconds")
    deletes.join(writes,
      col("repo") === col("w_repo") && col("path") === col("w_path") &&
        col("w_time") >= col("d_time") - expr(s"interval $horizonSecs seconds") &&
        col("w_time") < col("d_time"))
      .select(col("repo"), col("path"), col("d_time"), col("w_time"),
        (unix_timestamp(col("d_time")) - unix_timestamp(col("w_time"))).as("secs_alive"))
  }

  /** Per-key running state via flatMapGroupsWithState: tracks how many times
    * each (repo, path) has been rewritten and emits a record on every change
    * whose `version_no` is the running per-key update count — custom
    * KeyValueGroupedDataset state (the engine's mapGroupsWithState surface).
    */
  final case class KeyUpdate(repo: String, path: String, event_seq: Long)
  final case class KeyVersion(repo: String, path: String, version_no: Long, last_seq: Long)

  def keyVersions(updates: Dataset[KeyUpdate]): Dataset[KeyVersion] = {
    import updates.sparkSession.implicits._
    updates
      .groupByKey(u => (u.repo, u.path))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: (String, String), rows: Iterator[KeyUpdate], state: GroupState[Long]) =>
          val prior = state.getOption.getOrElse(0L)
          val sorted = rows.toSeq.sortBy(_.event_seq)
          val out = sorted.zipWithIndex.map { case (u, i) =>
            KeyVersion(key._1, key._2, prior + i + 1, u.event_seq)
          }
          state.update(prior + sorted.size)
          out.iterator
      }
  }
}
