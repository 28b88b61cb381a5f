package graft.streaming

import graft.apply.CdcApply
import graft.core.ShardCursor
import graft.functions.VGtidRankExpr.vgtid_rank
import graft.genlog.GenConfig
import graft.laketable.LakeTable
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Structured-Streaming CDC ingest driver — the re-imagined `read` verb
  * (`cmd/airbyte-source/read.go:41-138`): tail the changelog source, apply
  * each micro-batch with [[CdcApply]] (LWW dedup → bucketed MERGE), and
  * commit per-shard VGTID cursors in the same lake-table snapshot. Restart
  * resumes from the streaming checkpoint; a replayed batch after a crash
  * between sink-commit and checkpoint-advance is a no-op (idempotent apply)
  * — together: exactly-once.
  */
object CdcStream {

  final case class RunConfig(
      gen: GenConfig,
      tableRoot: String,
      checkpoint: String,
      maxEventsPerTrigger: Option[Long] = None,
      endSeq: Option[Long] = None,
      rowsPerPartition: Long = 250000L,
      parityMode: Boolean = false,
      streamId: String = "default")

  def sourceOptions(rc: RunConfig): Map[String, String] = {
    val c = rc.gen
    Map(
      "seed" -> c.seed.toString,
      "numEvents" -> c.numEvents.toString,
      "numShards" -> c.numShards.toString,
      "numRepos" -> c.numRepos.toString,
      "pathsPerRepo" -> c.pathsPerRepo.toString,
      "keyspace" -> c.keyspace,
      "zipfSkew" -> c.zipfSkew.toString,
      "deleteRatio" -> c.deleteRatio.toString,
      "copyRows" -> c.copyRows.toString,
      "contentBlocks" -> c.contentBlocks.toString,
      "rowsPerPartition" -> rc.rowsPerPartition.toString) ++
      rc.maxEventsPerTrigger.map("maxEventsPerTrigger" -> _.toString) ++
      rc.endSeq.map("endSeq" -> _.toString)
  }

  /** Per-shard end cursors of a batch: max-rank vgtid per (keyspace, shard) —
    * the position stamped into the snapshot summary, batch-current like the
    * reference's metadata position (`planetscale_edge_database.go:437-450`).
    */
  def cursorsFromBatch(batch: DataFrame): Map[String, ShardCursor] = {
    batch.groupBy(col("keyspace"), col("shard"))
      .agg(max_by(col("vgtid"), vgtid_rank(col("vgtid"))).as("v"),
        max_by(struct(col("last_pk")), col("event_seq")).getField("last_pk").as("pk"))
      .collect().map { case Row(ks: String, shard: String, v: String, pk) =>
        val lastPk = Option(pk).map { r =>
          val rr = r.asInstanceOf[Row]
          graft.core.LastPk(rr.getString(0), rr.getString(1))
        }
        shard -> ShardCursor(ks, shard, v, lastPk)
      }.toMap
  }

  /** Run one `Trigger.AvailableNow` pass: peek the head, drain to it in
    * micro-batches, commit, stop. Returns the number of batches applied.
    */
  def runAvailableNow(spark: SparkSession, rc: RunConfig): Long = {
    val table = new LakeTable(rc.tableRoot, spark)
    require(table.currentVersion.nonEmpty, "create the lake table first")
    var batches = 0L
    val stream = spark.readStream
      .format("graft-changelog")
      .options(sourceOptions(rc))
      .load()
    val q = stream.writeStream
      .option("checkpointLocation", rc.checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val cursors = cursorsFromBatch(batch)
        val res = CdcApply.applyBatch(table, batch, cursors, batchId,
          streamId = rc.streamId, conf = CdcApply.ApplyConfig(parityMode = rc.parityMode))
        if (!res.skipped) batches += 1
        ()
      }
      .start()
    q.awaitTermination()
    batches
  }
}
