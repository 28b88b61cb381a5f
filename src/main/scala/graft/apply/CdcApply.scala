package graft.apply

import graft.core.{ShardCursor, SyncState, VGtid}
import graft.functions.VGtidRankExpr.vgtid_rank
import graft.laketable.{LakeTable, Snapshot}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Result of applying one micro-batch. */
final case class ApplyResult(
    snapshot: Snapshot,
    upserts: Long,
    deletes: Long,
    skipped: Boolean)

/** Distributed CDC apply: the Spark re-imagining of the reference's
  * single-threaded consume loop (`cmd/internal/planetscale_edge_database.go:
  * 291-462` + the sequential stream×shard loop `cmd/airbyte-source/read.go:
  * 103-138`). One micro-batch of change events → last-writer-wins dedup →
  * bucket-scoped copy-on-write MERGE into the lake table, with per-shard
  * VGTID cursors committed in the same snapshot (exactly-once).
  *
  * Scale notes:
  *  - LWW dedup is a single shuffle on the merge key; partial aggregation
  *    (`max_by`-style) happens map-side because we use a window over the
  *    already key-partitioned exchange. Hot repos are handled by AQE skew
  *    splitting on the join and by the key carrying `path` (high cardinality
  *    within a hot repo spreads its partitions).
  *  - The MERGE never rewrites the whole table: only buckets present in the
  *    batch are read back, anti-joined, and rewritten. The batch side of the
  *    join is broadcast when small (AQE decides from runtime stats).
  */
object CdcApply {

  /** Parity mode reproduces the reference's After-image-only semantics
    * (deletes dropped — `planetscale_edge_database.go:398-410`); native mode
    * applies deletes as row removals.
    */
  final case class ApplyConfig(parityMode: Boolean = false)

  /** LWW dedup: keep the newest event per (repo, path) by
    * (vgtid rank, event_seq) — the north-star's "(vgtid, event_seq) window".
    * Input must carry `vgtid`, `event_seq`, `op`, `before`, `after`.
    */
  def dedupLww(events: DataFrame): DataFrame = {
    val keyed = events
      .withColumn("_repo", coalesce(col("after.repo"), col("before.repo")))
      .withColumn("_path", coalesce(col("after.path"), col("before.path")))
      .withColumn("_rank", vgtid_rank(col("vgtid")))
    val w = Window.partitionBy("_repo", "_path")
      .orderBy(col("_rank").desc, col("event_seq").desc)
    keyed.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1).drop("_rn")
  }

  /** Apply one batch. Idempotent: replaying a batch whose id was already
    * committed (crash between sink write and checkpoint advance) is a no-op,
    * which is what makes restart-from-checkpoint exactly-once.
    */
  def applyBatch(
      table: LakeTable,
      events: DataFrame,
      cursors: Map[String, ShardCursor],
      batchId: Long,
      streamId: String = "default",
      conf: ApplyConfig = ApplyConfig()): ApplyResult = {

    val snap = table.currentSnapshot.getOrElse(
      throw new IllegalStateException("LakeTable.create() first"))

    // --- idempotence gate (exactly-once on replay) ---
    val key = s"batch:$streamId"
    val already = snap.summary.get(key).exists(_.toLong >= batchId)
    if (already) return ApplyResult(snap, 0L, 0L, skipped = true)

    val filtered = if (conf.parityMode) events.filter(col("op") =!= "delete") else events
    val last = dedupLww(filtered).cache()
    try {
      val upserts = last.filter(col("op") =!= "delete")
        .select(col("after.*"))
      val deletes = last.filter(col("op") === "delete")
        .select(col("_repo").as("repo"), col("_path").as("path"))
      val batchKeys = last.select(col("_repo").as("repo"), col("_path").as("path"))

      val bucket = LakeTable.bucketExpr(snap.numBuckets)
      val affected = last.select(
        pmod(xxhash64(col("_repo")), lit(snap.numBuckets)).cast("int").as("b"))
        .distinct().collect().map(_.getInt(0)).toSet

      val (upsertCount, deleteCount) = {
        val agg = last.agg(
          sum(when(col("op") =!= "delete", 1L).otherwise(0L)),
          sum(when(col("op") === "delete", 1L).otherwise(0L))).head()
        (Option(agg.get(0)).map(_.asInstanceOf[Long]).getOrElse(0L),
          Option(agg.get(1)).map(_.asInstanceOf[Long]).getOrElse(0L))
      }

      // --- merge: rewrite only affected buckets ---
      val newFiles = if (affected.nonEmpty) {
        val old = table.readFiles(snap, table.filesInBuckets(snap, affected))
        val survivors = old.join(batchKeys, Seq("repo", "path"), "left_anti")
        val merged = survivors.unionByName(upserts, allowMissingColumns = true)
          .withColumn("_bucket", bucket)
        table.writeDataFiles(
          merged.repartition(col("_bucket"), col("repo")), snap.schemaVersion)
      } else Nil

      // --- transactional cursor + lineage commit ---
      val prevState = snap.summary.get("cursors").map(SyncState.fromJson).getOrElse(SyncState.empty)
      val merged = cursors.values.foldLeft(prevState) { (st, c) =>
        val stateKey = s"${c.keyspace}:repo_content"
        // never move a cursor backwards (containment order, not lexicographic)
        val keep = st.cursorFor(stateKey, c.shard) match {
          case Some(old) if VGtid.parse(old.position).after(VGtid.parse(c.position)) => old
          case _ => c
        }
        st.updated(stateKey, keep)
      }
      val lineage =
        s"""{"batchId":$batchId,"buckets":${affected.size},"upserts":$upsertCount,"deletes":$deleteCount}"""
      val committed = table.commit(
        replacedBuckets = affected,
        newFiles = newFiles,
        summaryUpdates = Map(
          key -> batchId.toString,
          "cursors" -> merged.toJson,
          s"lineage:b$batchId" -> lineage))
      ApplyResult(committed, upsertCount, deleteCount, skipped = false)
    } finally last.unpersist()
  }

  /** Batch replay driver: applies a full changelog DataFrame in one shot
    * (the `Trigger.AvailableNow` degenerate case) — used by parity tests and
    * the benchmark's throughput measurement.
    */
  def replayAll(
      table: LakeTable,
      stream: DataFrame,
      cursors: Map[String, ShardCursor],
      conf: ApplyConfig = ApplyConfig()): ApplyResult =
    applyBatch(table, stream, cursors, batchId = 0L, conf = conf)
}
