package graft.apply

import graft.core.{LastPk, ShardCursor, ShardStats, SyncState, VGtid}
import graft.functions.VGtidRankExpr.vgtid_rank
import graft.laketable.{LakeTable, Snapshot}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Result of applying one micro-batch. `stats` carries per-shard end cursors
  * + lineage derived from the SAME job that staged the batch (no second
  * source scan).
  */
final case class ApplyResult(
    snapshot: Snapshot,
    upserts: Long,
    deletes: Long,
    skipped: Boolean,
    stats: Map[String, ShardStats] = Map.empty,
    // highest wire schema_version among the batch's winners (recovered from
    // the same staged provenance read as the cursors — no extra scan); the
    // streaming driver compares it to the applied registry version to
    // trigger Avro-driven evolution. 1 = base / parity mode.
    maxSchemaVersion: Int = 1)

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
    * applies deletes as row removals. `saltBuckets` switches LWW dedup to
    * the explicitly salted two-level tree (see [[dedupLwwSalted]]) for
    * key-flood skew. `wireSpec` marks the batch as a RAW WIRE-STRING
    * changelog: every after-image column is run through the reference's
    * `parseValue` normalization (`types.go:139-220`) and cast to its typed
    * landing column INSIDE the staging job — normalization is part of the
    * ingest plan (one pass, codegen'd column expressions), not a separate
    * post-pass over the table. `keyColumns` names the merge key in the event
    * payload — in the same order as the table's leading field ids 1..k — so
    * ANY table with a composite PK ingests, not just repo_content; the
    * first key column drives bucketing.
    */
  final case class ApplyConfig(parityMode: Boolean = false,
      saltBuckets: Option[Int] = None,
      wireSpec: Option[graft.core.WireTableSpec] = None,
      keyColumns: Seq[String] = Seq("repo", "path"),
      // two-pass winner dedup ([[dedupLwwTwoPass]]): decide winner positions
      // over light rows + a Bloom pre-filter, so the wide aggregation
      // shuffle never carries losing payloads (guide §3.2/§8). Default OFF:
      // interleaved A/B at the bench shape (11M events, ~300-byte payloads,
      // 200k keys, local[32] fast disks) measured single-pass 6.9 s vs
      // two-pass 8.2 s — the extra source pass + Bloom build outweigh the
      // payload-shuffle savings until payloads are much heavier than keys
      // (multi-KB rows, or remote/slow shuffle fabric), which is when this
      // knob earns its keep. Result-identical either way (spec-asserted).
      twoPassDedup: Boolean = false)

  /** Trailing window of `lineage:b<N>` summary keys retained per stream —
    * older entries are pruned at commit so the snapshot summary stays O(1)
    * over a stream's lifetime (the metrics sidecar is the durable record;
    * only the newest batch can ever need a lineage-driven metrics backfill).
    */
  val lineageKeep: Long = 64L

  private val lineageMapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private[graft] def lineageJson(batchId: Long, buckets: Int, upserts: Long,
      deletes: Long, wallMs: Long, version: Long,
      stats: Map[String, ShardStats]): String = {
    val n = lineageMapper.createObjectNode()
    n.put("batchId", batchId); n.put("buckets", buckets)
    n.put("upserts", upserts); n.put("deletes", deletes)
    n.put("wallMs", wallMs); n.put("version", version)
    val sh = n.putObject("shards")
    stats.toSeq.sortBy(_._1).foreach { case (shard, st) =>
      val s = sh.putObject(shard)
      s.put("keyspace", st.cursor.keyspace)
      s.put("position", st.cursor.position)
      s.put("start", st.vgtidStart); s.put("end", st.vgtidEnd)
      s.put("rows", st.rows)
    }
    lineageMapper.writeValueAsString(n)
  }

  /** Parsed lineage entry: (wallMs, committedVersion, per-shard stats). */
  private[graft] def lineageStats(json: String): (Long, Long, Map[String, ShardStats]) = {
    import scala.jdk.CollectionConverters._
    val n = lineageMapper.readTree(json)
    val shards = Option(n.get("shards")).map(_.properties().asScala.map { e =>
      val s = e.getValue
      e.getKey -> ShardStats(
        ShardCursor(s.get("keyspace").asText(), e.getKey, s.get("position").asText(), None),
        s.get("rows").asLong(), s.get("start").asText(), s.get("end").asText())
    }.toMap).getOrElse(Map.empty[String, ShardStats])
    (Option(n.get("wallMs")).map(_.asLong()).getOrElse(0L),
      Option(n.get("version")).map(_.asLong()).getOrElse(0L), shards)
  }

  /** Key names whose canonical `_<name>` column would collide with the
    * dedup/staging internals (`_rank`, `_salt`, `_win`, …) — a collision
    * would silently corrupt the LWW grouping, so fail loud instead.
    */
  private val ReservedKeyNames =
    Set("rank", "salt", "win", "key_events", "sub_events", "rn", "kind", "bucket",
      "payload")

  /** Canonical merge-key columns `_<name>` from the event's after/before
    * images (delete events carry the key only in `before`). `landing` maps
    * each raw key to its canonical (typed) form BEFORE dedup groups on it —
    * for wire streams this is the normalized typed value, so two wire
    * spellings of one logical key ("42"/"042") can never stage two winners.
    */
  private def withKeyCols(events: DataFrame, keys: Seq[String],
      landing: (String, Column) => Column): DataFrame = {
    val bad = keys.filter(ReservedKeyNames.contains)
    require(bad.isEmpty,
      s"key column name(s) ${bad.mkString(", ")} collide with dedup internals " +
        s"(reserved: ${ReservedKeyNames.toSeq.sorted.mkString(", ")})")
    keys.foldLeft(events)((df, k) =>
      df.withColumn(s"_$k", landing(k, coalesce(col(s"after.$k"), col(s"before.$k")))))
  }

  /** Identity key landing (typed streams: the payload key IS canonical). */
  val rawKey: (String, Column) => Column = (_, c) => c

  /** Wire-stream key landing: normalize + typed cast, and FAIL LOUD when a
    * non-null wire key is unrepresentable in the landing type — a silently
    * nulled merge key would escape every later anti-join (NULL ≠ NULL) and
    * accumulate un-updatable duplicate rows. Values get the lands-null
    * contract; KEYS get the PK-integrity contract.
    */
  def wireKey(ws: graft.core.WireTableSpec): (String, Column) => Column = (k, c) => {
    val landed = ws.normalizedLanding(k, c)
    when(c.isNull || landed.isNotNull, landed)
      .otherwise(raise_error(concat(
        lit(s"unrepresentable merge-key value for '$k': "), c.cast("string"))))
  }

  /** LWW dedup: keep the newest event per merge key (default `(repo, path)`;
    * any composite key via `keys`) by (vgtid rank, event_seq) — the
    * north-star's "(vgtid, event_seq) window".
    * Input must carry `vgtid`, `event_seq`, `op`, `before`, `after`.
    *
    * Implementation: winner keys via `max(struct(rank, seq))` — a hash
    * aggregate with MAP-SIDE partial combine, so the shuffle carries one
    * small row per key per partition instead of every event's content bytes
    * — then a join back to pick the winning rows. AQE broadcasts the winner
    * side when it is small (typical micro-batch); at worst it degrades to a
    * shuffle join on the key, never worse than the window formulation. Hot
    * repos (Zipf skew) are absorbed by the map-side combine, the classic
    * skew cure the window version lacks.
    */
  def dedupLww(events: DataFrame,
      keys: Seq[String] = Seq("repo", "path"),
      keyLanding: (String, Column) => Column = rawKey): DataFrame = {
    val keyed = withKeyCols(events, keys, keyLanding)
      .withColumn("_rank", vgtid_rank(col("vgtid")))
    val keyCols = keys.map(k => col(s"_$k"))
    val payload = events.columns.map(col) :+ col("_rank")
    // LwwMaxBy (TypedImperativeAggregate) instead of max_by(struct, struct):
    // ObjectHashAggregate-eligible → hash probes, no per-partition sort.
    // `_key_events` (events folded into this key) rides along so per-shard
    // processed-row counts can be recovered from the winners without
    // re-scanning the source (sum of per-key counts = batch rows).
    // The payload struct is PRE-BUILT in the (codegen'd) child projection —
    // inside the aggregate it is a bound reference, so LwwMaxBy's update
    // sees an UnsafeRow and copies winners with one buffer memcpy instead
    // of an interpreted CreateNamedStruct eval + field re-encode per
    // improving row (ObjectHashAggregate evaluates update expressions
    // interpreted).
    keyed
      .withColumn("_payload", struct(payload: _*))
      .groupBy(keyCols: _*)
      .agg(graft.functions.LwwMaxBy.lww_max_by(
        col("_payload"), col("_rank"), col("event_seq")).as("_win"),
        count(lit(1)).as("_key_events"))
      .select(keyCols ++ Seq(col("_win.*"), col("_key_events")): _*)
  }

  /** TWO-PASS LWW dedup (guide §8 "decide with small rows, move big rows
    * once"): pass 1 aggregates only `(key, rank, seq, count)` — the winner
    * POSITION per key — so its shuffle carries ~32 bytes per key-partition
    * instead of the full event payload (content bytes). Pass 2 re-reads the
    * events, keeps only rows matching a winner position (an inner join the
    * planner broadcasts when the winner set is small; the payload columns of
    * non-winners are never shuffled — and for a column-prunable source,
    * pass 1 never even READS the payload columns), then runs the same exact
    * [[dedupLww]]-style final aggregate over the surviving handful to
    * resolve position ties identically to the single-pass form.
    *
    * Equivalence: the final aggregate is the same `lww_max_by` over the same
    * candidate rows that would have won the single-pass aggregate (pass 1
    * computes the exact per-key max position, and the join keeps every row
    * AT that position — a superset containing the single-pass winner), and
    * `_key_events` comes from pass 1's per-key count over ALL events, like
    * the single-pass `count(lit(1))`. Spec-asserted equal to [[dedupLww]].
    *
    * Cost note: the source is read twice. Worth it when the dedup ratio is
    * high (CDC catch-up streams: many events per key) or payloads are heavy;
    * for tiny micro-batches the extra join/aggregate jobs can cost more than
    * they save — [[ApplyConfig.twoPassDedup]] picks per caller.
    */
  def dedupLwwTwoPass(events: DataFrame,
      keys: Seq[String] = Seq("repo", "path"),
      keyLanding: (String, Column) => Column = rawKey): DataFrame =
    dedupLwwTwoPassManaged(events, keys, keyLanding)._1

  /** Two-pass with resource handle: `cleanup` unpersists the winner-position
    * relation and drops the Bloom broadcast — call it once the returned
    * DataFrame has been fully consumed (the apply calls it right after the
    * staged write materializes).
    *
    * Winner pre-filter mechanics (guide §3.2 manual Bloom): the light pass's
    * exact per-key winner positions feed a driver-built Bloom filter over
    * `xxhash64(key…, rank, seq)`; pass 2 FILTERS the events on membership —
    * never a join against the big side, so no planner/AQE strategy choice
    * can ever shuffle or broadcast the payload stream (an exact-position
    * join formulation measured pathological: the static planner broadcast
    * the 11M-row generator side off its tiny size estimate). False
    * positives only admit LOSING rows — every true winner's exact position
    * is in the filter, so the final exact aggregate's result is unchanged
    * by construction, at any fpp. Per-key counts ride back via a
    * winner-scale join between the two aggregate outputs (both sides have
    * runtime stats, so AQE sizes that join safely).
    */
  private[graft] def dedupLwwTwoPassManaged(events: DataFrame,
      keys: Seq[String] = Seq("repo", "path"),
      keyLanding: (String, Column) => Column = rawKey): (DataFrame, () => Unit) = {
    val keyed = withKeyCols(events, keys, keyLanding)
      .withColumn("_rank", vgtid_rank(col("vgtid")))
    val keyCols = keys.map(k => col(s"_$k"))
    // pass 1: exact winner position per key, ObjectHashAggregate-eligible
    // (LwwMaxBy with a 2-long payload), plus the per-key event count.
    // Persisted because it is consumed three times (count, Bloom build,
    // count join) — ~32 bytes per key, spills to disk beyond memory.
    val light = keyed
      .groupBy(keyCols: _*)
      .agg(graft.functions.LwwMaxBy.lww_max_by(
        struct(col("_rank"), col("event_seq")), col("_rank"), col("event_seq")).as("_wpos"),
        count(lit(1)).as("_key_events"))
      .select(keys.map(k => col(s"_$k").as(s"_w_$k")) ++ Seq(
        col("_wpos._rank").as("_wrank"), col("_wpos.event_seq").as("_wseq"),
        col("_key_events")): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nKeys = light.count()
    val eventHash = xxhash64(keyCols ++ Seq(col("_rank"), col("event_seq")): _*)
    // empty batch: stat.bloomFilter NPEs on a zero-row input (null aggregate
    // buffer) — and there is nothing to keep anyway
    var bfB: Option[org.apache.spark.broadcast.Broadcast[
      org.apache.spark.util.sketch.BloomFilter]] = None
    val winFilter: Column =
      if (nKeys == 0) lit(false)
      else {
        val lightHash = xxhash64(
          keys.map(k => col(s"_w_$k")) ++ Seq(col("_wrank"), col("_wseq")): _*)
        // fpp 1% ≈ 9.6 bits/key: ~240 KB per million keys on the driver and
        // in each task — the §3.2 cost, paid instead of any big-side shuffle
        val bf = light.select(lightHash.as("_h")).stat.bloomFilter("_h", nKeys, 0.01)
        val b = events.sparkSession.sparkContext.broadcast(bf)
        bfB = Some(b)
        // asNondeterministic (guide §4.4): a deterministic predicate would be
        // PUSHED THROUGH the source projection, rewriting the condition in
        // terms of the projection's expressions — for an expression-defined
        // source (the synthetic changelog) that inlines the full payload
        // subtree into the filter and re-evaluates it per extraction
        // (measured 25+ s vs ~7 s). Non-deterministic pins the filter ABOVE
        // the projection: rows materialize once, then the cheap probe runs.
        val mightWin = udf((h: Long) => b.value.mightContainLong(h)).asNondeterministic()
        mightWin(eventHash)
      }
    // pass 2: membership filter (pushes below the payload projection — for
    // a column-prunable source the losing rows' payload columns are never
    // computed), then the SAME exact aggregate as dedupLww over the
    // surviving winners+FPs — identical winner semantics, tie class included
    val filtered = keyed.filter(winFilter)
    val payload = events.columns.map(col) :+ col("_rank")
    val winners = filtered
      .withColumn("_payload", struct(payload: _*)) // pre-built, see dedupLww
      .groupBy(keyCols: _*)
      .agg(graft.functions.LwwMaxBy.lww_max_by(
        col("_payload"), col("_rank"), col("event_seq")).as("_win"))
    // attach pass-1's per-key event counts (null-safe: null keys group)
    val joinCond = keys.map(k => col(s"_$k") <=> col(s"_w_$k")).reduce(_ && _)
    val out = winners.join(light, joinCond, "inner")
      .select(keyCols ++ Seq(col("_win.*"), col("_key_events")): _*)
    (out, () => { light.unpersist(false); bfB.foreach(_.destroy()); () })
  }

  /** Explicitly SALTED LWW dedup (north-star "salting merge keys"): a
    * two-level aggregation tree — partial LWW per (key, salt) then final LWW
    * per key — for the pathological case the map-side combine alone can't
    * spread: ONE merge key receiving a flood so large that even the combined
    * per-partition candidates overwhelm a single reducer's input. `max` is
    * associative, so the salted tree is exactly equivalent (spec-asserted).
    * The salt is `event_seq % salts`: deterministic, uniform within a key.
    * Costs one extra (tiny: winners-only) shuffle — enable via
    * `ApplyConfig.saltBuckets` only when key-flood skew is expected.
    */
  def dedupLwwSalted(events: DataFrame, salts: Int,
      keys: Seq[String] = Seq("repo", "path"),
      keyLanding: (String, Column) => Column = rawKey): DataFrame = {
    val keyed = withKeyCols(events, keys, keyLanding)
      .withColumn("_rank", vgtid_rank(col("vgtid")))
    val keyCols = keys.map(k => col(s"_$k"))
    val payload = events.columns.map(col) :+ col("_rank")
    val partial = keyed
      .withColumn("_payload", struct(payload: _*)) // pre-built, see dedupLww
      .groupBy(keyCols :+ pmod(col("event_seq"), lit(salts)).as("_salt"): _*)
      .agg(graft.functions.LwwMaxBy.lww_max_by(
        col("_payload"), col("_rank"), col("event_seq")).as("_win"),
        count(lit(1)).as("_sub_events"))
    partial
      .groupBy(keyCols: _*)
      .agg(graft.functions.LwwMaxBy.lww_max_by(
        col("_win"), col("_win._rank"), col("_win.event_seq")).as("_win"),
        sum(col("_sub_events")).as("_key_events"))
      .select(keyCols ++ Seq(col("_win.*"), col("_key_events")): _*)
  }

  /** Window-formulated LWW (reference semantics oracle for tests). */
  def dedupLwwWindow(events: DataFrame,
      keys: Seq[String] = Seq("repo", "path"),
      keyLanding: (String, Column) => Column = rawKey): DataFrame = {
    val keyed = withKeyCols(events, keys, keyLanding)
      .withColumn("_rank", vgtid_rank(col("vgtid")))
    val w = Window.partitionBy(keys.map(k => col(s"_$k")): _*)
      .orderBy(col("_rank").desc, col("event_seq").desc)
    keyed.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1).drop("_rn")
  }

  /** Per-winner provenance columns staged alongside the data columns: enough
    * to recover per-shard cursors/lineage from the ALREADY-WRITTEN staged
    * parquet (one column-pruned read of local winner files — never a second
    * scan of the source). keyspace/shard dictionary-encode to ~nothing;
    * vgtid strings share a long prefix (snappy); the rest are small
    * longs/bools. They double as per-row provenance in the adopted files
    * (readers project by schema field ids, so they are invisible to queries).
    */
  private val statsCols: Seq[Column] = Seq(
    col("keyspace").as("_s_keyspace"), col("shard").as("_s_shard"),
    col("vgtid").as("_s_vgtid"), col("_rank").as("_s_rank"),
    col("event_seq").as("_s_seq"), col("is_copy_phase").as("_s_copy"),
    col("last_pk.repo").as("_s_pk_repo"), col("last_pk.path").as("_s_pk_path"),
    col("_key_events").as("_s_key_events"),
    col("schema_version").as("_s_schema_ver"))

  /** Per-shard stats aggregated from the staged LWW winners. Correct because
    * within a shard events are totally ordered by `event_seq`: the shard's
    * latest event is the latest for its key, so it always survives dedup —
    * max over winners = max over the batch. Watermark rule (the reference
    * clears LastKnownPk once the copy phase completes): any catch-up event
    * in the shard nulls `last_pk`; otherwise the max-seq COPY row's
    * watermark is kept. Keys never span shards, so per-key `_s_key_events`
    * sums to the shard's processed rows.
    *
    * The same aggregation also carries the per-kind staged row counts
    * (`_kind` is a partition column of the staged read), so ONE job yields
    * cursors, lineage stats, AND the upsert/delete counts the apply reports
    * — previously three separate jobs per micro-batch.
    */
  private def statsFromStaged(winners: DataFrame): DataFrame =
    winners
      .select(col("_s_keyspace"), col("_s_shard"), col("_s_vgtid"), col("_s_rank"),
        col("_s_seq"), col("_s_copy"), col("_s_pk_repo"), col("_s_pk_path"),
        col("_s_key_events"), col("_s_schema_ver"), col("_kind"))
      .groupBy(col("_s_keyspace"), col("_s_shard")).agg(
        max_by(col("_s_vgtid"), struct(col("_s_rank"), col("_s_seq"))).as("_s_vend"),
        max(when(col("_s_copy"), lit(0)).otherwise(lit(1))).as("_s_catchup"),
        max_by(col("_s_pk_repo"),
          when(col("_s_copy"), col("_s_seq")).otherwise(lit(-1L))).as("_s_pk_repo2"),
        max_by(col("_s_pk_path"),
          when(col("_s_copy"), col("_s_seq")).otherwise(lit(-1L))).as("_s_pk_path2"),
        sum(col("_s_key_events")).as("_s_rows"),
        max(col("_s_schema_ver")).as("_s_max_sv"),
        sum(when(col("_kind") === "u", lit(1L)).otherwise(lit(0L))).as("_n_u"),
        sum(when(col("_kind") === "d", lit(1L)).otherwise(lit(0L))).as("_n_d"))

  /** Per-shard stats by re-aggregating the RAW batch (second source scan) —
    * used only in parity mode, where deletes are filtered out before dedup
    * but must still advance the cursor position (the reference advances on
    * VGTID events regardless of row emission). The native path derives stats
    * from the staged winners instead — one scan.
    */
  def statsFromEvents(batch: DataFrame, prevState: SyncState,
      streamName: String = "repo_content"): Map[String, ShardStats] =
    batch.groupBy(col("keyspace"), col("shard")).agg(
      max_by(col("vgtid"), struct(vgtid_rank(col("vgtid")), col("event_seq"))).as("_s_vend"),
      max(when(col("is_copy_phase"), lit(0)).otherwise(lit(1))).as("_s_catchup"),
      max_by(col("last_pk.repo"),
        when(col("is_copy_phase"), col("event_seq")).otherwise(lit(-1L))).as("_s_pk_repo"),
      max_by(col("last_pk.path"),
        when(col("is_copy_phase"), col("event_seq")).otherwise(lit(-1L))).as("_s_pk_path"),
      count(lit(1)).as("_s_rows"))
      .collect().map { r =>
        statsFromRow(r.getString(0), r.getString(1), r.getString(2), r.getInt(3),
          Option(r.getString(4)), Option(r.getString(5)), r.getLong(6), prevState, streamName)
      }.toMap

  private def statsFromRow(ks: String, shard: String, vEnd: String, catchup: Int,
      pkRepo: Option[String], pkPath: Option[String], rows: Long,
      prevState: SyncState, streamName: String): (String, ShardStats) = {
    val pk = if (catchup == 1) None
             else for { r <- pkRepo; p <- pkPath } yield LastPk(r, p)
    val prevPos = prevState.cursorFor(s"$ks:$streamName", shard).map(_.position).getOrElse("")
    shard -> ShardStats(ShardCursor(ks, shard, vEnd, pk), rows, prevPos, vEnd)
  }

  /** Apply one batch. Idempotent: replaying a batch whose id was already
    * committed (crash between sink write and checkpoint advance) is a no-op,
    * which is what makes restart-from-checkpoint exactly-once. Per-shard end
    * cursors are derived INSIDE the staging job — the winner rows carry
    * `_s_*` provenance columns into the staged parquet, and cursors/lineage
    * are aggregated from a column-pruned read of those already-written files
    * — so the source is scanned exactly once per batch.
    *
    * `streamName` is the source TABLE name: committed cursors are keyed
    * `<keyspace>:<streamName>` (the reference's `namespace + ":" + name`
    * state key, `read.go:108`), so multi-stream catalog state round-trips
    * through `SyncState.readState` and reference-shaped `--state` files.
    */
  def applyBatch(
      table: LakeTable,
      events: DataFrame,
      batchId: Long,
      streamId: String = "default",
      conf: ApplyConfig = ApplyConfig(),
      streamName: String = "repo_content"): ApplyResult = {

    val tStart = System.nanoTime()
    val snap = table.currentSnapshot.getOrElse(
      throw new IllegalStateException("LakeTable.create() first"))

    // --- idempotence gate (exactly-once on replay) ---
    val key = s"batch:$streamId"
    val already = snap.summary.get(key).exists(_.toLong >= batchId)
    if (already) return ApplyResult(snap, 0L, 0L, skipped = true)

    val prevState = snap.summary.get("cursors").map(SyncState.fromJson).getOrElse(SyncState.empty)
    val keys = conf.keyColumns
    // wire streams: keys are canonicalized (normalized + typed, fail-loud on
    // unrepresentable) BEFORE dedup, so grouping, bucketing and landing all
    // see one identical typed key value
    val keyLanding = conf.wireSpec.map(wireKey).getOrElse(rawKey)
    val filtered = if (conf.parityMode) events.filter(col("op") =!= "delete") else events
    val (deduped, cleanupDedup) = conf.saltBuckets match {
      case Some(salts)               => (dedupLwwSalted(filtered, salts, keys, keyLanding), () => ())
      case None if conf.twoPassDedup => dedupLwwTwoPassManaged(filtered, keys, keyLanding)
      case None                      => (dedupLww(filtered, keys, keyLanding), () => ())
    }
    val spark = events.sparkSession

    // --- stage (ONE job: gen/source → LWW combine → bucket shuffle → parquet).
    // Staged upsert files ARE the final data files (adopted by rename, no
    // rewrite): the heavy content bytes are written exactly once per batch.
    // Event payloads speak the table's ORIGINAL (v0) column names; after
    // Avro-driven renames the current snapshot may use different names —
    // map by Iceberg-style field id (rename = metadata only), columns added
    // since v0 fill null.
    // `_<key>` columns are already canonical/typed (keyLanding ran before
    // dedup), so bucketing here hashes the SAME value the survivor rewrite
    // hashes from the typed read path
    val bucket = pmod(xxhash64(col(s"_${keys.head}")), lit(snap.numBuckets)).cast("int")
    val origById = snap.schemas(0).map(f => f.id -> f.name).toMap
    def nullAs(ddl: String, name: String) =
      lit(null).cast(org.apache.spark.sql.types.DataType.fromDDL(ddl)).as(name)
    val dataCols = snap.currentSchema.map { f =>
      origById.get(f.id) match {
        case Some(orig) if keys.contains(orig) => col(s"_$orig").as(f.name)
        // provenance metadata (reference's _planetscale_metadata analogue):
        // position/sequence of the winning event + extraction timestamp
        case Some("_graft_vgtid")        => col("vgtid").as(f.name)
        case Some("_graft_seq")          => col("event_seq").as(f.name)
        case Some("_graft_extracted_at") => current_timestamp().as(f.name)
        case Some(orig) =>
          // wire-typed stream: reference parseValue normalization + typed
          // landing cast, fused into the staging projection
          val landed = conf.wireSpec match {
            case Some(ws) => ws.normalizedLanding(orig, col(s"after.$orig"))
            case None     => col(s"after.$orig")
          }
          coalesce(landed, nullAs(f.dataType, f.name)).as(f.name)
        case None => nullAs(f.dataType, f.name)
      }
    }
    // winner rows carry their provenance (`_s_*`) into the staged write, so
    // cursors/lineage are recovered from the already-written staged parquet
    // — the SOURCE is scanned exactly once per batch
    val staged = deduped.select(dataCols ++ Seq(
      when(col("op") === "delete", lit("d")).otherwise(lit("u")).as("_kind"),
      bucket.as("_bucket")) ++ statsCols: _*)
    // phase timing for the optimization harness (BenchExtra): prints only
    // when SPARK_GRAFT_APPLY_TIMING is set, zero cost otherwise
    val timing = sys.env.contains("SPARK_GRAFT_APPLY_TIMING")
    var tPhase = System.nanoTime()
    def phase(name: String): Unit = if (timing) {
      val now = System.nanoTime()
      System.err.println(f"APPLY_PHASE $name ${(now - tPhase) / 1e9}%.2f")
      tPhase = now
    }
    // staged write is eager — once it returns, the dedup plan is fully
    // consumed and its winner-position cache/Bloom broadcast can go
    val stage =
      try table.stageWrite(staged.repartition(col("_bucket")))
      finally cleanupDedup()
    phase("stage_write")
    try {
      val affected = table.stagedBuckets(stage)

      // --- ONE column-pruned read of the staged winners yields the per-kind
      // row counts AND the per-shard cursors/stats (previously three jobs:
      // two footer counts + a stats aggregation). In parity mode the shard
      // stats come from a re-scan of the raw batch instead, so dropped
      // deletes still advance positions; evolution tracking stays at the
      // base version there — parity mode models the reference's After-only
      // comparison, not live schema changes. ---
      var maxWireSv = 1
      var upsertCount = 0L
      var deleteCount = 0L
      val stagedRows = table.stagedAllDf(spark, stage, Some(staged.schema)) match {
        case None => Array.empty[org.apache.spark.sql.Row]
        case Some(all) => statsFromStaged(all).collect()
      }
      stagedRows.foreach { r =>
        upsertCount += r.getLong(8)
        deleteCount += r.getLong(9)
      }
      phase("staged_stats")
      val stats: Map[String, ShardStats] =
        if (conf.parityMode) statsFromEvents(events, prevState, streamName)
        else stagedRows.map { r =>
          maxWireSv = math.max(maxWireSv, r.getInt(7))
          statsFromRow(r.getString(0), r.getString(1), r.getString(2), r.getInt(3),
            Option(r.getString(4)), Option(r.getString(5)), r.getLong(6), prevState,
            streamName)
        }.toMap
      val cursors = stats.map { case (s, st) => s -> st.cursor }

      // --- prune overwritten/deleted keys out of existing files (only the
      // affected buckets; anti-join against the column-pruned staged keys) ---
      // merge key = fields id 1..k (current names survive renames)
      val keyNames = (1 to keys.length).map(id =>
        snap.currentSchema.find(_.id == id).get.name)
      val oldFiles = table.filesInBuckets(snap, affected)
      val survivorFiles =
        if (oldFiles.isEmpty) Nil
        else {
          val old = table.readFiles(snap, oldFiles)
          val survivors = old
            .join(table.stagedKeys(spark, stage, keyNames), keyNames, "left_anti")
            .withColumn("_bucket",
              pmod(xxhash64(col(keyNames.head)), lit(snap.numBuckets)).cast("int"))
          // hash-repartition on _bucket alone: file count per commit is
          // O(buckets), independent of parallelism
          table.writeDataFiles(survivors.repartition(col("_bucket")), snap.schemaVersion)
        }
      phase("survivors")
      val newFiles = table.adoptStagedUpserts(stage, snap.schemaVersion) ++ survivorFiles
      phase("adopt")

      // --- transactional cursor + lineage commit ---
      val merged = cursors.values.foldLeft(prevState) { (st, c) =>
        val stateKey = s"${c.keyspace}:$streamName"
        // never move a cursor backwards (containment order, not lexicographic;
        // blank positions never compare after — reference positionAfter
        // guard), and never REPLACE a valid cursor with a blank one (a batch
        // whose winners carry no position must not regress the shard)
        val keep = st.cursorFor(stateKey, c.shard) match {
          case Some(old) if c.position.isEmpty ||
            VGtid.positionAfter(old.position, c.position) => old
          case _ => c
        }
        st.updated(stateKey, keep)
      }
      // lineage carries the per-shard stats so a crash between this commit
      // and the caller's metrics append can be healed: a replay-skip
      // reconstructs the batch's metrics rows from here (exactly-once
      // metrics even across that window). `version` is the version this
      // commit lands as (single writer — nothing commits in between).
      val lineage = lineageJson(batchId, affected.size, upsertCount, deleteCount,
        (System.nanoTime() - tStart) / 1000000L, snap.version + 1, stats)
      // bounded lineage: retain the trailing window only — the summary map
      // (rewritten every commit) must not grow O(batches) over a stream's
      // lifetime. The metrics sidecar is the durable per-batch record.
      val stale = snap.summary.keysIterator.filter { k =>
        k.startsWith("lineage:b") &&
          k.stripPrefix("lineage:b").toLongOption.exists(_ <= batchId - lineageKeep)
      }.toSet
      // the ANNOUNCED wire schema version rides the batch commit itself
      // (monotone max): the streaming driver's evolution trigger is
      // re-derivable from committed state alone, so a crash anywhere
      // between this commit and the evolution commits can always heal —
      // even when the bump batch is the stream's last and replays as a
      // skip (or never replays because the checkpoint advanced)
      val announcedPrev = snap.summary.get("wire_schema_announced")
        .map(_.toInt).getOrElse(1)
      val announce: Map[String, String] =
        if (math.max(maxWireSv, announcedPrev) > 1)
          Map("wire_schema_announced" -> math.max(maxWireSv, announcedPrev).toString)
        else Map.empty
      val committed = table.commit(
        replacedBuckets = affected,
        newFiles = newFiles,
        summaryUpdates = Map(
          key -> batchId.toString,
          "cursors" -> merged.toJson,
          s"lineage:b$batchId" -> lineage) ++ announce,
        dropSummaryKeys = stale)
      phase("commit")
      ApplyResult(committed, upsertCount, deleteCount, skipped = false, stats = stats,
        maxSchemaVersion = maxWireSv)
    } finally table.dropStage(stage)
  }

  /** Batch replay driver: applies a full changelog DataFrame in one shot
    * (the `Trigger.AvailableNow` degenerate case) — used by parity tests and
    * the benchmark's throughput measurement.
    */
  def replayAll(
      table: LakeTable,
      stream: DataFrame,
      conf: ApplyConfig = ApplyConfig()): ApplyResult =
    applyBatch(table, stream, batchId = 0L, conf = conf)
}
