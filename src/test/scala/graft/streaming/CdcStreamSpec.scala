package graft.streaming

import graft.SparkSupport
import graft.core.{ChangeEvent, SyncState, VGtid}
import graft.genlog.{ChangelogGen, EventGen, GenConfig}
import graft.laketable.LakeTable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming end-to-end: micro-batched ingest via the DSv2 source, restart
  * from checkpoint (kill-and-resume), and exactly-once — mirroring the
  * reference's peek / sync / resume-from-state tests
  * (`planetscale_edge_database_test.go:25-157,889-1268,2506-2891`).
  */
class CdcStreamSpec extends AnyFunSuite with SparkSupport {

  private def digest(df: DataFrame): DataFrame =
    df.select(col("repo"), col("path"), sha2(col("content"), 256).as("sha"))

  private def assertParity(t: LakeTable, want: DataFrame): Unit = {
    val got = digest(t.read())
    val w = digest(want)
    assert(got.exceptAll(w).isEmpty && w.exceptAll(got).isEmpty && got.count() == w.count())
  }

  test("micro-batched availableNow run reaches oracle; cursors land in snapshot") {
    val c = GenConfig(numEvents = 10000L, numShards = 4, numRepos = 40, pathsPerRepo = 25,
      copyRows = 1000L)
    val base = tmpDir("stream")
    val t = new LakeTable(s"$base/t", spark)
    t.create(ChangeEvent.rowSchema, numBuckets = 8)
    val rc = CdcStream.RunConfig(c, s"$base/t", s"$base/cp",
      maxEventsPerTrigger = Some(3000L))
    val batches = CdcStream.runAvailableNow(spark, rc)
    assert(batches > 1, s"expected multiple micro-batches, got $batches")
    assertParity(t, ChangelogGen.expectedFinalState(spark, c))

    // transactional cursors: per-shard positions at the head of the stream
    val st = SyncState.fromJson(t.summaryValue("cursors").get)
    val shards = st.streams(s"${c.keyspace}:repo_content")
    assert(shards.size == c.numShards)
    (0 until c.numShards).foreach { i =>
      val name = ChangelogGen.shardNames(c.numShards)(i)
      val endRank = EventGen.catchupPerShard(i, c) + EventGen.copyRankBase(c)
      assert(VGtid.rank(shards(name).position) == endRank,
        s"shard $name cursor ${shards(name).position} != head rank $endRank")
    }
  }

  test("kill mid-stream and resume from checkpoint: no loss, no duplicates") {
    val c = GenConfig(numEvents = 8000L, numShards = 2, numRepos = 30, pathsPerRepo = 20)
    val base = tmpDir("resume")
    val t = new LakeTable(s"$base/t", spark)
    t.create(ChangeEvent.rowSchema, numBuckets = 4)

    // run 1: the binlog "only has" the first 2500 rows per shard (simulated
    // kill: the stream drains to that head and stops)
    val rc1 = CdcStream.RunConfig(c, s"$base/t", s"$base/cp",
      maxEventsPerTrigger = Some(1000L), endSeq = Some(2500L))
    CdcStream.runAvailableNow(spark, rc1)
    val midVersion = t.currentVersion.get
    assert(midVersion > 0)

    // run 2: same checkpoint, full head now visible → resumes, not restarts
    val rc2 = rc1.copy(endSeq = None)
    CdcStream.runAvailableNow(spark, rc2)
    assertParity(t, ChangelogGen.expectedFinalState(spark, c))

    // run 3: nothing new at the head → peek early-exit, zero new batches
    // (reference TestRead_CanEarlyExitIfNoNewVGtidInPeek)
    val v = t.currentVersion.get
    val applied = CdcStream.runAvailableNow(spark, rc2)
    assert(applied == 0L, s"expected early exit, applied $applied batches")
    assert(t.currentVersion.contains(v))
  }

  test("metrics table: one row per (batch, shard) with vgtid range + rows") {
    val c = GenConfig(numEvents = 4000L, numShards = 2, numRepos = 20, pathsPerRepo = 10)
    val base = tmpDir("metrics")
    val t = new LakeTable(s"$base/t", spark)
    t.create(ChangeEvent.rowSchema, numBuckets = 4)
    CdcStream.runAvailableNow(spark, CdcStream.RunConfig(c, s"$base/t", s"$base/cp",
      maxEventsPerTrigger = Some(1500L)))
    val m = CdcStream.readMetrics(spark, s"$base/t")
    assert(m.columns.toSet == Set("batch_id", "keyspace", "shard", "vgtid_start",
      "vgtid_end", "rows", "wall_ms", "batch_events_per_sec", "committed_version"))
    // every shard reported in every non-empty batch; rows sum to the stream
    assert(m.select(sum(col("rows"))).head().getLong(0) == c.numEvents)
    assert(m.select(countDistinct(col("batch_id"))).head().getLong(0) > 1)
    assert(m.filter(col("vgtid_end").startsWith("MySQL56/")).count() == m.count())
  }

  test("batch scan of the source equals the batch generator (same offsets)") {
    val c = GenConfig(numEvents = 5000L, numShards = 4, numRepos = 20, pathsPerRepo = 10,
      copyRows = 400L)
    val viaSource = spark.read.format("graft-changelog")
      .options(CdcStream.sourceOptions(CdcStream.RunConfig(c, "", "")))
      .load()
    val viaGen = ChangelogGen.fullStream(spark, c)
    assert(viaSource.count() == viaGen.count())
    val cols = viaSource.columns.filterNot(_ == "last_pk").map(col).toSeq
    assert(viaSource.select(cols: _*).exceptAll(viaGen.select(cols: _*)).isEmpty)
  }
}
