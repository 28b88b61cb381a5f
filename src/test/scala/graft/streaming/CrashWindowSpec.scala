package graft.streaming

import graft.SparkSupport
import graft.core.ChangeEvent
import graft.genlog.{ChangelogGen, GenConfig}
import graft.laketable.LakeTable
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** The exactly-once crash window: a failure AFTER the lake-table commit but
  * BEFORE the streaming checkpoint advances means the next run REPLAYS the
  * last micro-batch. Simulated by deleting the checkpoint's newest commit
  * marker (exactly the state Spark leaves behind in that window) — the replay
  * must hit the snapshot's batch-id idempotence gate and be a no-op.
  */
class CrashWindowSpec extends AnyFunSuite with SparkSupport {

  test("replayed last batch after simulated crash is a no-op; parity holds") {
    val c = GenConfig(numEvents = 6000L, numShards = 2, numRepos = 20, pathsPerRepo = 10)
    val base = tmpDir("crash")
    val t = new LakeTable(s"$base/t", spark)
    t.create(ChangeEvent.rowSchema, numBuckets = 4)
    val rc = CdcStream.RunConfig(c, s"$base/t", s"$base/cp",
      maxEventsPerTrigger = Some(2000L))
    CdcStream.runAvailableNow(spark, rc)
    val version = t.currentVersion.get
    val rows = t.read().count()

    // crash window: data+cursors committed, checkpoint commit marker lost
    val commits = Paths.get(s"$base/cp/commits")
    val last = Files.list(commits).toArray.map(_.toString)
      .filterNot(_.endsWith(".crc")).maxBy(p => p.split("/").last.toLong)
    Files.delete(Paths.get(last))
    // also the local-FS checksum shadow, as a real crash would never have
    // written either
    val crc = Paths.get(last).getParent.resolve("." + Paths.get(last).getFileName + ".crc")
    Files.deleteIfExists(crc)

    // restart: Spark replays the last batch; apply must skip it
    CdcStream.runAvailableNow(spark, rc)
    assert(t.currentVersion.contains(version),
      s"replayed batch advanced the table: ${t.currentVersion} vs $version")
    assert(t.read().count() == rows)

    // and the final state still matches the independent oracle
    val digest = (df: org.apache.spark.sql.DataFrame) =>
      df.select(col("repo"), col("path"), sha2(col("content"), 256).as("sha"))
    val got = digest(t.read())
    val want = digest(ChangelogGen.expectedFinalState(spark, c))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("crash between snapshot commit and metrics append: the replay-skip " +
    "backfills the batch's metrics rows from committed lineage — exactly-once " +
    "metrics across the second crash window too") {
    val c = GenConfig(numEvents = 6000L, numShards = 2, numRepos = 20, pathsPerRepo = 10)
    val base = tmpDir("crashm")
    val t = new LakeTable(s"$base/t", spark)
    t.create(ChangeEvent.rowSchema, numBuckets = 4)
    val rc = CdcStream.RunConfig(c, s"$base/t", s"$base/cp",
      maxEventsPerTrigger = Some(2000L))
    CdcStream.runAvailableNow(spark, rc)
    val lastBatch = CdcStream.readMetrics(spark, s"$base/t")
      .agg(max(col("batch_id"))).head.getLong(0)
    val fullMetrics = CdcStream.readMetrics(spark, s"$base/t")
      .orderBy("batch_id", "shard").collect().toSeq

    // crash window #2: snapshot committed (data + cursors + lineage), but the
    // process died before the metrics append AND the checkpoint marker —
    // simulated by deleting the checkpoint marker and the sidecar file(s)
    // holding the last batch's rows
    val commits = Paths.get(s"$base/cp/commits")
    val last = Files.list(commits).toArray.map(_.toString)
      .filterNot(_.endsWith(".crc")).maxBy(p => p.split("/").last.toLong)
    Files.delete(Paths.get(last))
    Files.deleteIfExists(
      Paths.get(last).getParent.resolve("." + Paths.get(last).getFileName + ".crc"))
    val metricsDir = Paths.get(s"$base/t/metrics")
    Files.list(metricsDir).toArray.map(_.asInstanceOf[java.nio.file.Path])
      .filter(_.getFileName.toString.endsWith(".parquet"))
      .foreach { f =>
        val holdsLast = spark.read.parquet(f.toString)
          .filter(col("batch_id") === lastBatch).limit(1).count() > 0
        if (holdsLast) {
          Files.delete(f)
          Files.deleteIfExists(f.getParent.resolve("." + f.getFileName + ".crc"))
        }
      }
    assert(CdcStream.readMetrics(spark, s"$base/t")
      .filter(col("batch_id") === lastBatch).count() == 0, "window setup failed")

    // restart: apply skips the replayed batch, backfill heals the sidecar
    CdcStream.runAvailableNow(spark, rc)
    val healed = CdcStream.readMetrics(spark, s"$base/t")
      .orderBy("batch_id", "shard").collect().toSeq
    assert(healed.map(r => (r.getLong(0), r.getString(2))) ==
      fullMetrics.map(r => (r.getLong(0), r.getString(2))),
      "every (batch, shard) present exactly once after heal")
    val backfilled = healed.filter(_.getLong(0) == lastBatch)
    val original = fullMetrics.filter(_.getLong(0) == lastBatch)
    // lineage-derived rows carry the same shard/vgtid-range/rows/version facts
    assert(backfilled.map(r => (r.getString(1), r.getString(2), r.getString(3),
        r.getString(4), r.getLong(5), r.getLong(8))) ==
      original.map(r => (r.getString(1), r.getString(2), r.getString(3),
        r.getString(4), r.getLong(5), r.getLong(8))))
  }

  test("crash DURING the first-ever metrics append (dir created, no data " +
    "file committed): the footerless dir is treated as absent and the " +
    "backfill heals it instead of wedging on unable-to-infer-schema") {
    val c = GenConfig(numEvents = 4000L, numShards = 2, numRepos = 20, pathsPerRepo = 10)
    val base = tmpDir("crashfooterless")
    val t = new LakeTable(s"$base/t", spark)
    t.create(ChangeEvent.rowSchema, numBuckets = 4)
    val rc = CdcStream.RunConfig(c, s"$base/t", s"$base/cp",
      maxEventsPerTrigger = Some(2000L))
    CdcStream.runAvailableNow(spark, rc)
    val lastBatch = CdcStream.readMetrics(spark, s"$base/t")
      .agg(max(col("batch_id"))).head.getLong(0)

    // simulate: the parquet writer created the dir (maybe scaffolding too)
    // but died before committing ANY data file footer into it
    val metricsDir = Paths.get(s"$base/t/metrics")
    Files.list(metricsDir).toArray.map(_.asInstanceOf[java.nio.file.Path])
      .foreach(p => Files.deleteIfExists(p))
    Files.createDirectories(metricsDir.resolve("_temporary"))
    // spark.read.parquet on this dir would throw AnalysisException — the
    // probe must classify it as ABSENT and write, not fail every retry
    CdcStream.backfillMetrics(spark, s"$base/t", t, lastBatch)
    assert(CdcStream.readMetrics(spark, s"$base/t")
      .filter(col("batch_id") === lastBatch).count() > 0,
      "footerless dir was not healed")
  }
}
