package graft.streaming

import graft.SparkSupport
import graft.genlog.GenConfig
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Watermarked windowed aggregation + flatMapGroupsWithState over the DSv2
  * change stream (streaming category coverage, SURVEY.md §2 Part B).
  */
class StreamMonitorSpec extends AnyFunSuite with SparkSupport {

  test("watermarked windowed per-shard rates over the streaming source") {
    val c = GenConfig(numEvents = 5000L, numShards = 2, numRepos = 20, pathsPerRepo = 10)
    val rc = CdcStream.RunConfig(c, "", tmpDir("mon") + "/cp",
      maxEventsPerTrigger = Some(2000L))
    val stream = spark.readStream.format("graft-changelog")
      .options(CdcStream.sourceOptions(rc)).load()
    val agg = StreamMonitor.shardRates(stream, windowSecs = 600, lateSecs = 60)
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("rates")
      .option("checkpointLocation", rc.checkpoint)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val rates = spark.sql("SELECT * FROM rates")
    // append mode emits only watermark-closed windows; with 2500 events/shard
    // (event clock = 1s/event) and 600s windows, the early windows must close
    assert(rates.count() > 0, "no closed windows emitted")
    assert(rates.select(sum(col("events"))).head().getLong(0) <= c.numEvents)
    assert(rates.filter(col("events") > 600).count() == 0,
      "a 600s window cannot hold more than 600 one-per-second events per shard")
    assert(rates.select(countDistinct(col("shard"))).head().getLong(0) == 2)
  }

  test("stream-stream interval join: deletes correlated with prior writes of the key") {
    val c = GenConfig(numEvents = 6000L, numShards = 2, numRepos = 20, pathsPerRepo = 10,
      deleteRatio = 0.15)
    val rc = CdcStream.RunConfig(c, "", tmpDir("ssj") + "/cp",
      maxEventsPerTrigger = Some(2000L))
    val stream = spark.readStream.format("graft-changelog")
      .options(CdcStream.sourceOptions(rc)).load()
    val joined = StreamMonitor.deleteLatency(stream, horizonSecs = 600, lateSecs = 60)
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("latency")
      .option("checkpointLocation", rc.checkpoint)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val out = spark.sql("SELECT * FROM latency")
    assert(out.count() > 0, "no delete/write correlations emitted")
    // the range bound holds for every emitted pair
    assert(out.filter(col("secs_alive") <= 0 || col("secs_alive") > 600).count() == 0)
    // batch oracle: same join over the batch-generated stream, identical rows
    val batch = graft.genlog.ChangelogGen.changelog(spark, c)
    val want = StreamMonitor.deleteLatency(
      batch.withColumn("dummy", lit(1)).drop("dummy"), 600, 60)
    assert(out.exceptAll(want).isEmpty,
      "streaming join emitted a pair the batch join does not")
  }

  test("flatMapGroupsWithState: per-key version numbers accumulate across batches") {
    import spark.implicits._
    import StreamMonitor.KeyUpdate
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[KeyUpdate](spark)
    input.addData(KeyUpdate("r1", "a", 1L), KeyUpdate("r1", "a", 2L), KeyUpdate("r2", "b", 3L))
    val q = StreamMonitor.keyVersions(input.toDS())
      .writeStream.outputMode("append").format("memory").queryName("versions").start()
    q.processAllAvailable()
    input.addData(KeyUpdate("r1", "a", 9L))
    q.processAllAvailable()
    q.stop()
    val out = spark.sql("SELECT * FROM versions").as[StreamMonitor.KeyVersion]
      .collect().sortBy(v => (v.repo, v.path, v.version_no)).toSeq
    // r1/a seen 3 times total: versions 1,2 then 3 across the second batch
    assert(out.filter(v => v.repo == "r1" && v.path == "a").map(_.version_no) == Seq(1L, 2L, 3L))
    assert(out.filter(v => v.repo == "r1" && v.path == "a").last.last_seq == 9L)
    assert(out.filter(v => v.repo == "r2").map(_.version_no) == Seq(1L))
  }
}
