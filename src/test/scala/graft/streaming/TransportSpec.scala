package graft.streaming

import graft.SparkSupport
import graft.core.ChangeEvent
import graft.genlog.{ChangelogGen, GenConfig}
import graft.laketable.LakeTable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** A custom transport that a test (or a real deployment) plugs in through
  * the `transportClass` option — the engine-side analogue of the reference's
  * mocked `VitessClient` (`cmd/internal/mock_types.go:63-116`). Delegates to
  * the synthetic closed form and records every open so the spec can prove
  * the sync loop consumed events through the seam, not around it.
  */
class RecordingTransport(c: GenConfig) extends ShardEventTransport {
  private val inner = new SyntheticTransport(c)
  override def head(shardIdx: Int): Long = {
    RecordingTransport.peeks.incrementAndGet()
    inner.head(shardIdx)
  }
  override def events(shardIdx: Int, from: Long, to: Long): Iterator[ChangeEvent] = {
    RecordingTransport.opens.incrementAndGet()
    inner.events(shardIdx, from, to)
  }
}

object RecordingTransport {
  val peeks = new java.util.concurrent.atomic.AtomicInteger(0)
  val opens = new java.util.concurrent.atomic.AtomicInteger(0)
}

/** The transport seam: event supply is an interface the reader factory and
  * offset planner consume — a different implementation drops in via ONE
  * source option and the whole sync pipeline (offsets, apply, cursors,
  * exactly-once) runs through it unchanged.
  */
class TransportSpec extends AnyFunSuite with SparkSupport {

  private def digest(df: DataFrame): DataFrame =
    df.select(col("repo"), col("path"), sha2(col("content"), 256).as("sha"))

  test("a custom ShardEventTransport plugs in via transportClass: the sync " +
    "loop peeks and reads ONLY through the seam, and reaches parity") {
    val c = GenConfig(numEvents = 6000L, numShards = 2, numRepos = 20,
      pathsPerRepo = 10, copyRows = 500L)
    val base = tmpDir("transport")
    val t = new LakeTable(s"$base/t", spark)
    t.create(ChangeEvent.rowSchema, numBuckets = 4)
    RecordingTransport.peeks.set(0)
    RecordingTransport.opens.set(0)
    val rc = CdcStream.RunConfig(c, s"$base/t", s"$base/cp",
      maxEventsPerTrigger = Some(2000L),
      transportClass = Some(classOf[RecordingTransport].getName))
    val batches = CdcStream.runAvailableNow(spark, rc)
    assert(batches > 1)
    // the driver peeked heads and the executors opened event ranges through
    // the custom impl (local[*] = same JVM, so the counters are visible)
    assert(RecordingTransport.peeks.get() > 0, "head() was never routed through the seam")
    assert(RecordingTransport.opens.get() > 0, "events() was never routed through the seam")
    // and the custom transport produced the exact same final state
    val got = digest(t.read())
    val want = digest(ChangelogGen.expectedFinalState(spark, c))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("transportClass validation: a class that is not a ShardEventTransport " +
    "fails loud and non-retryably") {
    val e = intercept[graft.core.GraftValidationException] {
      ShardEventTransport.forConfig(GenConfig(), Some("java.lang.String"))
    }
    assert(e.getMessage.contains("does not implement ShardEventTransport"))
  }

  test("SyntheticTransport serves the closed form: head matches " +
    "totalPerShard and an empty range yields no events") {
    val c = GenConfig(numEvents = 1000L, numShards = 2, numRepos = 10, pathsPerRepo = 5)
    val tr = new SyntheticTransport(c)
    (0 until c.numShards).foreach { s =>
      assert(tr.head(s) == graft.genlog.EventGen.totalPerShard(s, c))
      assert(tr.events(s, 5L, 5L).isEmpty)
      val evs = tr.events(s, 0L, math.min(10L, tr.head(s))).toSeq
      assert(evs.nonEmpty && evs.forall(_.shard == graft.genlog.EventGen.shardName(c.numShards, s)))
      // determinism: re-reading a committed range reproduces it exactly
      assert(evs == tr.events(s, 0L, math.min(10L, tr.head(s))).toSeq)
    }
  }
}
