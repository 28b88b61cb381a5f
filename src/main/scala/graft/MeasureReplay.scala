package graft

import graft.apply.CdcApply
import graft.core.ChangeEvent
import graft.genlog.{ChangelogGen, GenConfig}
import graft.laketable.LakeTable
import org.apache.spark.sql.SparkSession

/** One isolated CDC-replay throughput measurement: fresh JVM, local[cpus],
  * warm-up replay (JIT/codegen), then `reps` measured replays of the same
  * deterministic input; prints per-rep seconds and a BEST line. Spawned by
  * [[ScalingBench]] so the N-core and 4N-core runs don't share JVM state.
  */
object MeasureReplay {

  def session(cpus: Int): SparkSession = SparkSession.builder()
    .master(s"local[$cpus]")
    .config("spark.sql.shuffle.partitions", cpus.toString)
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.autoBroadcastJoinThreshold", "128m")
    .config("spark.local.dir",
      sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/spark-local"))
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  def replayOnce(spark: SparkSession, c: GenConfig, buckets: Int): Double = {
    val root = java.nio.file.Files.createTempDirectory("graft-measure").toString + "/t"
    val table = new LakeTable(root, spark)
    table.create(ChangeEvent.rowSchema, buckets)
    val t0 = System.nanoTime()
    CdcApply.replayAll(table, ChangelogGen.fullStream(spark, c))
    val secs = (System.nanoTime() - t0) / 1e9
    table.drop()
    secs
  }

  def main(args: Array[String]): Unit = {
    val cpus = args(0).toInt
    val events = args(1).toLong
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = session(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    val c = GenConfig(numEvents = events, numShards = 16, numRepos = 2000,
      pathsPerRepo = 100, copyRows = events / 10, contentBlocks = 4)
    println(f"CANARY ${HostCanary.best()}%.3f") // host-speed stamp (pre)
    replayOnce(spark, c.copy(numEvents = 50000L, copyRows = 5000L), 16) // warm-up
    val times = (1 to reps).map { i =>
      val s = replayOnce(spark, c, 64)
      println(f"REP $i: $s%.2f s")
      s
    }
    println(f"CANARY ${HostCanary.best()}%.3f") // host-speed stamp (post)
    val total = events + graft.genlog.EventGen.copyPerShard(c) * c.numShards
    println(f"BEST ${times.min}%.4f $total")
    spark.stop()
  }
}
