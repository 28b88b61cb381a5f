package graft.tools
import graft.core.ChangeEvent
import graft.genlog.{ChangelogGen, GenConfig}
import graft.laketable.LakeTable
import graft.streaming.CdcStream
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Manual drive of the streaming CDC surface (used by /verify). */
object DriveStream {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = java.nio.file.Files.createTempDirectory("dstream").toString
    val c = GenConfig(numEvents = 20000L, numShards = 4, copyRows = 2000L)
    val t = new LakeTable(s"$base/t", spark)
    t.create(ChangeEvent.rowSchema, numBuckets = 8)
    val rc = CdcStream.RunConfig(c, s"$base/t", s"$base/cp", maxEventsPerTrigger = Some(5000L))
    val n = CdcStream.runAvailableNow(spark, rc)
    val got = t.read().select(col("repo"), col("path"), sha2(col("content"),256).as("sha"))
    val want = ChangelogGen.expectedFinalState(spark, c).select(col("repo"), col("path"), sha2(col("content"),256).as("sha"))
    println(s"BATCHES=$n PARITY=${got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty} ROWS=${got.count()}")
    println("CURSORS=" + t.summaryValue("cursors").map(_.take(150)).getOrElse("MISSING"))
    // probe: immediate re-run on same checkpoint → early exit, no new version
    val v = t.currentVersion.get
    val n2 = CdcStream.runAvailableNow(spark, rc)
    println(s"PROBE_EARLY_EXIT=${n2 == 0 && t.currentVersion.contains(v)}")
    // probe: bogus option
    try { spark.read.format("graft-changelog").option("numShards", "abc").load().count(); println("PROBE_BADOPT=no-error") }
    catch { case e: Throwable => println("PROBE_BADOPT=" + e.getClass.getSimpleName) }
    spark.stop()
  }
}
