package graft.tools
import graft.apply.CdcApply
import graft.core.ChangeEvent
import graft.genlog.{ChangelogGen, GenConfig}
import graft.laketable.LakeTable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Manual end-to-end drive of the CDC pipeline (used by /verify). */
object DriveReplay {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = java.nio.file.Files.createTempDirectory("drive").toString
    val c = GenConfig(numEvents = 30000L, numShards = 4, copyRows = 2000L)
    val t = new LakeTable(dir + "/t", spark)
    t.create(ChangeEvent.rowSchema, numBuckets = 8)
    val t0 = System.nanoTime()
    val res = CdcApply.replayAll(t, ChangelogGen.fullStream(spark, c))
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"APPLIED upserts=${res.upserts} deletes=${res.deletes} version=${res.snapshot.version} in $secs%.1fs (${(c.numEvents + c.copyRows) / secs}%.0f ev/s)")
    val got = t.read().select(col("repo"), col("path"), sha2(col("content"), 256).as("sha"))
    val want = ChangelogGen.expectedFinalState(spark, c)
      .select(col("repo"), col("path"), sha2(col("content"), 256).as("sha"))
    println("PARITY=" + (got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty) + " rows=" + got.count())
    // probe: replay same batch id again → must be a no-op at same version
    val v = t.currentVersion.get
    val again = CdcApply.replayAll(t, ChangelogGen.fullStream(spark, c))
    println("PROBE_IDEMPOTENT=" + (again.skipped && t.currentVersion.contains(v)))
    // probe: evolve schema then read old data through the rename
    t.evolveSchema(Map("content" -> "body"), Seq("stars" -> "INT"))
    println("PROBE_EVOLVE_READ=" + (t.read().filter(col("body").isNotNull).count() == got.count()))
    println("CURSORS=" + t.summaryValue("cursors").map(_.take(120)).getOrElse("MISSING"))
    spark.stop()
  }
}
