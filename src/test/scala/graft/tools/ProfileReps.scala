package graft.tools
import graft.apply.CdcApply
import graft.core.ChangeEvent
import graft.genlog.{ChangelogGen, GenConfig}
import graft.laketable.LakeTable
import org.apache.spark.sql.SparkSession
object ProfileReps {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("CPUS", "32")
    val events = sys.env.getOrElse("EVENTS", "10000000").toLong
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.local.dir", "/dev/shm/spark-local")
      .config("spark.sql.autoBroadcastJoinThreshold", "128m")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val c = GenConfig(numEvents = events, numShards = 16, numRepos = 2000,
      pathsPerRepo = 100, copyRows = events / 10, contentBlocks = 4)
    // warmup
    locally { val root = java.nio.file.Files.createTempDirectory("pw").toString + "/t"
      val t = new LakeTable(root, spark); t.create(ChangeEvent.rowSchema, 4)
      CdcApply.replayAll(t, ChangelogGen.fullStream(spark, c.copy(numEvents=20000, copyRows=2000))); t.drop() }
    for (i <- 1 to 3) {
      val root = java.nio.file.Files.createTempDirectory("pr").toString + "/t"
      val t = new LakeTable(root, spark); t.create(ChangeEvent.rowSchema, 64)
      val t0 = System.nanoTime()
      CdcApply.replayAll(t, ChangelogGen.fullStream(spark, c))
      println(f"REP$i: ${(System.nanoTime()-t0)/1e9}%.2f s")
      t.drop()
    }
    spark.stop()
  }
}
