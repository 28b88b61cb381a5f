package graft.tools
import graft.apply.CdcApply
import graft.core.ChangeEvent
import graft.genlog.{ChangelogGen, GenConfig}
import graft.laketable.LakeTable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ProfileReplay {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("CPUS", "32")
    val events = sys.env.getOrElse("EVENTS", "2000000").toLong
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.local.dir", sys.env.getOrElse("SPARK_LOCAL_DIR_OVERRIDE", "/dev/shm/spark-local"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val c = GenConfig(numEvents = events, numShards = 16, numRepos = 2000,
      pathsPerRepo = 100, copyRows = events / 10, contentBlocks = 4)
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PHASE $label: ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    time("warmup-tiny") {
      val root = java.nio.file.Files.createTempDirectory("p0").toString + "/t"
      val t = new LakeTable(root, spark); t.create(ChangeEvent.rowSchema, 4)
      CdcApply.replayAll(t, ChangelogGen.fullStream(spark, c.copy(numEvents=20000, copyRows=2000))); t.drop()
    }
    time("gen-count") { println("  rows=" + ChangelogGen.fullStream(spark, c).count()) }
    time("gen-write-parquet") {
      ChangelogGen.fullStream(spark, c).write.mode("overwrite").parquet("/tmp/prof-changelog")
    }
    time("dedup-only") {
      println("  deduped=" + CdcApply.dedupLww(ChangelogGen.fullStream(spark, c)).count())
    }
    val root = java.nio.file.Files.createTempDirectory("prof").toString + "/t"
    val t = new LakeTable(root, spark)
    t.create(ChangeEvent.rowSchema, 64)
    time("full-replay") {
      CdcApply.replayAll(t, ChangelogGen.fullStream(spark, c))
    }
    println("  final rows=" + t.read().count())
    t.drop()
    spark.stop()
  }
}
