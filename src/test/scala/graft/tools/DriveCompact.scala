package graft.tools
import graft.core.ChangeEvent
import graft.genlog.GenConfig
import graft.laketable.LakeTable
import graft.streaming.CdcStream
import org.apache.spark.sql.SparkSession
object DriveCompact {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions","4").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = java.nio.file.Files.createTempDirectory("dcomp").toString
    val t = new LakeTable(s"$base/t", spark); t.create(ChangeEvent.rowSchema, 4)
    val c = GenConfig(numEvents = 8000L, numShards = 2, numRepos = 20, pathsPerRepo = 10)
    CdcStream.runAvailableNow(spark, CdcStream.RunConfig(c, s"$base/t", s"$base/cp",
      maxEventsPerTrigger = Some(1000L), compactEvery = Some(4), maxFilesPerBucket = 3))
    val snap = t.currentSnapshot.get
    val perBucket = t.allFiles(snap).groupBy(_.bucket).map(_._2.size)
    println(s"FILES total=${snap.fileCount} maxPerBucket=${perBucket.max} version=${snap.version} rows=${t.read().count()}")
    t.expireSnapshots(keepLast = 2)
    println("EXPIRED ok currentRows=" + t.read().count())
    spark.stop()
  }
}
