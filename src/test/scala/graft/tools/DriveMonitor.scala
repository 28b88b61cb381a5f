package graft.tools
import graft.genlog.GenConfig
import graft.streaming.{CdcStream, StreamMonitor}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger
object DriveMonitor {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions","4").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val c = GenConfig(numEvents = 8000L, numShards = 4)
    val cp = java.nio.file.Files.createTempDirectory("dm").toString
    val stream = spark.readStream.format("graft-changelog")
      .options(CdcStream.sourceOptions(CdcStream.RunConfig(c, "", cp + "/cp", maxEventsPerTrigger = Some(3000L)))).load()
    val q = StreamMonitor.shardRates(stream, 300, 60).writeStream
      .outputMode("append").format("memory").queryName("r")
      .option("checkpointLocation", cp + "/cp").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    spark.sql("SELECT shard, count(*) wins, sum(events) ev FROM r GROUP BY 1 ORDER BY 1").show()
    spark.stop()
  }
}
