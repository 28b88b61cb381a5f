package graft.tools
import graft.apply.CdcApply
import graft.genlog.{ChangelogGen, GenConfig}
import org.apache.spark.sql.SparkSession
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val c = GenConfig(numEvents = 1000L, numShards = 2)
    val plan = CdcApply.dedupLww(ChangelogGen.changelog(spark, c)).queryExecution.executedPlan.toString
    println("AGG_NODES:" + plan.linesIterator.filter(l => l.contains("Aggregate")).map(_.trim.take(90)).mkString(" || "))
    spark.stop()
  }
}
