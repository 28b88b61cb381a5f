package graft.tools
import graft.SparkEntry
import graft.apply.CdcApply
import graft.core.ChangeEvent
import graft.genlog.{ChangelogGen, GenConfig}
import graft.laketable.LakeTable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Plan hygiene audit: pushdown, pruning, broadcast, codegen spans. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    def audit(name: String, df: org.apache.spark.sql.DataFrame, checks: (String, String => Boolean)*): Unit = {
      df.collect() // force THIS plan to final AQE state (codegen markers appear there)
      val p = df.queryExecution.executedPlan.toString
      val f = df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
      checks.foreach { case (label, fn) =>
        println(s"$name :: $label = ${if (fn(f) || fn(p)) "PASS" else "FAIL"}")
      }
    }
    // 1. filter + projection pushdown to parquet
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .filter(col("l_quantity") < 24).select("l_orderkey", "l_quantity")
    audit("filter-pushdown", li,
      ("PushedFilters has LessThan", s => s.contains("LessThan(l_quantity,24.0)")),
      ("ReadSchema pruned to 2 cols", s => s.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>")))
    // 2. broadcast join for small dims
    audit("broadcast-join", SparkEntry.queries("q2_join_regions")(spark, dir),
      ("BroadcastHashJoin present", _.contains("BroadcastHashJoin")))
    // 3. whole-stage codegen over q6
    audit("codegen", SparkEntry.queries("q6_filter")(spark, dir),
      ("WholeStageCodegen present", s => s.contains("WholeStageCodegen") || s.contains("codegen id") || s.contains("*(1)")))
    // 4. lake table read: column pruning through the field-id projection
    val c = GenConfig(numEvents = 3000L, numShards = 2, numRepos = 10, pathsPerRepo = 5)
    val root = java.nio.file.Files.createTempDirectory("audit").toString + "/t"
    val t = new LakeTable(root, spark); t.create(ChangeEvent.rowSchema, 4)
    CdcApply.replayAll(t, ChangelogGen.changelog(spark, c))
    val lake = t.read().filter(col("repo") === "repo-0001").select("repo", "path")
    audit("laketable-read", lake,
      ("pushdown of repo filter", s => s.contains("PushedFilters") && s.contains("EqualTo(repo,repo-0001)")),
      ("pruned ReadSchema (no content)", s => !s.contains("content") || s.contains("ReadSchema: struct<repo:string,path:string>")))
    // 5. dedup partial aggregation: LwwMaxBy under ObjectHashAggregate with
    //    map-side partial combine before the exchange (hash probes, no sort)
    val dd = CdcApply.dedupLww(ChangelogGen.changelog(spark, c))
    audit("dedup-combine", dd,
      ("ObjectHashAggregate", _.contains("ObjectHashAggregate")),
      ("partial lwwmaxby before exchange", s => {
        val l = s.toLowerCase
        l.contains("partial_lwwmaxby") || l.contains("partial lwwmaxby(") ||
          (l.contains("lwwmaxby") && l.contains("partial"))
      }))
    println(dd.queryExecution.executedPlan.toString.linesIterator.map(_.take(100)).take(12).mkString("\n"))

    // 6. NO partitionless WindowExec anywhere in the driver queries — a
    //    global window moves the whole table to one partition (scale killer)
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        val bad = fn(spark, dir).queryExecution.optimizedPlan.collect {
          case w: LWindow if w.partitionSpec.isEmpty => w
        }
        if (bad.nonEmpty) Some(name) else None
      } catch { case e: Throwable => println(s"  [window-audit] $name errored: ${e.getMessage}"); None }
    }
    println(s"no-partitionless-window :: all queries = ${if (offenders.isEmpty) "PASS" else s"FAIL ${offenders.mkString(",")}"}")

    // 7. dedup_minhash never broadcasts the corpus (shuffle joins only)
    audit("minhash-no-broadcast", SparkEntry.queries("dedup_minhash")(spark, dir),
      ("no BroadcastExchange in plan", s => !s.contains("BroadcastExchange")))
    spark.stop()
  }
}
