package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => T}
object MinhashTime {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T2](l: String)(f: => T2): T2 = { val t0=System.nanoTime(); val r=f; println(f"T $l: ${(System.nanoTime()-t0)/1e9}%.1f s"); r }
    val dir = "/root/testdata/sf0.1"
    val docs = spark.read.parquet(s"$dir/documents.parquet").select(col("doc_id"), col("text"))
    val planted = docs.unionByName(docs.select((col("doc_id")+1000000L).as("doc_id"),
      concat_ws(" ", slice(split(trim(col("text")), "\\s+"), lit(1),
        greatest(size(split(trim(col("text")), "\\s+")) - 2, lit(1)))).as("text")))
    val withSh = planted.withColumn("sh", T.shingles(col("text"), 20)).cache()
    time("shingles+cache"){ println("  docs=" + withSh.count()) }
    time("avg shingle size"){ println("  " + withSh.select(avg(size(col("sh")))).head()) }
    val sig = withSh.withColumn("band", explode(T.lshBandKeys(T.minhashSignature(col("sh"), 32), 4, 8)))
      .select(col("doc_id"), col("band"))
    time("sig+explode"){ println("  bands=" + sig.count()) }
    val cand = sig.select(col("band"), col("doc_id").as("a_id"))
      .join(sig.select(col("band"), col("doc_id").as("b_id")), Seq("band"))
      .filter(col("a_id") < col("b_id")).dropDuplicates("a_id","b_id").cache()
    time("candidates"){ println("  cand=" + cand.count()) }
    val bySide = broadcast(withSh.select(col("doc_id"), col("sh")))
    val out = cand.join(bySide.select(col("doc_id").as("a_id"), col("sh").as("a_sh")), Seq("a_id"))
      .join(bySide.select(col("doc_id").as("b_id"), col("sh").as("b_sh")), Seq("b_id"))
      .select(col("a_id"), col("b_id"), T.jaccardPermille(col("a_sh"), col("b_sh")).as("j"))
      .filter(col("j") >= 700)
    time("jaccard-verify"){ println("  out=" + out.count()) }
    spark.stop()
  }
}
