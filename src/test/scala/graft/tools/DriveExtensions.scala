package graft.tools

/** Proves the `spark.sql.extensions=graft.functions.GraftExtensions` path:
  * a fresh session built with the extension exposes the graft SQL functions
  * without any explicit register call.
  */
object DriveExtensions {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]").appName("graft-ext")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val r = spark.sql(
        "SELECT vgtid_rank('MySQL56/0d5afdd6-54a0-11eb-936d-0a8939501751:1-7')")
        .head().getLong(0)
      require(r == 7L, s"vgtid_rank via extensions returned $r")
      println("""{"extensions":"graft.functions.GraftExtensions","vgtid_rank":7}""")
      println("DriveExtensions OK")
    } finally spark.stop()
  }
}
