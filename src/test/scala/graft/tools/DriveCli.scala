package graft.tools

/** CLI-surface drive: exercises `graft.Main`'s verbs end-to-end in one JVM
  * the way a connector runtime would — spec, check, read with
  * `--include_metadata`, then discover against the resulting table.
  * Run: `sbt -batch "Test/runMain graft.tools.DriveCli"`.
  */
object DriveCli {
  def main(args: Array[String]): Unit = {
    val base = java.nio.file.Files.createTempDirectory("graft-cli").toString
    graft.Main.main(Array("spec"))
    graft.Main.main(Array("check", "--table", s"$base/t"))
    graft.Main.main(Array("read",
      "--table", s"$base/t", "--checkpoint", s"$base/cp",
      "--events", "2000", "--shards", "2", "--repos", "10", "--paths", "5",
      "--include_metadata", "true"))
    graft.Main.main(Array("discover", "--table", s"$base/t"))
    // arbitrary-table discovery from a column-spec file (golden-tested in
    // DiscoverSpec; here just proving the CLI path)
    graft.Main.main(Array("discover", "--columns", "src/test/resources/sakila_columns.json",
      "--keyspace", "sakila", "--shards", "2"))
    // wire-typed read: source serves raw MySQL wire strings, table lands
    // the normalized typed repo_profile schema
    graft.Main.main(Array("read",
      "--table", s"$base/w", "--checkpoint", s"$base/wcp",
      "--events", "2000", "--shards", "2", "--repos", "10", "--paths", "5",
      "--wire", "true"))
    // discover→read ROUND TRIP: the same column-spec file discover consumed
    // drives an arbitrary-table wire ingest (--wire_columns + --wire_table)
    graft.Main.main(Array("read",
      "--table", s"$base/film", "--checkpoint", s"$base/filmcp",
      "--events", "2000", "--shards", "2", "--repos", "10", "--paths", "5",
      "--keyspace", "sakila",
      "--wire_columns", "src/test/resources/sakila_columns.json",
      "--wire_table", "film"))
    // independent session: prove the _graft_* columns landed populated
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").appName("graft-cli-verify")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    try {
      val df = new graft.laketable.LakeTable(s"$base/t", spark).read()
      val metaCols = df.columns.filter(_.startsWith("_graft_")).toSeq
      val populated = df.filter(
        org.apache.spark.sql.functions.col("_graft_vgtid").startsWith("MySQL56/")).count()
      println(s"""{"cli_meta_cols":"${metaCols.mkString(",")}","rows":${df.count()},"meta_populated":$populated}""")
      require(metaCols == Seq("_graft_vgtid", "_graft_seq", "_graft_extracted_at"))
      require(populated == df.count() && populated > 0)
      val wire = new graft.laketable.LakeTable(s"$base/w", spark).read()
      val wireTypes = wire.schema.fields.map(f => f.name -> f.dataType.sql).toMap
      require(wireTypes("verified") == "BOOLEAN" && wireTypes("stars") == "BIGINT",
        s"wire read did not land typed: $wireTypes")
      println(s"""{"wire_rows":${wire.count()},"wire_types_ok":true}""")
      val film = new graft.laketable.LakeTable(s"$base/film", spark)
      val filmTypes = film.read().schema.fields.map(f => f.name -> f.dataType.sql).toMap
      require(filmTypes("film_id") == "BIGINT" &&
        filmTypes("rental_rate") == "DECIMAL(4,2)" && filmTypes("rating") == "STRING",
        s"film wire read did not land typed: $filmTypes")
      require(film.summaryValue("cursors").exists(_.contains("sakila:film")),
        "film cursors not keyed sakila:film")
      println(s"""{"film_rows":${film.read().count()},"film_types_ok":true}""")
      println("DriveCli OK")
    } finally spark.stop()
  }
}
