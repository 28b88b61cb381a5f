package graft.streaming

import graft.SparkSupport
import graft.core.{ChangeEvent, Discover, SyncState, WireColumn, WireTable}
import graft.genlog.{ChangelogGen, GenConfig}
import graft.laketable.LakeTable
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The reference's discover→read loop over an ARBITRARY table: the SAME
  * column-spec file `discover --columns` consumes selects the wire table,
  * the DSv2 source serves wire strings shaped to its columns, and applyBatch
  * lands them normalized + typed with the table's primary key as merge key —
  * closing the gap where `--wire` was hardcoded to the repo_profile spec.
  */
class GenericWireSpec extends AnyFunSuite with SparkSupport {

  private def sakilaTable(name: String): WireTable = {
    val spec = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("src/test/resources/sakila_columns.json")), "UTF-8")
    WireTable.from(Discover.parseColumnSpec(spec).find(_.name == name).get)
  }

  test("discovered Sakila film table drives a wire ingest: typed landing, " +
    "normalized values, PK merge key, cursors keyed <ks>:film") {
    val wt = sakilaTable("film")
    assert(wt.keys == Seq("film_id"))
    val c = GenConfig(numEvents = 6000L, numShards = 2, numRepos = 20,
      pathsPerRepo = 10, keyspace = "sakila")
    val base = tmpDir("genwire")
    val t = new LakeTable(s"$base/t", spark)
    t.create(ChangeEvent.landingSchemaFor(wt, includeMetadata = false), numBuckets = 4)
    val rc = CdcStream.RunConfig(c, s"$base/t", s"$base/cp",
      maxEventsPerTrigger = Some(2000L), wireTable = Some(wt), streamName = wt.name)
    val batches = CdcStream.runAvailableNow(spark, rc)
    assert(batches > 1)

    // typed landing straight from the MySQL DDL (TypeMap)
    val types = t.read().schema.fields.map(f => f.name -> f.dataType.sql).toMap
    assert(types("film_id") == "BIGINT" && types("rental_rate") == "DECIMAL(4,2)" &&
      types("last_update") == "TIMESTAMP" && types("rating") == "STRING" &&
      types("title") == "STRING")
    // merge key leads the schema (field id 1 = PK)
    assert(t.read().columns.head == "film_id")

    // cardinality parity: the injective key derivation preserves the LWW
    // final state of the underlying (repo, path) identity space
    val expect = ChangelogGen.expectedFinalState(spark, c).count()
    assert(t.read().count() == expect)
    assert(t.read().select("film_id").distinct().count() == expect)

    // normalization INSIDE the ingest: enum indexes map to labels, index 0
    // to "", out-of-range passes through as the original digits
    val ratings = t.read().select("rating").distinct()
      .collect().map(_.getString(0)).toSet
    val allowed = Set("", "G", "PG", "PG-13", "R", "NC-17", "6")
    assert(ratings.nonEmpty && ratings.subsetOf(allowed), s"ratings: $ratings")
    // set bitmask → comma-joined labels drawn from the DDL
    val feats = t.read().select("special_features").filter(col("special_features").rlike(","))
      .limit(5).collect().map(_.getString(0))
    val labels = Set("Trailers", "Commentaries", "Deleted Scenes", "Behind the Scenes")
    assert(feats.nonEmpty && feats.forall(_.split(",").forall(labels.contains)))

    // cursors keyed by the DISCOVERED stream name (reference read.go:108)
    val st = SyncState.fromJson(t.summaryValue("cursors").get)
    assert(st.streams.keySet == Set("sakila:film"))
    assert(st.streams("sakila:film").size == c.numShards)

    // kill-and-resume on the same checkpoint stays generic: replay is a no-op
    val v = t.currentVersion.get
    assert(CdcStream.runAvailableNow(spark, rc) == 0L && t.currentVersion.contains(v))
  }

  test("single STRING-keyed table and composite-keyed table both ingest") {
    val c = GenConfig(numEvents = 2000L, numShards = 2, numRepos = 10,
      pathsPerRepo = 5, keyspace = "ks")
    val base = tmpDir("genwire2")
    // 1-column string key
    val wt1 = WireTable("tags", Seq("tag"), Seq(
      WireColumn("tag", "varchar(64)", "NO"),
      WireColumn("hits", "int(11)"), WireColumn("seen", "datetime")))
    val t1 = new LakeTable(s"$base/t1", spark)
    t1.create(ChangeEvent.landingSchemaFor(wt1, includeMetadata = false), numBuckets = 4)
    CdcStream.runAvailableNow(spark, CdcStream.RunConfig(c, s"$base/t1", s"$base/cp1",
      wireTable = Some(wt1), streamName = wt1.name))
    val expect = ChangelogGen.expectedFinalState(spark, c).count()
    assert(t1.read().count() == expect)
    assert(t1.read().filter(col("tag").rlike("^repo-\\d+/")).count() == expect)

    // composite key out of DDL order: keys are reordered to the front
    val wt2 = WireTable("pairs", Seq("r", "p"), Seq(
      WireColumn("note", "text"), WireColumn("r", "varchar(64)", "NO"),
      WireColumn("p", "varchar(128)", "NO")))
    assert(wt2.orderedColumns.map(_.name) == Seq("r", "p", "note"))
    val t2 = new LakeTable(s"$base/t2", spark)
    t2.create(ChangeEvent.landingSchemaFor(wt2, includeMetadata = false), numBuckets = 4)
    CdcStream.runAvailableNow(spark, CdcStream.RunConfig(c, s"$base/t2", s"$base/cp2",
      wireTable = Some(wt2), streamName = wt2.name))
    assert(t2.read().count() == expect)
    assert(t2.read().columns.toSeq == Seq("r", "p", "note"))
  }

  test("composite NUMERIC key (film_actor shape): per-column typed key values " +
    "stay injective; unsupported key landings fail loud up front") {
    val c = GenConfig(numEvents = 2000L, numShards = 2, numRepos = 10,
      pathsPerRepo = 5, keyspace = "ks")
    val base = tmpDir("genwire3")
    // the most common composite-PK shape: two numeric id columns
    val wt = WireTable("film_actor", Seq("actor_id", "film_id"), Seq(
      WireColumn("actor_id", "smallint(5) unsigned", "NO"),
      WireColumn("film_id", "smallint(5) unsigned", "NO"),
      WireColumn("last_update", "timestamp", "NO")))
    val t = new LakeTable(s"$base/t", spark)
    t.create(ChangeEvent.landingSchemaFor(wt, includeMetadata = false), numBuckets = 4)
    CdcStream.runAvailableNow(spark, CdcStream.RunConfig(c, s"$base/t", s"$base/cp",
      wireTable = Some(wt), streamName = wt.name))
    val expect = ChangelogGen.expectedFinalState(spark, c).count()
    assert(t.read().count() == expect)
    // the (actor_id, film_id) PAIR is injective in the identity space
    assert(t.read().select("actor_id", "film_id").distinct().count() == expect)
    assert(t.read().filter(col("actor_id").isNull || col("film_id").isNull).count() == 0)

    // a tinyint(1) PK lands boolean — every synthetic row would LWW-collapse
    // onto two key values; rejected LOUD at generation, not silently merged
    val bad1 = WireTable("flags", Seq("flag"), Seq(
      WireColumn("flag", "tinyint(1)", "NO"), WireColumn("v", "int(11)")))
    val e1 = intercept[Exception](
      CdcStream.runAvailableNow(spark, CdcStream.RunConfig(c, s"$base/b1", s"$base/bcp1",
        wireTable = Some(bad1), streamName = bad1.name)
        .copy(tableRoot = { val tt = new LakeTable(s"$base/b1", spark)
          tt.create(ChangeEvent.landingSchemaFor(bad1, includeMetadata = false), 2); s"$base/b1" })))
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e1).exists(_.contains("unsupported merge-key column")), s"got $e1")
  }

  test("WireTable JSON round-trips; missing name/type fail with a clear error") {
    val wt = sakilaTable("payment")
    assert(WireTable.fromJson(wt.toJson) == wt)
    val e1 = intercept[IllegalArgumentException](
      Discover.parseColumnSpec("""{"tables":[{"name":"x","columns":[{"type":"int"}]}]}"""))
    assert(e1.getMessage.contains("missing required field 'name'"))
    val e2 = intercept[IllegalArgumentException](
      Discover.parseColumnSpec("""{"tables":[{"name":"x","columns":[{"name":"c"}]}]}"""))
    assert(e2.getMessage.contains("missing required field 'type'"))
  }
}
