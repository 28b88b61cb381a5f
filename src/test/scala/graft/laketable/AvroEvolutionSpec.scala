package graft.laketable

import graft.SparkSupport
import graft.apply.CdcApply
import graft.core.ChangeEvent
import graft.genlog.{ChangelogGen, GenConfig}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Avro-driven schema evolution mapped to lake-table column adds/renames
  * (north-star requirement), including rename-vs-add disambiguation via Avro
  * aliases (SURVEY.md §7.4) and CDC apply continuing across the evolution.
  */
class AvroEvolutionSpec extends AnyFunSuite with SparkSupport {

  private val v1 =
    """{"type":"record","name":"repo_content","fields":[
       {"name":"repo","type":"string"},{"name":"path","type":"string"},
       {"name":"commit","type":"string"},{"name":"lang","type":"string"},
       {"name":"content","type":"string"}]}"""

  private val v2 =
    """{"type":"record","name":"repo_content","fields":[
       {"name":"repo","type":"string"},{"name":"path","type":"string"},
       {"name":"commit","type":"string"},{"name":"lang","type":"string"},
       {"name":"body","type":"string","aliases":["content"]},
       {"name":"stars","type":["null","long"]}]}"""

  test("avro diff: alias → rename, no alias → add") {
    val (renames, adds) = AvroSchema.diff(AvroSchema.parse(v1), AvroSchema.parse(v2))
    assert(renames == Map("content" -> "body"))
    assert(adds == Seq("stars" -> "BIGINT"))
  }

  test("avro type mapping and malformed input") {
    assert(AvroSchema.avroTypeToDdl("int") == "INT")
    assert(AvroSchema.avroTypeToDdl("bytes") == "BINARY")
    assertThrows[IllegalArgumentException](AvroSchema.avroTypeToDdl("record"))
    assertThrows[IllegalArgumentException](
      AvroSchema.parse("""{"type":"enum","name":"x"}"""))
  }

  test("CDC apply continues across an Avro evolution (rename survives merge)") {
    val c = GenConfig(numEvents = 6000L, numShards = 2, numRepos = 20, pathsPerRepo = 10)
    val t = new LakeTable(tmpDir("avro") + "/t", spark)
    t.create(ChangeEvent.rowSchema, numBuckets = 4)
    val all = ChangelogGen.changelog(spark, c)
    // batch 1 under v1 names
    CdcApply.applyBatch(t, all.filter(col("event_seq") <= 3000), 1L)
    val beforeRows = t.read().count()
    // evolve: content→body (alias rename), +stars
    AvroSchema.evolve(t, v1, v2)
    assert(t.read().columns.toSeq == Seq("repo", "path", "commit", "lang", "body", "stars"))
    // batch 2 events still speak v1 names; apply maps by field id
    CdcApply.applyBatch(t, all.filter(col("event_seq") > 3000), 2L)
    val df = t.read()
    assert(df.columns.contains("body") && !df.columns.contains("content"))
    // final state parity vs oracle (oracle speaks v1 names → rename to compare)
    val want = ChangelogGen.expectedFinalState(spark, c)
      .withColumnRenamed("content", "body")
      .select(col("repo"), col("path"), sha2(col("body"), 256).as("sha"))
    val got = df.select(col("repo"), col("path"), sha2(col("body"), 256).as("sha"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    assert(df.filter(col("stars").isNotNull).count() == 0) // added col is null everywhere
    assert(beforeRows > 0)
  }
}
