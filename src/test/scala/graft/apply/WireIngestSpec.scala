package graft.apply

import graft.SparkSupport
import graft.core.{WireColumn, WireTableSpec}
import graft.laketable.LakeTable
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Wire event rows for the streaming leg (top level for Encoder derivation). */
case class WireRowT(repo: String, path: String, status: String, locations: String,
    verified: String, created_at: String, balance: String, stars: String)
case class WireEvtT(keyspace: String, shard: String, vgtid: String, event_seq: Long,
    op: String, before: Option[WireRowT], after: Option[WireRowT],
    is_copy_phase: Boolean, last_pk: Option[graft.core.LastPk], schema_version: Int)

/** End-to-end normalization INSIDE the ingest path: raw MySQL wire strings
  * in → normalized, typed lake rows out — the reference's `parseValue`-on-
  * every-synced-row behavior (`types.go:139-220`), proven with the vectors
  * of `types_test.go:81-242` (`TestCanMapEnumAndSetValues`,
  * `TestCanMapTinyIntValues`, ISO-8601 and decimal cases).
  */
class WireIngestSpec extends AnyFunSuite with SparkSupport {

  private val ws = WireTableSpec(Seq(
    WireColumn("repo", "varchar(64)", "NO"),
    WireColumn("path", "varchar(128)", "NO"),
    WireColumn("status", "enum('active','inactive')"),
    WireColumn("locations",
      "set('San Francisco','New York','London','San Jose','Oakland')"),
    WireColumn("verified", "tinyint(1)"),
    WireColumn("created_at", "datetime"),
    WireColumn("balance", "decimal(10,2)"),
    WireColumn("stars", "bigint")))

  private def ingest(rows: Seq[(String, String, String, String, String, String, String, String)]): LakeTable = {
    import spark.implicits._
    val table = new LakeTable(tmpDir("wire") + "/t", spark)
    table.create(ws.landingSchema, numBuckets = 2)
    val events = rows.toDF("repo", "path", "status", "locations", "verified",
      "created_at", "balance", "stars")
      .select(
        lit("ks").as("keyspace"), lit("-").as("shard"),
        lit("MySQL56/aaaaaaaa-0000-0000-0000-000000000001:1-1").as("vgtid"),
        lit(1L).as("event_seq"), lit("insert").as("op"),
        lit(null).cast(ws.wireRowSchema).as("before"),
        struct(col("repo"), col("path"), col("status"), col("locations"),
          col("verified"), col("created_at"), col("balance"), col("stars")).as("after"),
        lit(false).as("is_copy_phase"),
        lit(null).cast("struct<repo:string,path:string>").as("last_pk"),
        lit(1).as("schema_version"))
    CdcApply.replayAll(table, events, CdcApply.ApplyConfig(wireSpec = Some(ws)))
    table
  }

  test("types_test.go vectors land normalized and typed through applyBatch") {
    val table = ingest(Seq(
      // enum INDEX + set BITMASK (the post-COPY wire shape): 1 → 'active',
      // 24 = 0b11000 → 'San Jose,Oakland' (types_test.go:82-111)
      ("r1", "p1", "1", "24", "1", "2021-03-04 05:06:07", ".33", "42"),
      // already-mapped label + comma-joined set pass through unchanged
      ("r1", "p2", "active", "San Francisco,Oakland", "0", "0000-00-00 00:00:00", "-.77", "7"),
      // out-of-range enum index → ORIGINAL; zero set mask → ORIGINAL
      ("r2", "p3", "9", "0", "2", "1999-12-31 23:59:59", "12.5", "0"),
      // mixed zero-date "0000-00-00 11:22:33" is NOT exact (types.go:309-315)
      // → normalizes to itself; the TIMESTAMP_NTZ landing can't hold the
      // original string, so it lands NULL (values lands-null contract)
      ("r2", "p4", "2", "1", "0", "0000-00-00 11:22:33", "1.0", "1")))
    val got = table.read()
      .select(col("repo"), col("path"), col("status"), col("locations"), col("verified"),
        date_format(col("created_at"), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS").as("iso"),
        (col("balance") * 100).cast("long").as("cents"), col("stars"))
      .orderBy("path").collect()
    assert(got.toSeq == Seq(
      Row("r1", "p1", "active", "San Jose,Oakland", true,
        "2021-03-04T05:06:07.000000", 33L, 42L),
      Row("r1", "p2", "active", "San Francisco,Oakland", false,
        "1970-01-01T00:00:00.000000", -77L, 7L),
      Row("r2", "p3", "9", "0", true,
        "1999-12-31T23:59:59.000000", 1250L, 0L),
      Row("r2", "p4", "inactive", "San Francisco", false,
        null, 100L, 1L)))
    // typed landing schema, not strings
    val types = table.read().schema.fields.map(f => f.name -> f.dataType.sql).toMap
    assert(types("verified") == "BOOLEAN" && types("created_at") == "TIMESTAMP_NTZ" &&
      types("balance") == "DECIMAL(10,2)" && types("stars") == "BIGINT")
  }

  test("labels come from the column type DDL (parseEnumOrSetValues), not a side channel") {
    import graft.core.TypeMap.parseEnumOrSetValues
    assert(parseEnumOrSetValues("enum('apple','banana','orange')") ==
      Seq("apple", "banana", "orange"))
    assert(parseEnumOrSetValues(
      "set('San Francisco','New York','London','San Jose','Oakland')") ==
      Seq("San Francisco", "New York", "London", "San Jose", "Oakland"))
    // reference quirks preserved: no parens → one empty label
    assert(parseEnumOrSetValues("varchar(0)") == Seq("0"))
    assert(parseEnumOrSetValues("text") == Seq(""))
  }

  test("STREAMING wire ingest: micro-batched raw strings normalize inside " +
    "foreachBatch apply; LWW + delete semantics hold across batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    def evt(seq: Long, op: String, path: String, status: String, balance: String): WireEvtT = {
      val row = WireRowT("r1", path, status, "3", "1", "2021-03-04 05:06:07", balance, "5")
      WireEvtT("ks", "-", s"MySQL56/aaaaaaaa-0000-0000-0000-000000000001:1-$seq", seq, op,
        if (op == "insert") None else Some(row.copy(status = null, locations = null,
          verified = null, created_at = null, balance = null, stars = null)),
        if (op == "delete") None else Some(row), is_copy_phase = false, None, 1)
    }
    val table = new LakeTable(tmpDir("wirestream") + "/t", spark)
    table.create(ws.landingSchema, numBuckets = 2)
    val cp = tmpDir("wirestream-cp")
    val stream = MemoryStream[WireEvtT]
    def drain(): Unit = {
      val q = stream.toDF().writeStream
        .option("checkpointLocation", cp)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
          CdcApply.applyBatch(table, batch, batchId,
            conf = CdcApply.ApplyConfig(wireSpec = Some(ws)))
          ()
        }.start()
      q.awaitTermination(); q.stop()
    }
    stream.addData(evt(1, "insert", "p1", "1", ".33"), evt(2, "insert", "p2", "2", "-.77"))
    drain()
    stream.addData(evt(3, "update", "p1", "2", "12.5"), evt(4, "delete", "p2", null, null))
    drain()
    val got = table.read()
      .select(col("path"), col("status"), (col("balance") * 100).cast("long").as("cents"))
      .orderBy("path").collect()
    // p1 updated (LWW winner seq 3, enum 2 → inactive), p2 deleted
    assert(got.toSeq == Seq(Row("p1", "inactive", 1250L)))
    // cursors advanced to the head of the second batch
    val st = graft.core.SyncState.fromJson(table.summaryValue("cursors").get)
    assert(st.cursorFor("ks:repo_content", "-").get.position.endsWith(":1-4"))
  }

  test("GENERIC merge keys: a table keyed (org, dataset) ingests through the same " +
    "apply path — dedup, bucketing, delete and anti-join all follow keyColumns") {
    import spark.implicits._
    val ws2 = WireTableSpec(Seq(
      WireColumn("org", "varchar(64)", "NO"),
      WireColumn("dataset", "varchar(64)", "NO"),
      WireColumn("rows_count", "bigint"),
      WireColumn("grade", "enum('bronze','silver','gold')")))
    val table = new LakeTable(tmpDir("generic") + "/t", spark)
    table.create(ws2.landingSchema, numBuckets = 2)
    def ev(seq: Long, op: String, org: String, ds: String, n: String, g: String) =
      (("ks"), ("-"), (s"MySQL56/aaaaaaaa-0000-0000-0000-000000000002:1-$seq"), seq, op,
        org, ds, n, g)
    val events = Seq(
      ev(1, "insert", "o1", "d1", "10", "1"),
      ev(2, "insert", "o1", "d2", "20", "2"),
      ev(3, "update", "o1", "d1", "30", "3"),
      ev(4, "insert", "o2", "d1", "40", "9"), // out-of-range enum → original
      ev(5, "delete", "o1", "d2", null, null))
      .toDF("keyspace", "shard", "vgtid", "event_seq", "op", "org", "dataset", "n", "g")
      .select(col("keyspace"), col("shard"), col("vgtid"), col("event_seq"), col("op"),
        when(col("op") === "delete",
          struct(col("org"), col("dataset"), lit(null).cast("string").as("rows_count"),
            lit(null).cast("string").as("grade"))).as("before"),
        when(col("op") =!= "delete",
          struct(col("org"), col("dataset"), col("n").as("rows_count"),
            col("g").as("grade"))).as("after"),
        lit(false).as("is_copy_phase"),
        lit(null).cast("struct<repo:string,path:string>").as("last_pk"),
        lit(1).as("schema_version"))
    CdcApply.replayAll(table, events,
      CdcApply.ApplyConfig(wireSpec = Some(ws2), keyColumns = Seq("org", "dataset")))
    val got = table.read().orderBy("org", "dataset")
      .select("org", "dataset", "rows_count", "grade").collect()
    assert(got.toSeq == Seq(
      Row("o1", "d1", 30L, "gold"),   // LWW winner seq 3
      Row("o2", "d1", 40L, "9")))     // enum out-of-range keeps original; d2 deleted
    // second batch: overwrite o2/d1 — the bucket anti-join must key on (org, dataset)
    val upd = events.filter(col("event_seq") === 4)
      .withColumn("vgtid", lit("MySQL56/aaaaaaaa-0000-0000-0000-000000000002:1-6"))
      .withColumn("event_seq", lit(6L))
      .withColumn("after", struct(col("after.org"), col("after.dataset"),
        lit("99").as("rows_count"), lit("2").as("grade")))
    CdcApply.applyBatch(table, upd, batchId = 1L,
      conf = CdcApply.ApplyConfig(wireSpec = Some(ws2), keyColumns = Seq("org", "dataset")))
    val after = table.read().filter(col("org") === "o2").collect()
    assert(after.length == 1 && after(0).getAs[Long]("rows_count") == 99L
      && after(0).getAs[String]("grade") == "silver")
  }

  test("malformed wire values land NULL in typed columns, never fail the job (ANSI-safe)") {
    val table = ingest(Seq(
      ("r1", "p1", "1", "1", "not-a-number", "not-a-date", "abc", "xyz")))
    val r = table.read().select("verified", "created_at", "balance", "stars").head()
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2) && r.isNullAt(3))
  }

  test("NUMERIC wire keys: staged and rewrite buckets hash the same typed value " +
    "(a second-batch update must replace, never duplicate), and tinyint(1) " +
    "unsigned / datetime(6) / out-of-range bigint land per contract") {
    import spark.implicits._
    val ws3 = WireTableSpec(Seq(
      WireColumn("actor_id", "smallint(5) unsigned", "NO"),
      WireColumn("film_id", "int(11)", "NO"),
      WireColumn("flag", "tinyint(1) unsigned"),
      WireColumn("seen_at", "datetime(6)"),
      WireColumn("views", "bigint")))
    val table = new LakeTable(tmpDir("numkey") + "/t", spark)
    table.create(ws3.landingSchema, numBuckets = 8)
    def batch(rows: Seq[(Long, String, String, String, String, String)]) =
      rows.toDF("seq", "actor_id", "film_id", "flag", "seen_at", "views")
        .select(lit("ks").as("keyspace"), lit("-").as("shard"),
          concat(lit("MySQL56/aaaaaaaa-0000-0000-0000-000000000003:1-"), col("seq")).as("vgtid"),
          col("seq").as("event_seq"), lit("update").as("op"),
          lit(null).cast(ws3.wireRowSchema).as("before"),
          struct(col("actor_id"), col("film_id"), col("flag"), col("seen_at"),
            col("views")).as("after"),
          lit(false).as("is_copy_phase"),
          lit(null).cast("struct<repo:string,path:string>").as("last_pk"),
          lit(1).as("schema_version"))
    val conf = CdcApply.ApplyConfig(wireSpec = Some(ws3),
      keyColumns = Seq("actor_id", "film_id"))
    CdcApply.applyBatch(table, batch(Seq(
      (1L, "42", "7", "2", "2021-03-04 05:06:07.123456", "10"),
      (2L, "43", "7", "0", "2021-03-04 05:06:07", "18446744073709551615"))), 0L, conf = conf)
    // typed keys landed as BIGINT; fractional datetime kept to the micro;
    // tinyint(1) unsigned "2" → true (discovery's PREFIX rule, landing-layer
    // conversion); unsigned-bigint overflow → NULL (TRY cast), job alive
    val r1 = table.read().orderBy("actor_id").collect()
    assert(table.read().schema("actor_id").dataType.sql == "BIGINT")
    assert(r1.map(r => (r.getAs[Long]("actor_id"), r.getAs[Boolean]("flag"))).toSeq ==
      Seq((42L, true), (43L, false)))
    assert(r1(0).getAs[java.time.LocalDateTime]("seen_at").getNano == 123456000)
    assert(r1(1).isNullAt(r1(1).fieldIndex("views")))
    // batch 2: update key (42, 7) — the rewrite's anti-join must find the
    // original row in the SAME bucket the typed read-path hash gives
    CdcApply.applyBatch(table, batch(Seq(
      (3L, "42", "7", "1", "2022-01-01 00:00:00", "99"))), 1L, conf = conf)
    val r2 = table.read().filter(col("actor_id") === 42L).collect()
    assert(r2.length == 1, s"duplicate key after update: ${r2.mkString(";")}")
    assert(r2(0).getAs[Long]("views") == 99L)
  }

  test("unrepresentable wire KEY fails loud (PK integrity), never a silent null; " +
    "non-canonical wire spellings of one key dedup to ONE landed row") {
    import spark.implicits._
    val wsk = WireTableSpec(Seq(
      WireColumn("id", "bigint unsigned", "NO"),
      WireColumn("path", "varchar(64)", "NO"),
      WireColumn("n", "bigint")))
    def batch(rows: Seq[(Long, String, String)]) =
      rows.toDF("seq", "id", "n")
        .select(lit("ks").as("keyspace"), lit("-").as("shard"),
          concat(lit("MySQL56/aaaaaaaa-0000-0000-0000-000000000005:1-"), col("seq")).as("vgtid"),
          col("seq").as("event_seq"), lit("update").as("op"),
          lit(null).cast(wsk.wireRowSchema).as("before"),
          struct(col("id"), lit("p").as("path"), col("n")).as("after"),
          lit(false).as("is_copy_phase"),
          lit(null).cast("struct<repo:string,path:string>").as("last_pk"),
          lit(1).as("schema_version"))
    val conf = CdcApply.ApplyConfig(wireSpec = Some(wsk), keyColumns = Seq("id", "path"))
    val t1 = new LakeTable(tmpDir("badkey") + "/t", spark)
    t1.create(wsk.landingSchema, numBuckets = 2)
    // a key above Long range would land NULL and escape every future
    // anti-join — the ingest must fail, not corrupt the PK invariant
    val e = intercept[Exception] {
      CdcApply.replayAll(t1, batch(Seq((1L, "18446744073709551615", "1"))), conf)
    }
    assert(e.getMessage.contains("unrepresentable merge-key") ||
      Option(e.getCause).exists(_.getMessage.contains("unrepresentable merge-key")))
    // canonicalization happens BEFORE dedup: "42" and "042" are ONE key
    val t2 = new LakeTable(tmpDir("canon") + "/t", spark)
    t2.create(wsk.landingSchema, numBuckets = 2)
    CdcApply.replayAll(t2, batch(Seq((1L, "42", "10"), (2L, "042", "20"))), conf)
    val rows = t2.read().collect()
    assert(rows.length == 1 && rows(0).getAs[Long]("id") == 42L
      && rows(0).getAs[Long]("n") == 20L)
  }

  test("wire + include_metadata landing schemas COMPOSE") {
    import graft.core.ChangeEvent
    val s = ChangeEvent.landingSchemaFor(wirePayload = true, includeMetadata = true)
    assert(s.fieldNames.take(2).toSeq == Seq("repo", "path"))
    assert(s.fieldNames.takeRight(3).toSeq ==
      Seq("_graft_vgtid", "_graft_seq", "_graft_extracted_at"))
    assert(s.fieldNames.contains("balance") && s.fieldNames.contains("verified"))
    assert(ChangeEvent.landingSchemaFor(false, false) == ChangeEvent.rowSchema)
    assert(ChangeEvent.landingSchemaFor(false, true) == ChangeEvent.rowSchemaWithMeta)
  }

  test("reserved key names that would collide with dedup internals fail loud") {
    import spark.implicits._
    val ev = Seq(1).toDF("x").select(lit("ks").as("keyspace"), lit("-").as("shard"),
      lit("MySQL56/aaaaaaaa-0000-0000-0000-000000000004:1-1").as("vgtid"),
      lit(1L).as("event_seq"), lit("insert").as("op"),
      lit(null).cast("struct<org:string,rank:string>").as("before"),
      struct(lit("o").as("org"), lit("r").as("rank")).as("after"))
    val e = intercept[IllegalArgumentException] {
      CdcApply.dedupLww(ev, keys = Seq("org", "rank")).collect()
    }
    assert(e.getMessage.contains("rank"))
  }
}
