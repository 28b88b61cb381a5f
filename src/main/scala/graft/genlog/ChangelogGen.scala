package graft.genlog

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic, seeded, fully-distributed generator of the sharded
  * changelog (FIXTURES.md §2) — the synthetic analogue of the Vitess VStream
  * the reference tails (`cmd/internal/planetscale_edge_database.go:291-462`).
  *
  * Scale-invariant by construction: every column is a pure hash of
  * (seed, row id), derived with codegen'd `functions._` only — `spark.range`
  * scales to 10^10 rows across executors with no driver-side loops and no
  * RNG state. Hot-repo skew comes from a power-law transform of a uniform
  * hash (`zipfSkew`), so the same skew shape appears at every scale factor.
  *
  * Keys are shard-local (`shard = f(repo)`), mirroring Vitess keyspace-id
  * sharding, so per-shard `event_seq` totally orders each key's history.
  */
final case class GenConfig(
    seed: Long = 42L,
    numEvents: Long = 100000L,
    numShards: Int = 4,
    numRepos: Int = 100,
    pathsPerRepo: Int = 50,
    keyspace: String = "ks",
    zipfSkew: Double = 2.0,
    deleteRatio: Double = 0.05,
    copyRows: Long = 0L,
    contentBlocks: Int = 8)

object ChangelogGen {

  /** Vitess-style shard range names: 4 shards → -40, 40-80, 80-c0, c0-
    * (shape of `planetscale_connection_test.go:41-46`). Falls back to plain
    * indexed names when 256 doesn't divide evenly.
    */
  def shardNames(n: Int): Seq[String] =
    if (n == 1) Seq("-")
    else if (256 % n == 0) {
      val step = 256 / n
      (0 until n).map { i =>
        val lo = if (i == 0) "" else f"${i * step}%02x"
        val hi = if (i == n - 1) "" else f"${(i + 1) * step}%02x"
        s"$lo-$hi"
      }
    } else (0 until n).map(i => s"shard$i")

  /** Deterministic per-shard server UUID (binlog writer identity). */
  def shardUuid(seed: Long, shardIdx: Int): String = {
    val h1 = scala.util.hashing.MurmurHash3.stringHash(s"$seed:$shardIdx:a").toLong & 0xffffffffL
    val h2 = scala.util.hashing.MurmurHash3.stringHash(s"$seed:$shardIdx:b").toLong & 0xffffffffL
    f"$h1%08x-${h2 & 0xffff}%04x-11eb-${(h1 >> 8) & 0xffff}%04x-$h2%08x$h1%04x".take(36)
  }

  /** uniform [0,1) hash of (id, seed, salt) — codegen'd, no RNG state. */
  private def h01(id: Column, seed: Long, salt: Int): Column =
    (pmod(xxhash64(id, lit(seed), lit(salt)), lit(1000000007L)).cast("double") / lit(1000000007.0))

  private def repoCol(id: Column, c: GenConfig): Column = {
    // power-law repo popularity: repo 0 is the hot repo
    val idx = floor(lit(c.numRepos) * pow(h01(id, c.seed, 1), lit(c.zipfSkew))).cast("int")
    concat(lit("repo-"), lpad(idx.cast("string"), 4, "0"))
  }

  private val langs = Seq("scala" -> "scala", "go" -> "go", "python" -> "py",
    "rust" -> "rs", "javascript" -> "js")

  private def pathCols(id: Column, c: GenConfig): (Column, Column) = {
    val pidx = floor(lit(c.pathsPerRepo) * h01(id, c.seed, 2)).cast("int")
    val lang = element_at(array(langs.map(l => lit(l._1)): _*), pmod(pidx, lit(langs.size)) + 1)
    val ext = element_at(array(langs.map(l => lit(l._2)): _*), pmod(pidx, lit(langs.size)) + 1)
    val path = concat(lit("src/dir"), pmod(pidx, lit(7)).cast("string"),
      lit("/file"), pidx.cast("string"), lit("."), ext)
    (path, lang)
  }

  /** Deterministic file body — a function of (repo, path, version, seed) only,
    * so replays at any parallelism produce identical sha256(content).
    */
  private def contentCol(repo: Column, path: Column, ver: Column, c: GenConfig): Column = {
    val h = sha2(concat_ws("|", repo, path, ver.cast("string"), lit(c.seed.toString)), 256)
    val blocks = (pmod(xxhash64(h), lit(c.contentBlocks)) + 1).cast("int")
    concat(
      lit("// "), repo, lit("/"), path, lit(" @v"), ver.cast("string"), lit("\n"),
      repeat(concat(lit("fn block_"), substring(h, 1, 12), lit("() { return \""),
        substring(h, 13, 32), lit("\"; }\n")), blocks))
  }

  private def commitCol(repo: Column, path: Column, ver: Column, seed: Long): Column =
    substring(sha2(concat_ws("#", repo, path, ver.cast("string"), lit(seed.toString)), 256), 1, 40)

  def shardMapCols(c: GenConfig): (Column, Column, Column) = {
    val names = shardNames(c.numShards)
    val uuids = (0 until c.numShards).map(shardUuid(c.seed, _))
    val shardIdx = pmod(xxhash64(col("repo"), lit(c.seed)), lit(c.numShards)).cast("int")
    (shardIdx,
      element_at(array(names.map(lit): _*), shardIdx + 1),
      element_at(array(uuids.map(lit): _*), shardIdx + 1))
  }

  /** The catch-up changelog: `numEvents` insert/update/delete events.
    * Output schema = FIXTURES.md §2 / [[graft.core.ChangeEvent.schema]].
    */
  def changelog(spark: SparkSession, c: GenConfig): DataFrame = {
    val base = spark.range(c.numEvents).toDF("id")
    val repo = repoCol(col("id"), c)
    val (path, lang) = pathCols(col("id"), c)
    val keyed = base
      .withColumn("repo", repo)
      .select(col("id"), col("repo"), path.as("path"), lang.as("lang"))
    val (shardIdx, shardName, uuid) = shardMapCols(c)
    val wKey = Window.partitionBy("repo", "path").orderBy("id")
    val wShard = Window.partitionBy("shard_idx").orderBy("id")
    val copySeqBase = lit(if (c.copyRows > 0) 1L else 0L) // copy phase owns rank 1
    keyed
      .withColumn("shard_idx", shardIdx)
      .withColumn("key_rn", row_number().over(wKey))
      .withColumn("event_seq", row_number().over(wShard).cast("long"))
      .withColumn("op",
        when(col("key_rn") === 1, lit("insert"))
          .when(h01(col("id"), c.seed, 3) < lit(c.deleteRatio), lit("delete"))
          .otherwise(lit("update")))
      .withColumn("commit", commitCol(col("repo"), col("path"), col("id"), c.seed))
      .withColumn("content", contentCol(col("repo"), col("path"), col("id"), c))
      .select(
        lit(c.keyspace).as("keyspace"),
        shardName.as("shard"),
        concat(lit("MySQL56/"), uuid, lit(":1-"), (col("event_seq") + copySeqBase).cast("string")).as("vgtid"),
        col("event_seq"),
        col("op"),
        lit(null).cast(graft.core.ChangeEvent.rowSchema).as("before"),
        when(col("op") =!= "delete",
          struct(col("repo"), col("path"), col("commit"), col("lang"), col("content"))
        ).otherwise(
          lit(null).cast(graft.core.ChangeEvent.rowSchema)
        ).as("after"),
        // deletes still need the key: carry it in before (reference RowChange.Before)
        col("repo").as("_key_repo"), col("path").as("_key_path"),
        lit(false).as("is_copy_phase"),
        lit(null).cast("struct<repo:string,path:string>").as("last_pk"),
        lit(1).as("schema_version"))
      .withColumn("before",
        when(col("op") =!= "insert",
          struct(col("_key_repo").as("repo"), col("_key_path").as("path"),
            lit("").as("commit"), lit("").as("lang"), lit("").as("content"))))
      .drop("_key_repo", "_key_path")
  }

  /** COPY-phase rows: the initial table snapshot, streamed in PK order with
    * per-row `last_pk` watermarks — the analogue of VStream COPY + LASTPK
    * (`planetscale_edge_database.go:383-393`). All carry the copy-start
    * position (rank 1), so any catch-up event LWW-beats them.
    */
  def copyPhase(spark: SparkSession, c: GenConfig): DataFrame = {
    require(c.copyRows > 0)
    val base = spark.range(c.copyRows).toDF("id")
    val repo = repoCol(col("id") * 7919 + 13, c) // decorrelate from changelog ids
    val (path, lang) = pathCols(col("id") * 7919 + 13, c)
    val keyed = base.withColumn("repo", repo)
      .select(col("id"), col("repo"), path.as("path"), lang.as("lang"))
      .dropDuplicates("repo", "path")
    val (shardIdx, shardName, uuid) = shardMapCols(c)
    val wShard = Window.partitionBy("shard_idx").orderBy("repo", "path") // PK order
    keyed
      .withColumn("shard_idx", shardIdx)
      .withColumn("event_seq", row_number().over(wShard).cast("long"))
      .withColumn("commit", commitCol(col("repo"), col("path"), lit(-1), c.seed))
      .withColumn("content", contentCol(col("repo"), col("path"), lit(-1), c))
      .select(
        lit(c.keyspace).as("keyspace"),
        shardName.as("shard"),
        concat(lit("MySQL56/"), uuid, lit(":1-1")).as("vgtid"),
        col("event_seq"),
        lit("insert").as("op"),
        lit(null).cast(graft.core.ChangeEvent.rowSchema).as("before"),
        struct(col("repo"), col("path"), col("commit"), col("lang"), col("content")).as("after"),
        lit(true).as("is_copy_phase"),
        struct(col("repo"), col("path")).as("last_pk"),
        lit(1).as("schema_version"))
  }

  /** Full stream for a replay test: copy phase (if any) followed by catch-up. */
  def fullStream(spark: SparkSession, c: GenConfig): DataFrame =
    if (c.copyRows > 0) copyPhase(spark, c).unionByName(changelog(spark, c))
    else changelog(spark, c)

  /** The oracle: expected final table state after applying the full stream —
    * last writer per (repo, path) wins by (vgtid rank, event_seq); a final
    * delete removes the row. Computed by an independent plan (global window,
    * no bucketing/merge machinery) for parity tests.
    */
  def expectedFinalState(spark: SparkSession, c: GenConfig): DataFrame = {
    val ev = fullStream(spark, c)
    val keyed = ev.withColumn("_repo", coalesce(col("after.repo"), col("before.repo")))
      .withColumn("_path", coalesce(col("after.path"), col("before.path")))
    val rank = when(col("is_copy_phase"), lit(1L))
      .otherwise(col("event_seq") + lit(if (c.copyRows > 0) 1L else 0L))
    val w = Window.partitionBy("_repo", "_path").orderBy(rank.desc, col("event_seq").desc)
    keyed.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1 && col("op") =!= "delete")
      .select(col("after.repo"), col("after.path"), col("after.commit"),
        col("after.lang"), col("after.content"))
  }
}
