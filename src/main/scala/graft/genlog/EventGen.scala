package graft.genlog

import graft.core.{ChangeEvent, LastPk, RepoFile}
import java.nio.charset.StandardCharsets
import java.security.MessageDigest

/** Pure, seekable event generation: event `k` of shard `i` is a closed-form
  * function of (seed, i, k) — the synthetic binlog is *addressable by offset*,
  * exactly like a real binlog position. This is what lets the DSv2
  * micro-batch source serve an arbitrary per-shard offset range without
  * scanning, and what makes replays reproducible at any parallelism.
  *
  * Sharding mirrors Vitess keyspace-id routing: repos are striped across
  * shards (`repoIdx % numShards == shardIdx`), so a key's whole history lives
  * in one shard and per-shard `event_seq` totally orders it.
  */
object EventGen {

  // ---- deterministic hashing (splitmix64: public-domain mix function) ----

  def mix64(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  def h64(id: Long, seed: Long, salt: Long): Long = mix64(id ^ mix64(seed ^ mix64(salt)))

  /** uniform [0,1) */
  def h01(id: Long, seed: Long, salt: Long): Double =
    (h64(id, seed, salt) >>> 11).toDouble / (1L << 53).toDouble

  private val md = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("SHA-256")
  }
  private val hexChars = "0123456789abcdef".toCharArray

  def sha256Hex(s: String): String = {
    val digest = md.get()
    digest.reset()
    val d = digest.digest(s.getBytes(StandardCharsets.UTF_8))
    val out = new Array[Char](64)
    var i = 0
    while (i < 32) {
      out(2 * i) = hexChars((d(i) >> 4) & 0xf)
      out(2 * i + 1) = hexChars(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  // ---- derived dimensions -------------------------------------------------

  // per-row hot path: memoize shard names / uuids (tiny, per-JVM)
  private val namesCache = new java.util.concurrent.ConcurrentHashMap[Int, IndexedSeq[String]]()
  private val uuidCache = new java.util.concurrent.ConcurrentHashMap[(Long, Int), String]()

  def shardName(numShards: Int, shardIdx: Int): String =
    namesCache.computeIfAbsent(numShards, n => ChangelogGen.shardNames(n))(shardIdx)

  def shardUuid(seed: Long, shardIdx: Int): String =
    uuidCache.computeIfAbsent((seed, shardIdx), k => ChangelogGen.shardUuid(k._1, k._2))

  private val langs = Vector("scala" -> "scala", "go" -> "go", "python" -> "py",
    "rust" -> "rs", "javascript" -> "js")

  def pathName(pIdx: Int): (String, String) = {
    val (lang, ext) = langs(pIdx % langs.size)
    (s"src/dir${pIdx % 7}/file$pIdx.$ext", lang)
  }

  def repoName(repoIdx: Int): String = {
    val d = repoIdx.toString
    if (d.length >= 4) "repo-" + d
    else "repo-" + "0000".substring(d.length) + d
  }

  def reposPerShard(c: GenConfig): Int = math.max(1, c.numRepos / c.numShards)

  /** Zipf-ish repo pick within the event's shard (hot repo = local index 0). */
  def repoIdxFor(id: Long, shardIdx: Int, c: GenConfig): Int = {
    val rps = reposPerShard(c)
    val local = math.min(rps - 1, (rps * math.pow(h01(id, c.seed, 1), c.zipfSkew)).toInt)
    shardIdx + c.numShards * local
  }

  def content(repo: String, path: String, ver: Long, c: GenConfig): String =
    content(repo, path, ver, c.seed, c.contentBlocks)

  def content(repo: String, path: String, ver: Long, seed: Long, contentBlocks: Int): String = {
    val h = sha256Hex(s"$repo|$path|$ver|$seed")
    val blocks = 1 + (java.lang.Long.parseUnsignedLong(h.substring(0, 12), 16) % contentBlocks).toInt
    val block = s"fn block_${h.substring(0, 12)}() { return \"${h.substring(12, 44)}\"; }\n"
    val sb = new StringBuilder(32 + block.length * blocks)
    sb.append(s"// $repo/$path @v$ver\n")
    var i = 0
    while (i < blocks) { sb.append(block); i += 1 }
    sb.toString
  }

  def commitId(repo: String, path: String, ver: Long, seed: Long): String =
    sha256Hex(s"$repo#$path#$ver#$seed").substring(0, 40)

  // ---- offset space -------------------------------------------------------

  /** COPY-phase rows per shard (the initial snapshot, PK-ordered). */
  def copyPerShard(c: GenConfig): Long =
    if (c.copyRows <= 0) 0L else (c.copyRows + c.numShards - 1) / c.numShards

  /** Catch-up events in shard `i`: ids k*numShards + i < numEvents. */
  def catchupPerShard(shardIdx: Int, c: GenConfig): Long =
    if (shardIdx >= c.numEvents) 0L
    else (c.numEvents - shardIdx - 1) / c.numShards + 1

  /** Total addressable rows in shard `i` (copy first, then catch-up). */
  def totalPerShard(shardIdx: Int, c: GenConfig): Long =
    copyPerShard(c) + catchupPerShard(shardIdx, c)

  /** vgtid rank base for catch-up events: copy phase owns rank 1. */
  def copyRankBase(c: GenConfig): Long = if (c.copyRows > 0) 1L else 0L

  /** Resolve a starting GTID to a row position in shard `shardIdx`'s unified
    * offset space — the inverse of the closed-form vgtid stamped by
    * [[catchupEvent]]. A position "through transaction G" means the copy
    * phase is already done and catch-up events with gno ≤ G are consumed
    * (the reference's `starting_gtids` semantics: resume the binlog tail
    * from that position, no COPY — `planetscale_connection.go:85-113`).
    */
  def positionForGtid(shardIdx: Int, gtid: String, c: GenConfig): Long = {
    val g = graft.core.VGtid.parse(gtid)
    if (g.isEmpty) 0L
    else {
      val uuid = shardUuid(c.seed, shardIdx)
      val maxGno = g.sets.getOrElse(uuid, Vector.empty).lastOption.map(_._2).getOrElse(0L)
      if (maxGno <= 0L) 0L
      else {
        val catchupDone =
          math.min(math.max(0L, maxGno - copyRankBase(c)), catchupPerShard(shardIdx, c))
        copyPerShard(c) + catchupDone
      }
    }
  }

  // ---- events -------------------------------------------------------------

  /** Catch-up event `k` (0-based) of shard `shardIdx`. */
  def catchupEvent(shardIdx: Int, k: Long, c: GenConfig): ChangeEvent = {
    val id = k * c.numShards + shardIdx // global event id
    val seq = k + 1
    val repoIdx = repoIdxFor(id, shardIdx, c)
    val repo = repoName(repoIdx)
    val pIdx = (c.pathsPerRepo * h01(id, c.seed, 2)).toInt.min(c.pathsPerRepo - 1)
    val (path, lang) = pathName(pIdx)
    val isDelete = h01(id, c.seed, 3) < c.deleteRatio
    val isInsert = !isDelete && h01(id, c.seed, 4) < 0.3
    val op = if (isDelete) ChangeEvent.OpDelete
             else if (isInsert) ChangeEvent.OpInsert else ChangeEvent.OpUpdate
    val after =
      if (isDelete) None
      else Some(RepoFile(repo, path, commitId(repo, path, id, c.seed), lang, content(repo, path, id, c)))
    val before =
      if (op == ChangeEvent.OpInsert) None
      else Some(RepoFile(repo, path, "", "", ""))
    ChangeEvent(
      keyspace = c.keyspace,
      shard = shardName(c.numShards, shardIdx),
      vgtid = s"MySQL56/${shardUuid(c.seed, shardIdx)}:1-${seq + copyRankBase(c)}",
      event_seq = seq,
      op = op,
      before = before,
      after = after,
      is_copy_phase = false,
      last_pk = None,
      schema_version = if (c.schemaChangeAt.exists(id >= _)) 2 else 1)
  }

  /** Sorted path table (computed once per task; pathsPerRepo is small). */
  def sortedPaths(c: GenConfig): IndexedSeq[(String, String)] =
    (0 until c.pathsPerRepo).map(pathName).sortBy(_._1)

  /** COPY-phase row `k` (0-based, PK order within the shard) of `shardIdx`.
    * Carries the copy-start position (rank 1) and a per-row LASTPK watermark,
    * mirroring `planetscale_edge_database.go:383-393`.
    */
  def copyEvent(shardIdx: Int, k: Long, c: GenConfig, paths: IndexedSeq[(String, String)]): ChangeEvent = {
    val p = paths.length
    val localRepo = (k / p).toInt
    val repoIdx = shardIdx + c.numShards * localRepo
    val repo = repoName(repoIdx)
    val (path, lang) = paths((k % p).toInt)
    val row = RepoFile(repo, path, commitId(repo, path, -1L, c.seed), lang, content(repo, path, -1L, c))
    ChangeEvent(
      keyspace = c.keyspace,
      shard = shardName(c.numShards, shardIdx),
      vgtid = s"MySQL56/${shardUuid(c.seed, shardIdx)}:1-1",
      event_seq = k + 1,
      op = ChangeEvent.OpInsert,
      before = None,
      after = Some(row),
      is_copy_phase = true,
      last_pk = Some(LastPk(repo, path)),
      schema_version = 1)
  }

  /** Resolve a COPY-phase LASTPK watermark to the row position AFTER it in
    * shard `shardIdx`'s offset space — the reference's resume-by-PK: a
    * cursor with `last_known_pk` re-requests the copy from that key
    * (`planetscale_edge_database.go:580-614`, resume test `:2506-2891`).
    * Copy rows are PK-ordered (repo, then sorted path), so the watermark
    * inverts to `localRepo * paths + pathIdx`.
    */
  def positionForPk(shardIdx: Int, repo: String, path: String, c: GenConfig): Long = {
    val paths = sortedPaths(c)
    val p = paths.length
    val repoIdx =
      try {
        require(repo.startsWith("repo-"), s"not a repo name: '$repo'")
        repo.stripPrefix("repo-").toInt
      } catch {
        case e: Exception => throw new IllegalArgumentException(
          s"unresolvable LastPk watermark: repo '$repo' does not name a known repo " +
            s"(expected 'repo-<n>'): ${e.getMessage}", e)
      }
    val localRepo = (repoIdx - shardIdx) / c.numShards
    val pathIdx = paths.indexWhere(_._1 == path)
    // a corrupt/foreign watermark must surface, not silently resume at the
    // repo's first copy row (skipping data)
    require(pathIdx >= 0,
      s"unresolvable LastPk watermark: path '$path' is not in this table's copy order")
    require(localRepo >= 0 && repoIdx % c.numShards == shardIdx,
      s"unresolvable LastPk watermark: repo '$repo' does not belong to shard $shardIdx")
    math.min(copyPerShard(c), localRepo.toLong * p + pathIdx + 1)
  }

  /** Row `pos` (0-based) of shard `shardIdx`'s unified offset space:
    * copy rows first, then catch-up events.
    */
  def eventAt(shardIdx: Int, pos: Long, c: GenConfig, paths: IndexedSeq[(String, String)]): ChangeEvent = {
    val cp = copyPerShard(c)
    if (pos < cp) copyEvent(shardIdx, pos, c, paths)
    else catchupEvent(shardIdx, pos - cp, c)
  }
}
