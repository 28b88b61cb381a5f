package graft.genlog

import graft.core.{ChangeEvent, LastPk}

/** The wire-typed payload of one `repo_profile` change event: every column a
  * raw MySQL wire STRING — enum indexes, set bitmasks, tinyint digits,
  * zero-dates, fractional datetimes, bare `.33` decimals — exactly the shape
  * a real VStream delivers before the reference runs `parseValue`
  * (`types.go:139-220`). Keys (`repo`, `path`) stay canonical strings.
  */
final case class WireProfileRow(
    repo: String,
    path: String,
    status: String,
    locations: String,
    verified: String,
    created_at: String,
    updated_at: String,
    balance: String,
    stars: String)

/** One wire-typed change event (same envelope as [[ChangeEvent]]). */
final case class WireChangeEvent(
    keyspace: String,
    shard: String,
    vgtid: String,
    event_seq: Long,
    op: String,
    before: Option[WireProfileRow],
    after: Option[WireProfileRow],
    is_copy_phase: Boolean,
    last_pk: Option[LastPk],
    schema_version: Int)

/** Deterministic wire-value derivation: maps the offset-addressable typed
  * changelog ([[EventGen]]) to the wire-string `repo_profile` stream the
  * DSv2 source serves under `wirePayload=true`. Values are closed-form
  * functions of (repo, path, event id via the content hash), so any offset
  * range replays identically at any parallelism — same property as the
  * typed stream.
  */
object WireGen {

  private def pick(h: Long, mod: Int, salt: Int): Int = {
    val m = EventGen.mix64(h ^ (salt.toLong << 17))
    ((m % mod + mod) % mod).toInt
  }

  /** Wire values derived from the typed row's identity (repo/path/commit —
    * commit already encodes the event id deterministically).
    */
  private def wireRow(repo: String, path: String, commit: String): WireProfileRow = {
    val h = EventGen.mix64(commit.hashCode.toLong << 32 ^ repo.hashCode ^ path.hashCode)
    val createdAt = pick(h, 10, 3) match {
      case 0 => "0000-00-00 00:00:00"
      case d if d % 3 == 0 => f"2021-03-04 05:06:0$d%d.${pick(h, 999999, 4)}%06d" // datetime(6)
      case d => s"2021-03-04 05:06:0$d"
    }
    val balance = pick(h, 4, 5) match {
      case 0 => ".33"
      case 1 => "-.77"
      case 2 => "12.5"
      case _ => "-0.25"
    }
    WireProfileRow(
      repo = repo,
      path = path,
      status = pick(h, 6, 1).toString,        // enum index 0..5 (3 labels → fallthroughs)
      locations = pick(h, 33, 2).toString,    // set mask 0..32 (0 and 32 → original)
      verified = pick(h, 3, 6).toString,      // tinyint digit 0..2
      created_at = createdAt,
      updated_at = s"2025-02-14 08:08:0${pick(h, 10, 7)}",
      balance = balance,
      stars = pick(h, 1000, 8).toString)
  }

  // ---- arbitrary-table wire generation (discover → read loop) -----------

  private def numericKeyType(ty: String): Boolean = {
    val t = ty.toLowerCase
    Seq("tinyint", "smallint", "mediumint", "int", "bigint").exists(t.startsWith)
  }

  /** Validate a wire table's merge-key columns — called DRIVER-SIDE (source
    * option parsing and `runAvailableNow`) so an unsupported key shape fails
    * once with a clear message, not per-row inside retried executor tasks.
    * A tinyint(1) PK lands boolean (two values — every synthetic row would
    * LWW-collapse), and non-integer non-string landings (decimal/temporal)
    * would TRY-cast the synthetic value to null and trip wireKey's
    * raise_error mid-job.
    */
  def validateKeys(wt: graft.core.WireTable): Unit =
    wt.orderedColumns.take(wt.keys.size).foreach { k =>
      if (!keyIsNumeric(k) && !keyIsString(k))
        throw new graft.core.GraftValidationException(
          s"unsupported merge-key column '${k.name} ${k.mysqlType}' for synthetic " +
            "wire generation: the key must land as an integer or string type " +
            "(boolean/decimal/temporal landings cannot carry an injective row identity)")
    }

  private def keyIsNumeric(k: graft.core.WireColumn): Boolean =
    numericKeyType(k.mysqlType) &&
      graft.core.TypeMap.sparkType(k.mysqlType, treatTinyIntAsBoolean = true) !=
        org.apache.spark.sql.types.BooleanType

  private def keyIsString(k: graft.core.WireColumn): Boolean =
    graft.core.TypeMap.sparkType(k.mysqlType, treatTinyIntAsBoolean = true) ==
      org.apache.spark.sql.types.StringType

  /** One closure per merge-key column: (repo, path) → wire key value,
    * derived INJECTIVELY from the underlying event identity so LWW/delete
    * semantics and final-state cardinality are preserved for any key shape,
    * and PER KEY COLUMN TYPE so the value is representable in the column's
    * typed landing (numeric PK → digits, string PK → names):
    *  - single numeric key → the dense (repoIdx, pathIdx) ordinal
    *  - single string key → "repo/path"
    *  - composite: key 1 carries the repo (ordinal if numeric, name if
    *    string), key 2 the path (ordinal/name), extras a constant
    * All type dispatch happens HERE, once — the returned closures are
    * branch-free per row.
    */
  def keyGens(wt: graft.core.WireTable, pathIdxOf: String => Int,
      pathsPerRepo: Int): IndexedSeq[(String, String) => String] = {
    validateKeys(wt)
    val keys = wt.orderedColumns.take(wt.keys.size)
    def repoIdx(repo: String) = repo.stripPrefix("repo-").toInt
    keys.zipWithIndex.map { case (k, i) =>
      (i, keyIsNumeric(k)) match {
        case (0, true) if keys.size == 1 =>
          (repo: String, path: String) =>
            (repoIdx(repo).toLong * pathsPerRepo + pathIdxOf(path) + 1L).toString
        case (0, false) if keys.size == 1 => (repo: String, path: String) => s"$repo/$path"
        case (0, true)  => (repo: String, _: String) => (repoIdx(repo) + 1).toString
        case (0, false) => (repo: String, _: String) => repo
        case (1, true)  => (_: String, path: String) => (pathIdxOf(path) + 1).toString
        case (1, false) => (_: String, path: String) => path
        case (_, true)  => (_: String, _: String) => "1"
        case (_, false) => (_: String, _: String) => "k"
      }
    }.toIndexedSeq
  }

  /** One closure per VALUE column: row-hash → deterministic wire string in
    * the same closed-form style as the repo_profile stream (enum indexes,
    * set bitmasks, tinyint digits, zero/fractional datetimes, bare
    * decimals). The MySQL-DDL dispatch — including enum/set label parsing —
    * runs ONCE here; the per-row path is a single mix64 + formatting.
    */
  def valueGen(col: graft.core.WireColumn): Long => String = {
    val ty = col.mysqlType.toLowerCase
    val nameHash = col.name.hashCode.toLong
    def h(h0: Long): Long = EventGen.mix64(h0 ^ nameHash)
    if (ty.startsWith("enum")) {
      val n = graft.core.TypeMap.parseEnumOrSetValues(col.mysqlType).size
      h0 => pick(h(h0), n + 2, 1).toString // 0 (empty) .. n+1 (out-of-range)
    } else if (ty.startsWith("set")) {
      val n = math.min(graft.core.TypeMap.parseEnumOrSetValues(col.mysqlType).size, 5)
      h0 => pick(h(h0), (1 << n) + 1, 2).toString // 0 (original) .. full mask
    } else if (ty == "tinyint(1)") h0 => pick(h(h0), 3, 6).toString
    else if (ty.startsWith("datetime")) h0 => {
      val hh = h(h0)
      pick(hh, 10, 3) match {
        case 0 => "0000-00-00 00:00:00"
        case d if d % 3 == 0 => f"2021-03-04 05:06:0$d%d.${pick(hh, 999999, 4)}%06d"
        case d => s"2021-03-04 05:06:0$d"
      }
    }
    else if (ty.startsWith("timestamp")) h0 => s"2025-02-14 08:08:0${pick(h(h0), 10, 7)}"
    else if (ty.startsWith("date")) h0 => pick(h(h0), 5, 3) match {
      case 0 => "0000-00-00"
      case d => s"2021-03-1$d"
    }
    else if (ty.startsWith("time")) h0 => f"${pick(h(h0), 24, 7)}%02d:30:00"
    else if (ty.startsWith("year")) h0 => (1990 + pick(h(h0), 40, 9)).toString
    else if (ty.startsWith("decimal")) {
      val vals = Array(".33", "-.77", "12.5", "-0.25")
      h0 => vals(pick(h(h0), 4, 5))
    }
    else if (numericKeyType(ty)) h0 => pick(h(h0), 1000, 8).toString
    else if (ty.startsWith("float") || ty.startsWith("double"))
      h0 => s"${pick(h(h0), 100, 10)}.5"
    else h0 => s"w-${pick(h(h0), 100000, 11)}"
  }

  /** Lift a typed event to its wire form (delete before-images carry the key
    * only, like the typed stream).
    */
  def fromEvent(e: ChangeEvent): WireChangeEvent = {
    def lift(r: graft.core.RepoFile, keysOnly: Boolean): WireProfileRow =
      if (keysOnly) WireProfileRow(r.repo, r.path, null, null, null, null, null, null, null)
      else wireRow(r.repo, r.path, r.commit)
    WireChangeEvent(
      keyspace = e.keyspace,
      shard = e.shard,
      vgtid = e.vgtid,
      event_seq = e.event_seq,
      op = e.op,
      before = e.before.map(lift(_, keysOnly = true)),
      after = e.after.map(lift(_, keysOnly = false)),
      is_copy_phase = e.is_copy_phase,
      last_pk = e.last_pk,
      schema_version = e.schema_version)
  }
}
