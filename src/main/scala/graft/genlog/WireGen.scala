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

  /** Merge-key wire values for an arbitrary table, derived INJECTIVELY from
    * the underlying event identity (repo, path) so LWW/delete semantics and
    * final-state cardinality are preserved for any key shape — and derived
    * PER KEY COLUMN TYPE, so the value is representable in that column's
    * typed landing (a numeric PK gets digits, a string PK gets names):
    *  - single numeric key → the dense (repoIdx, pathIdx) ordinal
    *  - single string key → "repo/path"
    *  - composite: key 1 carries the repo (ordinal if numeric, name if
    *    string), key 2 the path (ordinal/name), extras a constant
    * Key columns whose landing can't hold an injective identity fail LOUD:
    * a tinyint(1) PK lands boolean (two values — every synthetic row would
    * LWW-collapse), and non-integer non-string types (decimal/date/…) would
    * TRY-cast the synthetic value to null and trip wireKey's raise_error
    * mid-job; both are rejected up front with a clear message.
    */
  def keyValues(keys: Seq[graft.core.WireColumn], repo: String, path: String,
      pathIdxOf: String => Int, pathsPerRepo: Int): Seq[String] = {
    def repoIdx = repo.stripPrefix("repo-").toInt
    keys.zipWithIndex.map { case (k, i) =>
      val lands = graft.core.TypeMap.sparkType(k.mysqlType, treatTinyIntAsBoolean = true)
      val numeric = numericKeyType(k.mysqlType) &&
        lands != org.apache.spark.sql.types.BooleanType
      val stringy = lands == org.apache.spark.sql.types.StringType
      if (!numeric && !stringy)
        throw new IllegalArgumentException(
          s"unsupported merge-key column '${k.name} ${k.mysqlType}' for synthetic " +
            "wire generation: the key must land as an integer or string type " +
            "(boolean/decimal/temporal landings cannot carry an injective row identity)")
      (i, numeric) match {
        case (0, true) if keys.size == 1 =>
          (repoIdx.toLong * pathsPerRepo + pathIdxOf(path) + 1L).toString
        case (0, false) if keys.size == 1 => s"$repo/$path"
        case (0, true)  => (repoIdx + 1).toString
        case (0, false) => repo
        case (1, true)  => (pathIdxOf(path) + 1).toString
        case (1, false) => path
        case (_, true)  => "1"
        case (_, false) => "k"
      }
    }
  }

  /** One deterministic wire-string value for a MySQL column type — the same
    * closed-form style as the repo_profile stream (enum indexes, set
    * bitmasks, tinyint digits, zero/fractional datetimes, bare decimals),
    * keyed on the column name so sibling columns differ.
    */
  def wireValueFor(col: graft.core.WireColumn, h0: Long): String = {
    val ty = col.mysqlType.toLowerCase
    val h = EventGen.mix64(h0 ^ col.name.hashCode.toLong)
    if (ty.startsWith("enum")) {
      val n = graft.core.TypeMap.parseEnumOrSetValues(col.mysqlType).size
      pick(h, n + 2, 1).toString // 0 (empty) .. n+1 (out-of-range fallthrough)
    } else if (ty.startsWith("set")) {
      val n = math.min(graft.core.TypeMap.parseEnumOrSetValues(col.mysqlType).size, 5)
      pick(h, (1 << n) + 1, 2).toString // 0 (original) .. full mask
    } else if (ty == "tinyint(1)") pick(h, 3, 6).toString
    else if (ty.startsWith("datetime")) pick(h, 10, 3) match {
      case 0 => "0000-00-00 00:00:00"
      case d if d % 3 == 0 => f"2021-03-04 05:06:0$d%d.${pick(h, 999999, 4)}%06d"
      case d => s"2021-03-04 05:06:0$d"
    }
    else if (ty.startsWith("timestamp")) s"2025-02-14 08:08:0${pick(h, 10, 7)}"
    else if (ty.startsWith("date")) pick(h, 5, 3) match {
      case 0 => "0000-00-00"
      case d => s"2021-03-1$d"
    }
    else if (ty.startsWith("time")) f"${pick(h, 24, 7)}%02d:30:00"
    else if (ty.startsWith("year")) (1990 + pick(h, 40, 9)).toString
    else if (ty.startsWith("decimal")) Seq(".33", "-.77", "12.5", "-0.25")(pick(h, 4, 5))
    else if (numericKeyType(ty)) pick(h, 1000, 8).toString
    else if (ty.startsWith("float") || ty.startsWith("double")) s"${pick(h, 100, 10)}.5"
    else s"w-${pick(h, 100000, 11)}"
  }

  /** Full after-image (or keys-only before-image) for an arbitrary wire
    * table, column order = [[graft.core.WireTable.orderedColumns]].
    */
  def genericValues(wt: graft.core.WireTable, repo: String, path: String,
      commit: String, keysOnly: Boolean, pathIdxOf: String => Int,
      pathsPerRepo: Int): Array[String] = {
    val keyVals = keyValues(wt.orderedColumns.take(wt.keys.size), repo, path,
      pathIdxOf, pathsPerRepo)
    val h = EventGen.mix64(commit.hashCode.toLong << 32 ^ repo.hashCode ^ path.hashCode)
    val rest = wt.orderedColumns.drop(wt.keys.size)
      .map(c => if (keysOnly) null else wireValueFor(c, h))
    (keyVals ++ rest).toArray
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
