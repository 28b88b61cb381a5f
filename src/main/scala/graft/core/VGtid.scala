package graft.core

/** MySQL56 GTID-set position algebra.
  *
  * Semantics of the reference's position comparison
  * (`cmd/internal/planetscale_edge_database.go:617-652`, which delegates to
  * `vitess/go/mysql.DecodePosition`): a position is a *set* of transaction
  * intervals per server UUID, and ordering is subset/superset containment —
  * NOT lexicographic string comparison. `positionAfter(a,b)` in the reference
  * is `!a.Equal(b) && a.AtLeast(b)`; we reproduce that here as pure Scala so
  * it can run inside source offset planning on the driver and inside Catalyst
  * expressions on executors.
  *
  * Canonical textual form: `MySQL56/<uuid>:<i>-<j>[:<k>-<l>...][,<uuid2>:...]`
  * with UUIDs sorted lexicographically and intervals sorted + coalesced.
  */
final case class VGtid(sets: Map[String, Vector[(Long, Long)]]) {

  /** True iff this position contains every transaction in `other`. */
  def atLeast(other: VGtid): Boolean =
    other.sets.forall { case (uuid, theirs) =>
      sets.get(uuid) match {
        case None => theirs.isEmpty
        case Some(ours) =>
          theirs.forall { case (s, e) =>
            // ours is sorted+coalesced: one interval must cover [s,e]
            ours.exists { case (os, oe) => os <= s && e <= oe }
          }
      }
    }

  def positionEqual(other: VGtid): Boolean = sets == other.sets

  /** Reference `positionAfter`: strictly-greater in containment order. */
  def after(other: VGtid): Boolean = !positionEqual(other) && atLeast(other)

  /** Record one more transaction for a server UUID (binlog advance). */
  def advance(uuid: String, seq: Long): VGtid =
    VGtid(sets.updated(uuid, VGtid.coalesce(sets.getOrElse(uuid, Vector.empty) :+ (seq, seq))))

  /** Set-union of two positions (used when merging per-shard cursors). */
  def union(other: VGtid): VGtid =
    VGtid((sets.keySet ++ other.sets.keySet).map { u =>
      u -> VGtid.coalesce(sets.getOrElse(u, Vector.empty) ++ other.sets.getOrElse(u, Vector.empty))
    }.toMap)

  def isEmpty: Boolean = sets.isEmpty || sets.values.forall(_.isEmpty)

  /** Canonical serialization, stable across round-trips. */
  def serialize: String =
    if (isEmpty) ""
    else
      "MySQL56/" + sets.toVector.filter(_._2.nonEmpty).sortBy(_._1).map { case (u, iv) =>
        u + ":" + iv.map { case (s, e) => if (s == e) s.toString else s"$s-$e" }.mkString(":")
      }.mkString(",")

  override def toString: String = serialize
}

object VGtid {
  val empty: VGtid = VGtid(Map.empty)

  /** Reference `positionEqual` at the STRING level
    * (`planetscale_edge_database.go:617-633`): a blank or malformed position
    * is never equal to anything — including another blank. (The set algebra
    * above keeps `empty.positionEqual(empty) == true`, the mathematical
    * view; engine code comparing cursor strings uses these guards.)
    */
  def positionEqual(a: String, b: String): Boolean =
    a.nonEmpty && b.nonEmpty && (
      try parse(a).positionEqual(parse(b))
      catch { case _: IllegalArgumentException => false })

  /** Reference `positionAfter` (`:636-652`): false when either side is
    * blank or malformed; otherwise strictly-greater containment.
    */
  def positionAfter(a: String, b: String): Boolean =
    a.nonEmpty && b.nonEmpty && (
      try parse(a).after(parse(b))
      catch { case _: IllegalArgumentException => false })

  /** Sort and coalesce intervals; adjacent/overlapping intervals merge. */
  def coalesce(iv: Vector[(Long, Long)]): Vector[(Long, Long)] = {
    val sorted = iv.filter { case (s, e) => s <= e }.sortBy(_._1)
    sorted.foldLeft(Vector.empty[(Long, Long)]) { case (acc, (s, e)) =>
      acc.lastOption match {
        case Some((ps, pe)) if s <= pe + 1 => acc.init :+ (ps, math.max(pe, e))
        case _                             => acc :+ (s, e)
      }
    }
  }

  /** Parse `MySQL56/uuid:1-5:8,uuid2:3` (flavor prefix optional, "" = empty).
    * Throws IllegalArgumentException on malformed input, mirroring the
    * reference's DecodePosition error path.
    */
  def parse(s: String): VGtid = {
    val body0 = s.trim
    if (body0.isEmpty) return empty
    val body = body0.indexOf('/') match {
      case -1 => body0
      case i =>
        val flavor = body0.substring(0, i)
        require(flavor == "MySQL56", s"unsupported GTID flavor: $flavor")
        body0.substring(i + 1)
    }
    if (body.isEmpty) return empty
    val sets = body.split(',').map { part =>
      val pieces = part.trim.split(':')
      require(pieces.length >= 2, s"malformed GTID set: $part")
      val uuid = pieces.head
      require(uuid.nonEmpty, s"empty server UUID in: $part")
      val intervals = pieces.tail.toVector.map { r =>
        r.split('-') match {
          case Array(a)    => (a.toLong, a.toLong)
          case Array(a, b) => (a.toLong, b.toLong)
          case _           => throw new IllegalArgumentException(s"malformed interval: $r")
        }
      }
      uuid -> coalesce(intervals)
    }
    // same UUID may appear twice in sloppy inputs: union them
    VGtid(sets.groupBy(_._1).map { case (u, vs) => u -> coalesce(vs.flatMap(_._2).toVector) })
  }

  /** Total order usable as a SQL-sortable rank for single-writer shards:
    * the max transaction id across UUIDs. Only a *rank* (for LWW windows
    * within one shard where the UUID set is fixed); containment (`atLeast`)
    * remains the authoritative comparison.
    */
  def rank(s: String): Long = {
    val g = parse(s)
    if (g.isEmpty) 0L else g.sets.values.flatten.map(_._2).max
  }
}
