package graft.core

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode
import java.util.Base64
import scala.jdk.CollectionConverters._

/** Per-(keyspace, shard) replication cursor — the analogue of the reference's
  * `TableCursor{shard, keyspace, position, last_known_pk}`
  * (`proto/psdbconnect.v1alpha1.proto:36-41`). `position` is a serialized
  * [[VGtid]]; `lastPk` is the COPY-phase watermark (present only mid-snapshot).
  */
final case class ShardCursor(
    keyspace: String,
    shard: String,
    position: String,
    lastPk: Option[LastPk]) {

  def vgtid: VGtid = VGtid.parse(position)

  /** The reference serializes cursors protobuf→base64
    * (`cmd/internal/types.go:112-137`); we serialize JSON→base64 with the
    * same round-trip invariant (tested like `types_test.go:15-79`).
    */
  def serialized: String =
    Base64.getEncoder.encodeToString(CursorJson.toJson(this).getBytes("UTF-8"))

  /** Copy-phase resume rule (`planetscale_edge_database.go:312-314`): a
    * cursor holding a LastKnownPk clears its GTID position before the next
    * sync — the COPY continues purely from the PK watermark — unless the
    * `use_gtid_with_table_pks` option keeps both.
    */
  def forResume(useGtidWithTablePks: Boolean): ShardCursor =
    if (lastPk.nonEmpty && !useGtidWithTablePks) copy(position = "") else this
}

object ShardCursor {
  def blank(keyspace: String, shard: String): ShardCursor =
    ShardCursor(keyspace, shard, "", None)

  def deserialize(b64: String): ShardCursor =
    CursorJson.fromJson(new String(Base64.getDecoder.decode(b64), "UTF-8"))
}

/** Per-shard batch statistics: the end cursor (batch-current position the
  * reference stamps into metadata, `planetscale_edge_database.go:437-450`),
  * processed row count, and the (prev, end] vgtid lineage range.
  */
final case class ShardStats(cursor: ShardCursor, rows: Long, vgtidStart: String, vgtidEnd: String)

/** Full sync state: `streams: {"<keyspace>:<table>": {shards: {"-80": cursor}}}`
  * — shape of the reference's `SyncState`/`ShardStates`
  * (`cmd/internal/types.go:100-110`, key construction `read.go:108`).
  */
final case class SyncState(streams: Map[String, Map[String, ShardCursor]]) {

  def cursorFor(stateKey: String, shard: String): Option[ShardCursor] =
    streams.get(stateKey).flatMap(_.get(shard))

  def updated(stateKey: String, cursor: ShardCursor): SyncState = {
    val shardMap = streams.getOrElse(stateKey, Map.empty)
    SyncState(streams.updated(stateKey, shardMap.updated(cursor.shard, cursor)))
  }

  def toJson: String = CursorJson.stateToJson(this)
}

object SyncState {
  val empty: SyncState = SyncState(Map.empty)

  def fromJson(json: String): SyncState = CursorJson.stateFromJson(json)

  /** Initial state per the reference's precedence rules
    * (`cmd/airbyte-source/read.go:151-184`, `planetscale_connection.go:61-116`):
    * an explicit state file always beats `starting_gtids`; missing cursors get
    * blanks (or the starting-GTID override for that keyspace/shard).
    */
  def initial(
      stateKey: String,
      keyspace: String,
      shards: Seq[String],
      startingGtids: Map[String, Map[String, String]] = Map.empty,
      prior: SyncState = SyncState.empty): SyncState =
    shards.foldLeft(prior) { (st, shard) =>
      st.cursorFor(stateKey, shard) match {
        case Some(_) => st // state beats starting_gtids
        case None =>
          val pos = startingGtids.getOrElse(keyspace, Map.empty).getOrElse(shard, "")
          st.updated(stateKey, ShardCursor(keyspace, shard, pos, None))
      }
    }

  /** The reference's `readState` (`cmd/airbyte-source/read.go:151-184`):
    * materialize state for a configured catalog. Per stream, the prior state
    * wins ONLY when present AND incremental sync is requested; a missing
    * cursor — or any non-incremental mode (`full_refresh`, `append` = cursor
    * reset) — installs fresh initial cursors (blank, or the `starting_gtids`
    * override for that keyspace/shard), REPLACING whatever was there.
    */
  def readState(
      prior: SyncState,
      streams: Seq[ConfiguredStream],
      shards: Seq[String],
      startingGtids: Map[String, Map[String, String]] = Map.empty): SyncState =
    streams.foldLeft(prior) { (st, s) =>
      val missing = !st.streams.contains(s.stateKey)
      if (missing || !s.incrementalSyncRequested) {
        val fresh = shards.map { sh =>
          val pos = startingGtids.getOrElse(s.namespace, Map.empty).getOrElse(sh, "")
          sh -> ShardCursor(s.namespace, sh, pos, None)
        }.toMap
        SyncState(st.streams.updated(s.stateKey, fresh))
      } else st
    }
}

/** Hand-rolled (jackson-databind, ships with Spark) JSON serde for cursors —
  * kept out of the hot path; used only at micro-batch boundaries.
  */
private[core] object CursorJson {
  private val mapper = new ObjectMapper()

  def toJson(c: ShardCursor): String = {
    val n = mapper.createObjectNode()
    n.put("keyspace", c.keyspace)
    n.put("shard", c.shard)
    n.put("position", c.position)
    c.lastPk.foreach { pk =>
      val p = n.putObject("last_known_pk")
      p.put("repo", pk.repo)
      p.put("path", pk.path)
    }
    mapper.writeValueAsString(n)
  }

  def fromJson(s: String): ShardCursor = {
    val n = mapper.readTree(s)
    val pk = Option(n.get("last_known_pk")).map { p =>
      LastPk(p.get("repo").asText(), p.get("path").asText())
    }
    ShardCursor(n.get("keyspace").asText(), n.get("shard").asText(),
      Option(n.get("position")).map(_.asText()).getOrElse(""), pk)
  }

  private def cursorNode(c: ShardCursor): ObjectNode =
    mapper.readTree(toJson(c)).asInstanceOf[ObjectNode]

  def stateToJson(st: SyncState): String = {
    val root = mapper.createObjectNode()
    val streams = root.putObject("streams")
    st.streams.toSeq.sortBy(_._1).foreach { case (key, shardMap) =>
      val sNode = streams.putObject(key).putObject("shards")
      shardMap.toSeq.sortBy(_._1).foreach { case (shard, cur) =>
        sNode.set[JsonNode](shard, cursorNode(cur))
      }
    }
    mapper.writeValueAsString(root)
  }

  def stateFromJson(json: String): SyncState = {
    val root = mapper.readTree(json)
    val streamsNode = Option(root.get("streams")).getOrElse(mapper.createObjectNode())
    val streams = streamsNode.properties().asScala.map { e =>
      val shardsNode = e.getValue.get("shards")
      val shards = shardsNode.properties().asScala.map { se =>
        se.getKey -> fromJson(mapper.writeValueAsString(se.getValue))
      }.toMap
      e.getKey -> shards
    }.toMap
    SyncState(streams)
  }
}
