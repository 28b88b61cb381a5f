package graft.core

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Cast, EvalMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One column of a wire-typed source table: the name plus the MySQL column
  * type DDL the reference's discovery reads from `information_schema`
  * (`planetscale_edge_database.go:97-136`). The DDL drives BOTH per-value
  * normalization (`Normalize.parseValue`, the reference's `parseValue`
  * switch) and the Spark landing type (`TypeMap.sparkType`).
  */
final case class WireColumn(name: String, mysqlType: String, nullable: String = "YES")

/** Column spec of a wire-typed changelog stream — values arrive as raw MySQL
  * wire STRINGS (the shape a real VStream delivers) and land NORMALIZED and
  * TYPED in the lake table. This is what wires the `Normalize` family into
  * the ingest path: `CdcApply.applyBatch` runs `normalizedLanding` on every
  * after-image column before staging, the analogue of the reference calling
  * `parseValue` on every synced row (`types.go:139-164`).
  *
  * Key columns: LWW dedup groups on the WIRE form of the key (MySQL sends
  * canonical digit strings, so equal keys have equal wire forms); bucketing
  * and landing use the TYPED form, consistently on both the staging and the
  * survivor-rewrite sides.
  */
object WireTableSpec {
  /** The engine's canonical wire-typed stream: the repo-content key plus the
    * MySQL-typed profile columns the `graft-changelog` source serves when
    * `wirePayload=true` (and the `cdc_normalized_ingest` oracle exercises).
    */
  val repoProfile: WireTableSpec = WireTableSpec(Seq(
    WireColumn("repo", "varchar(64)", "NO"),
    WireColumn("path", "varchar(128)", "NO"),
    WireColumn("status", "enum('active','inactive','archived')"),
    WireColumn("locations",
      "set('San Francisco','New York','London','San Jose','Oakland')"),
    WireColumn("verified", "tinyint(1)"),
    WireColumn("created_at", "datetime"),
    WireColumn("updated_at", "timestamp"),
    WireColumn("balance", "decimal(10,2)"),
    WireColumn("stars", "bigint")))
}

/** A fully-described wire-typed source table: name + merge-key columns +
  * column triples — exactly one `tables[]` entry of a `discover --columns`
  * spec, so DISCOVERY OUTPUT DRIVES INGEST (the reference's discover→read
  * loop: `GetTableSchema` feeds the sync's `parseValue` dispatch). Key
  * columns are reordered to the FRONT of the column list (the engine's merge
  * key = leading field ids 1..k); the rest keep information_schema order.
  */
final case class WireTable(name: String, keys: Seq[String], columns: Seq[WireColumn]) {
  require(keys.nonEmpty, s"table $name: at least one primary-key column required")
  keys.foreach(k => require(columns.exists(_.name == k),
    s"table $name: primary key '$k' is not a column"))

  /** Columns with the merge keys first (landing field ids 1..k = keys). */
  def orderedColumns: Seq[WireColumn] =
    keys.map(k => columns.find(_.name == k).get) ++ columns.filterNot(c => keys.contains(c.name))

  def spec: WireTableSpec = WireTableSpec(orderedColumns)

  def toJson: String = {
    val n = WireTable.mapper.createObjectNode()
    n.put("name", name)
    val ks = n.putArray("primary_keys"); keys.foreach(ks.add)
    val cs = n.putArray("columns")
    columns.foreach { c =>
      val cn = cs.addObject()
      cn.put("name", c.name); cn.put("type", c.mysqlType); cn.put("nullable", c.nullable)
    }
    WireTable.mapper.writeValueAsString(n)
  }
}

object WireTable {
  private[core] val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** The single DiscoveredTable → WireTable conversion (discover output
    * drives ingest; keep callers from hand-rolling drifting copies).
    */
  def from(t: Discover.DiscoveredTable): WireTable =
    WireTable(t.name, t.primaryKeys,
      t.columns.map(c => WireColumn(c.name, c.mysqlType, c.nullable)))

  /** Round-trips [[WireTable.toJson]]; a `tables[]` entry of a
    * `discover --columns` spec parses too (same fields, same parser —
    * [[Discover.parseTableEntry]], so the two can't drift). Missing or
    * explicitly-null name/type fail loud — a silently defaulted table name
    * would key cursors under the wrong state key and re-ingest from
    * scratch on resume.
    */
  def fromJson(json: String): WireTable =
    from(Discover.parseTableEntry(mapper.readTree(json)))
}

final case class WireTableSpec(
    columns: Seq[WireColumn],
    treatTinyIntAsBoolean: Boolean = true) {

  private val byName: Map[String, WireColumn] = columns.map(c => c.name -> c).toMap

  /** The lake table's typed landing schema (field ids 1..n in column order;
    * the first two columns are the merge key).
    */
  def landingSchema: StructType = StructType(columns.map(c =>
    TypeMap.structField(c.name, c.mysqlType, treatTinyIntAsBoolean, c.nullable)))

  /** The event payload schema: every column a raw wire string. */
  def wireRowSchema: StructType =
    StructType(columns.map(c => StructField(c.name, StringType, nullable = true)))

  /** Reference `parseValue` for one named column (no-op for columns not in
    * the spec, e.g. engine metadata).
    */
  def normalize(name: String, c: Column): Column = byName.get(name) match {
    case Some(wc) =>
      graft.functions.Normalize.parseValue(c, wc.mysqlType, treatTinyIntAsBoolean)
    case None => c
  }

  /** TRY-mode Catalyst cast: null on malformed AND on out-of-range values
    * (a regex guard alone still throws under ANSI on an in-format overflow,
    * e.g. an unsigned-bigint max into LongType).
    */
  private def tryCast(c: Column, to: DataType): Column =
    GraftBridge.column(Cast(GraftBridge.expression(c), to, None, EvalMode.TRY))

  /** Normalize + cast one wire-string column to its typed landing column.
    * NULL-safe under ANSI mode by contract — a malformed OR unrepresentable
    * value lands null, it never fails a 100-TB job: scalars go through a
    * TRY-mode Catalyst cast, temporal columns through `try_to_timestamp`
    * with an optional-fraction section (datetime(1..6) variants parse).
    * BooleanType landings (any `tinyint(1)` variant per discovery's PREFIX
    * rule) convert from the raw wire digit here — `parseValue` itself keeps
    * the reference's exact-equality quirk, which would otherwise land a raw
    * string in a boolean column for `tinyint(1) unsigned`.
    */
  def normalizedLanding(name: String, c: Column): Column = {
    val target = byName.get(name)
      .map(wc => TypeMap.sparkType(wc.mysqlType, treatTinyIntAsBoolean))
      .getOrElse(StringType)
    target match {
      case BooleanType => graft.functions.Normalize.tinyintBoolWire(c)
      case StringType  => normalize(name, c)
      case TimestampNTZType => // normalized ISO, no offset (formatISO8601)
        try_to_timestamp(normalize(name, c),
          lit("yyyy-MM-dd'T'HH:mm:ss[.SSSSSS]")).cast(TimestampNTZType)
      case TimestampType => // TIMESTAMP passes through raw (wire layout)
        try_to_timestamp(c, lit("yyyy-MM-dd HH:mm:ss[.SSSSSS]"))
      case DateType =>
        try_to_timestamp(normalize(name, c), lit("yyyy-MM-dd")).cast(DateType)
      case other => tryCast(normalize(name, c), other)
    }
  }
}
