package graft.core

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import scala.jdk.CollectionConverters._

/** Catalog discovery over ARBITRARY tables — the reference's `discover` verb
  * (`getStreamForTable` + `GetTableSchema`,
  * `planetscale_edge_database.go:97-136` / `planetscale_edge_mysql.go:
  * 160-205`): each table's information_schema columns (name, MySQL type DDL,
  * nullability) map through [[TypeMap.jsonSchemaType]] into an Airbyte-shaped
  * stream — `json_schema` properties, `source_defined_primary_key`,
  * `default_cursor_field` = last PK column, sync modes, namespace — and
  * Vitess-internal GC/vreplication tables are filtered out
  * (`planetscale_edge_mysql.go:116-158`).
  *
  * Input here is a column-spec JSON (the engine has no live
  * information_schema): `{"tables":[{"name":…,"primary_keys":[…],
  * "columns":[{"name":…,"type":…,"nullable":"YES"|"NO"}]}]}` — the exact
  * triple the reference's `select column_name, column_type, is_nullable`
  * returns. Output is golden-compared like the reference's e2e full-catalog
  * test (`cmd/e2e/e2e_test.go:35-56`, Sakila fixture).
  */
object Discover {

  final case class DiscoveredColumn(name: String, mysqlType: String, nullable: String)
  final case class DiscoveredTable(name: String, primaryKeys: Seq[String],
      columns: Seq[DiscoveredColumn])

  private val mapper = new ObjectMapper()

  /** Required string field — absent AND explicit-null both fail loud (a
    * JSON `null` must not silently become the string "null": a table named
    * "null" would key cursors under the wrong state key).
    */
  private def req(n: com.fasterxml.jackson.databind.JsonNode, field: String,
      where: String): String =
    Option(n.get(field)).filterNot(_.isNull).map(_.asText()).getOrElse(
      throw new IllegalArgumentException(
        s"column-spec $where is missing required field '$field'"))

  /** One `tables[]` entry → DiscoveredTable — THE parser for the
    * {name, primary_keys, columns[{name,type,nullable}]} shape (also backs
    * [[WireTable.fromJson]], so the two can't drift).
    */
  def parseTableEntry(t: com.fasterxml.jackson.databind.JsonNode): DiscoveredTable = {
    val tname = req(t, "name", "table entry")
    val cols = Option(t.get("columns")).map(_.elements().asScala.toSeq).getOrElse(Nil).map { c =>
      DiscoveredColumn(req(c, "name", s"column of table '$tname'"),
        req(c, "type", s"column of table '$tname'"),
        Option(c.get("nullable")).filterNot(_.isNull).map(_.asText()).getOrElse("YES"))
    }
    val pks = Option(t.get("primary_keys")).map(_.elements().asScala.toSeq.map(_.asText()))
      .getOrElse(Nil)
    DiscoveredTable(tname, pks, cols)
  }

  def parseColumnSpec(json: String): Seq[DiscoveredTable] = {
    val root = mapper.readTree(json)
    Option(root.get("tables")).map(_.elements().asScala.toSeq).getOrElse(Nil)
      .map(parseTableEntry)
  }

  private def propertyNode(p: PropertyType): ObjectNode = {
    val n = mapper.createObjectNode()
    val types = n.putArray("type")
    p.jsonTypes.foreach(types.add)
    if (p.customFormat.nonEmpty) n.put("format", p.customFormat)
    if (p.airbyteType.nonEmpty) n.put("airbyte_type", p.airbyteType)
    n
  }

  /** One table → one Airbyte-shaped stream node (reference `Stream` JSON
    * shape, `types.go:32-40`). With `includeMetadata`, the engine's three
    * flat `_graft_*` provenance columns are injected into the schema (the
    * reference injects a single `_planetscale_metadata` object property —
    * this engine lands provenance as flat typed columns instead).
    *
    * Known byte-level deviation from the reference Stream shape: each stream
    * carries an extra `shards` array (the engine surfaces shard topology at
    * discovery; the reference does not). Tolerant JSON consumers ignore it;
    * strict golden comparisons against reference output must drop the field.
    */
  private def streamNode(t: DiscoveredTable, keyspace: String, shards: Seq[String],
      treatTiny: Boolean, includeMetadata: Boolean): ObjectNode = {
    val s = mapper.createObjectNode()
    s.put("name", t.name)
    val schema = s.putObject("json_schema")
    schema.put("type", "object")
    val props = schema.putObject("properties")
    t.columns.foreach { c =>
      props.set[ObjectNode](c.name,
        propertyNode(TypeMap.jsonSchemaType(c.mysqlType, treatTiny, c.nullable)))
    }
    if (includeMetadata) {
      props.set[ObjectNode]("_graft_vgtid",
        propertyNode(PropertyType(Seq("null", "string"), "", "")))
      props.set[ObjectNode]("_graft_seq",
        propertyNode(PropertyType(Seq("null", "number"), "", "integer")))
      props.set[ObjectNode]("_graft_extracted_at",
        propertyNode(PropertyType(Seq("null", "string"), "date-time",
          "timestamp_with_timezone")))
    }
    val modes = s.putArray("supported_sync_modes")
    modes.add("full_refresh"); modes.add("incremental")
    s.put("namespace", keyspace)
    val pks = s.putArray("source_defined_primary_key")
    t.primaryKeys.foreach(k => pks.addArray().add(k))
    s.put("source_defined_cursor", true)
    val cursor = s.putArray("default_cursor_field")
    t.primaryKeys.lastOption.foreach(cursor.add) // last PK (database.go:129-132)
    val sh = s.putArray("shards")
    shards.foreach(sh.add)
    s
  }

  /** The full catalog JSON: GC/vreplication-internal tables dropped (A9),
    * remaining tables in input (information_schema) order.
    */
  def catalogJson(tables: Seq[DiscoveredTable], keyspace: String, shards: Seq[String],
      treatTinyIntAsBoolean: Boolean = true, includeMetadata: Boolean = false): String = {
    val root = mapper.createObjectNode()
    val streams: ArrayNode = root.putArray("streams")
    tables
      .filterNot(t => t.name.matches(graft.functions.Normalize.gcTablePattern))
      .foreach(t => streams.add(
        streamNode(t, keyspace, shards, treatTinyIntAsBoolean, includeMetadata)))
    mapper.writeValueAsString(root)
  }
}
