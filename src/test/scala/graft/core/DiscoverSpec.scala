package graft.core

import org.scalatest.funsuite.AnyFunSuite
import scala.io.Source

/** Golden-catalog discovery over arbitrary tables — the engine's analogue of
  * the reference's e2e full-catalog compare (`cmd/e2e/e2e_test.go:35-56`
  * against the Sakila fixture): a Sakila-derived column-spec (the
  * information_schema (column_name, column_type, is_nullable) triples) must
  * produce a byte-identical Airbyte-shaped catalog.
  */
class DiscoverSpec extends AnyFunSuite {

  private def resource(name: String): String = {
    val in = getClass.getResourceAsStream(s"/$name")
    require(in != null, s"missing test resource $name")
    try Source.fromInputStream(in, "UTF-8").mkString finally in.close()
  }

  private val tables = Discover.parseColumnSpec(resource("sakila_columns.json"))

  test("sakila column-spec catalog matches the golden byte-for-byte") {
    val got = Discover.catalogJson(tables, keyspace = "sakila",
      shards = graft.genlog.ChangelogGen.shardNames(2))
    assert(got == resource("sakila_catalog_golden.json").trim)
  }

  test("vitess-internal GC/vreplication tables are filtered from discovery (A9)") {
    assert(tables.exists(_.name.startsWith("_vt_HOLD")), "fixture must contain GC tables")
    val got = Discover.catalogJson(tables, "sakila", Seq("-"))
    assert(!got.contains("_vt_HOLD") && !got.contains("_gho"))
  }

  test("default cursor field is the LAST primary-key column (database.go:129-132); " +
    "a table with no PK gets empty arrays") {
    val t = Seq(Discover.DiscoveredTable("multi", Seq("a", "b"),
      Seq(Discover.DiscoveredColumn("a", "int(11)", "NO"),
        Discover.DiscoveredColumn("b", "int(11)", "NO"))),
      Discover.DiscoveredTable("view_no_pk", Nil,
        Seq(Discover.DiscoveredColumn("x", "text", "YES"))))
    val got = Discover.catalogJson(t, "ks", Seq("-"))
    assert(got.contains(""""source_defined_primary_key":[["a"],["b"]],"source_defined_cursor":true,"default_cursor_field":["b"]"""))
    assert(got.contains(""""source_defined_primary_key":[],"source_defined_cursor":true,"default_cursor_field":[]"""))
  }

  test("do_not_treat_tiny_int_as_boolean + include_metadata flow through discovery") {
    val t = Seq(Discover.DiscoveredTable("s", Seq("id"),
      Seq(Discover.DiscoveredColumn("id", "int(11)", "NO"),
        Discover.DiscoveredColumn("flag", "tinyint(1)", "NO"))))
    val boolCat = Discover.catalogJson(t, "ks", Seq("-"))
    assert(boolCat.contains(""""flag":{"type":["boolean"]}"""))
    val optOut = Discover.catalogJson(t, "ks", Seq("-"), treatTinyIntAsBoolean = false)
    assert(optOut.contains(""""flag":{"type":["number"],"airbyte_type":"integer"}"""))
    val withMeta = Discover.catalogJson(t, "ks", Seq("-"), includeMetadata = true)
    assert(withMeta.contains("_graft_vgtid") && withMeta.contains("_graft_extracted_at"))
  }
}
