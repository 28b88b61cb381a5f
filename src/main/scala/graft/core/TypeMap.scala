package graft.core

import org.apache.spark.sql.types._

/** JSON-schema / Airbyte property type of one discovered column — shape of
  * the reference's `PropertyType{Type, CustomFormat, AirbyteType}`
  * (`cmd/internal/types.go:56-70`).
  */
final case class PropertyType(jsonTypes: Seq[String], customFormat: String, airbyteType: String)

/** MySQL column-type → engine-type discovery mapping — the semantics of the
  * reference's `getJsonSchemaType` (`cmd/internal/planetscale_edge_database
  * .go:138-191`), exhaustively covered there by the table-driven
  * `TestDiscover_CanPickRightAirbyteType`
  * (`planetscale_edge_database_test.go:360-503`) and mirrored here in
  * `TypeMapSpec`. Every discovery of a NEW source table flows through this:
  * prefix dispatch is ORDER-SENSITIVE (`datetime` before `date`,
  * `timestamp` before `time`), `tinyint(1)` is boolean unless the
  * `do_not_treat_tiny_int_as_boolean` option is set
  * (`planetscale_connection.go:30-32`), and a nullable column becomes the
  * JSON-schema union `["null", T]`.
  */
object TypeMap {

  /** Exact `getJsonSchemaType` semantics. `nullable` is the
    * information_schema `IS_NULLABLE` string ("YES"/"NO", case-insensitive).
    */
  def jsonSchemaType(mysqlType: String, treatTinyIntAsBoolean: Boolean,
      nullable: String): PropertyType = {
    val (jsonType, customFormat, airbyteType) =
      if (mysqlType.startsWith("tinyint(1)")) {
        if (treatTinyIntAsBoolean) ("boolean", "", "")
        else ("number", "", "integer")
      } else if (Seq("int", "smallint", "mediumint", "bigint", "tinyint")
          .exists(mysqlType.startsWith)) ("number", "", "integer")
      else if (Seq("decimal", "double", "float").exists(mysqlType.startsWith))
        ("number", "", "")
      else if (mysqlType.startsWith("datetime"))
        ("string", "date-time", "timestamp_without_timezone")
      else if (mysqlType.startsWith("timestamp"))
        ("string", "date-time", "timestamp_with_timezone")
      else if (mysqlType.startsWith("date")) ("string", "date", "date")
      else if (mysqlType.startsWith("time")) ("string", "time", "time_with_timezone")
      else ("string", "", "")
    val types =
      if (nullable.toLowerCase == "yes") Seq("null", jsonType) else Seq(jsonType)
    PropertyType(types, customFormat, airbyteType)
  }

  /** Exact mirror of the reference's `parseEnumOrSetValues`
    * (`cmd/internal/types.go:260-282`): take an `enum('a','b')` / `set(...)`
    * column-type DDL and return the label list. Faithfully byte-compatible,
    * including the reference's quirks — greedy paren match, naive
    * comma-split (a label containing a comma splits), quote-trim only (inner
    * whitespace survives), and a type with no parens yields one empty label.
    */
  def parseEnumOrSetValues(columnType: String): Seq[String] = {
    def trimChar(s: String, ch: Char): String =
      s.dropWhile(_ == ch).reverse.dropWhile(_ == ch).reverse
    val res0 = "\\((.+)\\)".r.findFirstIn(columnType).getOrElse("")
    val res = trimChar(trimChar(res0, '('), ')')
    res.split(",", -1).toSeq.map(trimChar(_, '\''))
  }

  private val DecimalRe = """decimal\((\d+)\s*,\s*(\d+)\).*""".r
  private val DecimalPrecRe = """decimal\((\d+)\).*""".r

  /** The Spark-native type each MySQL type lands as in the lake table
    * (SURVEY.md §1.2 right-hand column): integers widen to LongType,
    * DATETIME (no offset) → TimestampNTZType vs TIMESTAMP (UTC-normalized)
    * → TimestampType, TIME → StringType (Spark has no time-of-day type),
    * blob/binary → BinaryType, everything else → StringType.
    */
  def sparkType(mysqlType: String, treatTinyIntAsBoolean: Boolean): DataType =
    if (mysqlType.startsWith("tinyint(1)"))
      if (treatTinyIntAsBoolean) BooleanType else LongType
    else if (Seq("int", "smallint", "mediumint", "bigint", "tinyint")
        .exists(mysqlType.startsWith)) LongType
    else if (mysqlType.startsWith("decimal")) mysqlType match {
      case DecimalRe(p, s) => DecimalType(p.toInt, s.toInt)
      case DecimalPrecRe(p) => DecimalType(p.toInt, 0)
      case _ => DecimalType(10, 0) // MySQL default precision
    }
    else if (Seq("double", "float").exists(mysqlType.startsWith)) DoubleType
    else if (mysqlType.startsWith("datetime")) TimestampNTZType
    else if (mysqlType.startsWith("timestamp")) TimestampType
    else if (mysqlType.startsWith("date")) DateType
    else if (Seq("blob", "tinyblob", "mediumblob", "longblob", "binary", "varbinary")
        .exists(mysqlType.startsWith)) BinaryType
    else StringType

  /** One discovered column → Spark StructField + its JSON-schema property. */
  def structField(name: String, mysqlType: String, treatTinyIntAsBoolean: Boolean,
      nullable: String): StructField =
    StructField(name, sparkType(mysqlType, treatTinyIntAsBoolean),
      nullable = nullable.toLowerCase == "yes")
}
