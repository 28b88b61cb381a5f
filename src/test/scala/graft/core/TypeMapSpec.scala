package graft.core

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Mirrors the reference's table-driven `TestDiscover_CanPickRightAirbyteType`
  * (`cmd/internal/planetscale_edge_database_test.go:360-503`) vector by
  * vector, plus the Spark-native type landing each MySQL type gets.
  */
class TypeMapSpec extends AnyFunSuite {

  // (mysqlType, treatTinyIntAsBoolean, nullable, expectedJsonTypes, expectedAirbyteType)
  private val referenceVectors = Seq(
    ("int(11)", false, "", Seq("number"), "integer"),
    ("smallint(4)", false, "", Seq("number"), "integer"),
    ("mediumint(8)", false, "", Seq("number"), "integer"),
    ("tinyint", true, "", Seq("number"), "integer"),
    ("tinyint(1)", true, "", Seq("boolean"), ""),
    ("tinyint(1) unsigned", true, "", Seq("boolean"), ""),
    ("tinyint(1)", false, "", Seq("number"), "integer"),
    ("tinyint(1) unsigned", false, "", Seq("number"), "integer"),
    ("bigint(16)", false, "", Seq("number"), "integer"),
    ("bigint unsigned", false, "", Seq("number"), "integer"),
    ("bigint zerofill", false, "", Seq("number"), "integer"),
    ("datetime", false, "", Seq("string"), "timestamp_without_timezone"),
    ("datetime(6)", false, "", Seq("string"), "timestamp_without_timezone"),
    ("timestamp", false, "", Seq("string"), "timestamp_with_timezone"),
    ("timestamp(6)", false, "", Seq("string"), "timestamp_with_timezone"),
    ("time", false, "", Seq("string"), "time_with_timezone"),
    ("time(6)", false, "", Seq("string"), "time_with_timezone"),
    ("date", false, "", Seq("string"), "date"),
    ("text", false, "", Seq("string"), ""),
    ("varchar(256)", false, "", Seq("string"), ""),
    ("varchar(256)", false, "YES", Seq("null", "string"), ""),
    ("decimal(12,5)", false, "", Seq("number"), ""),
    ("double", false, "", Seq("number"), ""),
    ("float(30)", false, "", Seq("number"), ""))

  test("reference type-mapping vectors (TestDiscover_CanPickRightAirbyteType)") {
    referenceVectors.foreach { case (ty, treat, nullable, jsonTypes, airbyte) =>
      val p = TypeMap.jsonSchemaType(ty, treat, nullable)
      assert(p.jsonTypes == jsonTypes, s"json types for $ty (treat=$treat)")
      assert(p.airbyteType == airbyte, s"airbyte type for $ty (treat=$treat)")
    }
  }

  test("custom formats: date-time / date / time (database.go:160-175)") {
    assert(TypeMap.jsonSchemaType("datetime", true, "").customFormat == "date-time")
    assert(TypeMap.jsonSchemaType("timestamp(6)", true, "").customFormat == "date-time")
    assert(TypeMap.jsonSchemaType("date", true, "").customFormat == "date")
    assert(TypeMap.jsonSchemaType("time(3)", true, "").customFormat == "time")
    assert(TypeMap.jsonSchemaType("varchar(10)", true, "").customFormat == "")
  }

  test("prefix dispatch is order-sensitive (datetime before date, timestamp before time)") {
    assert(TypeMap.jsonSchemaType("datetime", true, "").airbyteType == "timestamp_without_timezone")
    assert(TypeMap.jsonSchemaType("date", true, "").airbyteType == "date")
    assert(TypeMap.jsonSchemaType("timestamp", true, "").airbyteType == "timestamp_with_timezone")
    assert(TypeMap.jsonSchemaType("time", true, "").airbyteType == "time_with_timezone")
  }

  test("nullable is case-insensitive YES (database.go:186-188)") {
    assert(TypeMap.jsonSchemaType("text", true, "yes").jsonTypes == Seq("null", "string"))
    assert(TypeMap.jsonSchemaType("text", true, "NO").jsonTypes == Seq("string"))
  }

  test("spark landing types (SURVEY §1.2)") {
    assert(TypeMap.sparkType("tinyint(1)", treatTinyIntAsBoolean = true) == BooleanType)
    assert(TypeMap.sparkType("tinyint(1)", treatTinyIntAsBoolean = false) == LongType)
    assert(TypeMap.sparkType("bigint unsigned", true) == LongType)
    assert(TypeMap.sparkType("decimal(12,5)", true) == DecimalType(12, 5))
    assert(TypeMap.sparkType("decimal(8)", true) == DecimalType(8, 0))
    assert(TypeMap.sparkType("double", true) == DoubleType)
    assert(TypeMap.sparkType("datetime(6)", true) == TimestampNTZType)
    assert(TypeMap.sparkType("timestamp", true) == TimestampType)
    assert(TypeMap.sparkType("date", true) == DateType)
    assert(TypeMap.sparkType("time(6)", true) == StringType) // Spark has no time-of-day type
    assert(TypeMap.sparkType("mediumblob", true) == BinaryType)
    assert(TypeMap.sparkType("json", true) == StringType)
    assert(TypeMap.sparkType("enum('a','b')", true) == StringType)
  }

  test("structField carries nullability") {
    val f = TypeMap.structField("c", "varchar(256)", treatTinyIntAsBoolean = true, "YES")
    assert(f == StructField("c", StringType, nullable = true))
    assert(!TypeMap.structField("c", "bigint", true, "NO").nullable)
  }
}
