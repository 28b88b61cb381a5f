package graft.core

import org.apache.spark.sql.Column
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
  */
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

  /** Normalize + cast one wire-string column to its typed landing column.
    * Casts are NULL-safe under ANSI mode (a malformed value lands null, it
    * never fails a 100-TB job): numeric/decimal casts are regex-guarded,
    * temporal casts go through `try_to_timestamp` on the exact post-
    * normalization layout.
    */
  def normalizedLanding(name: String, c: Column): Column = {
    val n = normalize(name, c)
    val target = byName.get(name)
      .map(wc => TypeMap.sparkType(wc.mysqlType, treatTinyIntAsBoolean))
      .getOrElse(StringType)
    target match {
      case StringType  => n
      case BooleanType => n // tinyint(1): parseValue already yielded boolean
      case LongType    => when(n.rlike("^-?[0-9]+$"), n.cast(LongType))
      case _: DecimalType =>
        when(n.rlike("^-?[0-9]+(\\.[0-9]+)?$"), n.cast(target))
      case DoubleType =>
        when(n.rlike("^-?[0-9]*\\.?[0-9]+([eE][+-]?[0-9]+)?$"), n.cast(DoubleType))
      case TimestampNTZType => // normalized ISO, no offset (formatISO8601)
        try_to_timestamp(n, lit("yyyy-MM-dd'T'HH:mm:ss.SSSSSS")).cast(TimestampNTZType)
      case TimestampType => // TIMESTAMP passes through raw (wire layout)
        try_to_timestamp(n, lit("yyyy-MM-dd HH:mm:ss"))
      case DateType => try_to_timestamp(n, lit("yyyy-MM-dd")).cast(DateType)
      case BinaryType => n.cast(BinaryType)
      case _ => n.cast(target)
    }
  }
}
