package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** MySQL value normalization — the reference's per-value decode rules
  * (`cmd/internal/types.go:139-386`, SURVEY.md §1.3), re-expressed as
  * codegen-friendly Column expressions (no Scala UDFs).
  */
object Normalize {

  /** ENUM index → label (`types.go:363-386`): post-COPY events carry the
    * 1-based index ("1" → first label); "0" → ""; a non-numeric value is
    * already the label and passes through; out-of-range index → "".
    */
  def mysqlEnum(c: Column, labels: Seq[String]): Column = {
    val lab = array(labels.map(lit): _*)
    when(c.rlike("^[0-9]+$"),
      when(c === "0", lit(""))
        .otherwise(coalesce(try_element_at(lab, c.cast("int")), lit(""))))
      .otherwise(c)
  }

  /** SET bitmask → comma-joined labels (`types.go:334-361`): decimal value's
    * bit i selects labels(i); non-numeric passes through. Test vector from
    * the reference: 24 over {SF,NY,London,San Jose,Oakland} → "San Jose,Oakland"
    * (`types_test.go:84,106`).
    */
  def mysqlSet(c: Column, labels: Seq[String]): Column = {
    val lab = array(labels.map(lit): _*)
    val mask = c.cast("long")
    val picked = filter(
      transform(sequence(lit(0), lit(labels.size - 1)), i =>
        when((mask.divide(pow(lit(2.0), i.cast("double"))).cast("long") % 2) === 1,
          element_at(lab, i + 1))),
      x => x.isNotNull)
    when(c.rlike("^[0-9]+$"), array_join(picked, ",")).otherwise(c)
  }

  /** tinyint(1) → boolean (`types.go:243-256`): nonzero → true. */
  def tinyintBool(c: Column): Column = c.cast("long") =!= 0

  /** DATETIME string → ISO-8601 without offset, microsecond precision;
    * MySQL zero-dates map to the Unix epoch (`types.go:274-332`).
    */
  def isoDatetime(c: Column): Column =
    when(c.startsWith("0000-00-00"), lit("1970-01-01T00:00:00.000000"))
      .otherwise(date_format(to_timestamp(c), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"))

  /** DATE string → yyyy-MM-dd; zero-date → epoch date. */
  def isoDate(c: Column): Column =
    when(c === "0000-00-00", lit("1970-01-01"))
      .otherwise(date_format(to_date(c), "yyyy-MM-dd"))

  /** TIMESTAMP string → ISO-8601 with UTC offset (`types.go:300-310`). */
  def isoTimestampTz(c: Column): Column =
    when(c.startsWith("0000-00-00"), lit("1970-01-01T00:00:00.000000+00:00"))
      .otherwise(date_format(to_timestamp(c), "yyyy-MM-dd'T'HH:mm:ss.SSSSSSxxx"))

  /** Decimal leading-zero fix (`types.go:222-241`): ".33" → "0.33", "-.77" → "-0.77". */
  def decimalFix(c: Column): Column =
    regexp_replace(c, "^(-?)\\.", "$10.")

  /** Vitess GC / vreplication internal-table filter (`planetscale_edge_mysql.go:
    * 116-158`): drops `_vt_...` tables, old-style GC names (`_vt_DROP_...`),
    * and vreplication artifacts (`_<uuid>_<timestamp>_vrepl`-style).
    */
  val gcTablePattern = "^_vt_.*|^_[0-9a-f]{8}_[0-9a-f_]*_(vrepl|gho|ghc|del)$"
  def isInternalTable(name: Column): Column = name.rlike(gcTablePattern)
}
