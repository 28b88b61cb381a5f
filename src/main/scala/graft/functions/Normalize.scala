package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** MySQL value normalization — the reference's per-value decode rules
  * (`cmd/internal/types.go:139-386`, SURVEY.md §1.3), re-expressed as
  * codegen-friendly Column expressions (no Scala UDFs).
  */
object Normalize {

  /** ENUM index → label (`types.go:363-386`): post-COPY events carry the
    * 1-based index ("1" → first label); index 0 is MySQL's empty-string
    * error value → ""; a non-numeric value is already the label and passes
    * through; an OUT-OF-RANGE index returns the original value (reference
    * `mapEnumValue`'s final fallthrough).
    */
  def mysqlEnum(c: Column, labels: Seq[String]): Column = {
    val lab = array(labels.map(lit): _*)
    // 18-digit bound keeps the interior cast ANSI-safe (long-range by
    // construction); the NUMERIC zero test handles zero-padded indexes
    // ('00' → "" like the reference's ParseInt), and try_element_at never
    // sees index 0 (Spark throws INVALID_INDEX_OF_ZERO even in the try
    // variant) or an int-overflowing index (nulled → original fallthrough)
    val idx = c.cast("long")
    when(c.rlike("^[0-9]{1,18}$"),
      when(idx === 0L, lit(""))
        .otherwise(coalesce(
          try_element_at(lab, when(idx <= Int.MaxValue, idx).cast("int")), c)))
      .otherwise(c)
  }

  /** SET bitmask → comma-joined labels (`types.go:334-361`): decimal value's
    * bit i selects labels(i); non-numeric passes through; when NO bits map
    * (zero mask) the original value is returned (reference `mapSetValue`'s
    * empty-result fallthrough). Bit extraction is exact
    * shiftright/bitwiseAND (a double `pow` would lose exactness past 53
    * labels; MySQL SET allows 64). Test vector from the reference: 24 over
    * {SF,NY,London,San Jose,Oakland} → "San Jose,Oakland"
    * (`types_test.go:84,106`).
    */
  def mysqlSet(c: Column, labels: Seq[String]): Column = {
    val mask = c.cast("long")
    val picked = filter(
      array(labels.zipWithIndex.map { case (label, i) =>
        when(shiftrightunsigned(mask, i).bitwiseAND(lit(1L)) === 1, lit(label))
      }: _*),
      x => x.isNotNull)
    // value-safe Long guard (up to 19 digits, lexicographic bound at
    // Long.MaxValue for the 19-digit case): every mask the reference's
    // 64-bit ParseInt accepts decodes — including high-bit masks of
    // 60+-member SETs — while beyond-Long values take the reference's
    // parse-error passthrough instead of throwing under ANSI
    val numeric = c.rlike("^[0-9]{1,19}$") &&
      (length(c) < 19 || c <= lit("9223372036854775807"))
    when(numeric,
      when(size(picked) === 0, c).otherwise(array_join(picked, ",")))
      .otherwise(c)
  }

  /** tinyint(1) → boolean (`types.go:243-256`): nonzero → true. */
  def tinyintBool(c: Column): Column = c.cast("long") =!= 0

  /** tinyint(1) with the `do_not_treat_tiny_int_as_boolean` opt-out
    * (`planetscale_connection.go:30-32`, behavior at
    * `planetscale_edge_database.go:147-154` / `types.go:213-215`): opted out,
    * the raw integer value is kept.
    */
  def tinyint(c: Column, treatAsBoolean: Boolean): Column =
    if (treatAsBoolean) tinyintBool(c).cast("string") else c.cast("long").cast("string")

  /** The two EXACT zero-date spellings the reference maps to epoch
    * (`types.go:309-315`). Exact equality, NOT a prefix: a value like
    * `"0000-00-00 11:22:33"` fails the reference's `time.Parse` (month 0)
    * and passes through UNCHANGED — a prefix match would wrongly land it as
    * epoch. The check is layout-independent: a bare `0000-00-00` under a
    * DATETIME column (or the full spelling under DATE) still hits it.
    */
  private def isZeroDate(c: Column): Column =
    c === "0000-00-00 00:00:00" || c === "0000-00-00"

  /** DATETIME string → ISO-8601 without offset, microsecond precision;
    * MySQL zero-dates map to the Unix epoch; an unparseable value falls back
    * to the ORIGINAL (reference `formatISO8601`, `types.go:274-332`).
    */
  def isoDatetime(c: Column): Column =
    when(isZeroDate(c), lit("1970-01-01T00:00:00.000000"))
      .otherwise(coalesce(
        // optional-fraction section: datetime(1..6) wire values parse too
        // (Go's time.Parse accepts fractional seconds even when the layout
        // lacks them, and the reference's output layout prints 6 digits)
        date_format(try_to_timestamp(c, lit("yyyy-MM-dd HH:mm:ss[.SSSSSS]")),
          "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"), c))

  /** DATE string → yyyy-MM-dd; zero-date → epoch date; fallback original. */
  def isoDate(c: Column): Column =
    when(isZeroDate(c), lit("1970-01-01"))
      .otherwise(coalesce(
        date_format(try_to_timestamp(c, lit("yyyy-MM-dd")), "yyyy-MM-dd"), c))

  /** TIMESTAMP string → ISO-8601 WITH UTC offset (`types.go:300-310`,
    * layout `2006-01-02T15:04:05.000000-07:00`, UTC renders `+00:00`);
    * zero-date → epoch; unparseable → original.
    */
  def isoTimestampTz(c: Column): Column =
    when(isZeroDate(c), lit("1970-01-01T00:00:00.000000+00:00"))
      .otherwise(coalesce(
        date_format(try_to_timestamp(c, lit("yyyy-MM-dd HH:mm:ss[.SSSSSS]")),
          "yyyy-MM-dd'T'HH:mm:ss.SSSSSSxxx"), c))

  /** TIME values take the reference's DEFAULT branch (`Type_TIME` is in the
    * fallthrough list, `types.go:289-299`): attempt the datetime parse with
    * the offset layout, and since a bare `HH:mm:ss` never parses, pass it
    * through unchanged — byte-exact reference behavior.
    */
  def isoTime(c: Column): Column = isoTimestampTz(c)

  /** Decimal leading-zero fix (`types.go:222-241`): ".33" → "0.33", "-.77" → "-0.77". */
  def decimalFix(c: Column): Column =
    regexp_replace(c, "^(-?)\\.", "$10.")

  /** Guarded tinyint(1)→boolean for RAW WIRE STRINGS: numeric → (v != 0);
    * non-numeric → null (the reference keeps the original string value,
    * `mapTinyIntToBool`'s error fallback — a typed boolean landing column
    * can't hold it, so the engine lands null instead; use a string landing
    * column to preserve originals).
    */
  def tinyintBoolWire(c: Column): Column =
    // 18-digit bound: the interior long cast can never ANSI-throw
    when(c.rlike("^-?[0-9]{1,18}$"), c.cast("long") =!= 0)

  /** The reference's per-value `parseValue` dispatch (`types.go:175-220`),
    * driven by the column's MySQL type DDL (which determines the wire
    * `query.Type` the reference switches on). Applied to every value of a
    * raw wire-string changelog INSIDE the ingest path — the analogue of the
    * reference running `parseValue` on every synced row
    * (`QueryResultToRecords`, `types.go:139-164`).
    *
    * Dispatch mirror: ENUM/SET → index/bitmask mapping with labels parsed
    * from the DDL; DATETIME/DATE/TIME → ISO-8601 (`formatISO8601`);
    * TIMESTAMP → NO special handling (`Type_TIMESTAMP` is in the reference's
    * fallthrough list); DECIMAL → leading-zero fix; exactly-`tinyint(1)` →
    * boolean unless `do_not_treat_tiny_int_as_boolean` (the reference
    * compares the lowercased DDL for equality, so `tinyint(1) unsigned`
    * passes through). Prefix order matters: datetime before date, timestamp
    * before time.
    */
  def parseValue(c: Column, columnType: String,
      treatTinyIntAsBoolean: Boolean = true): Column = {
    val ty = columnType.toLowerCase
    if (ty.startsWith("enum"))
      mysqlEnum(c, graft.core.TypeMap.parseEnumOrSetValues(columnType))
    else if (ty.startsWith("set"))
      mysqlSet(c, graft.core.TypeMap.parseEnumOrSetValues(columnType))
    else if (ty.startsWith("datetime")) isoDatetime(c)
    else if (ty.startsWith("timestamp")) c // Type_TIMESTAMP: no special handling
    else if (ty.startsWith("date")) isoDate(c)
    else if (ty.startsWith("time")) isoTime(c)
    else if (ty.startsWith("decimal")) decimalFix(c)
    else if (ty == "tinyint(1)" && treatTinyIntAsBoolean) tinyintBoolWire(c)
    else c
  }

  /** Vitess GC / vreplication internal-table filter (`planetscale_edge_mysql.go:
    * 116-158`): drops `_vt_...` tables, old-style GC names (`_vt_DROP_...`),
    * and vreplication artifacts (`_<uuid>_<timestamp>_vrepl`-style).
    */
  val gcTablePattern = "^_vt_.*|^_[0-9a-f]{8}_[0-9a-f_]*_(vrepl|gho|ghc|del)$"
  def isInternalTable(name: Column): Column = name.rlike(gcTablePattern)
}
