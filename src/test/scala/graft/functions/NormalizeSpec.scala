package graft.functions

import graft.SparkSupport
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Mirrors the reference's value-normalization unit tests
  * (`cmd/internal/types_test.go:81-242`): enum/set mapping, tinyint→bool,
  * ISO-8601 + zero-dates, decimal leading zero.
  */
class NormalizeSpec extends AnyFunSuite with SparkSupport {
  import spark.implicits._

  private def one(df: org.apache.spark.sql.DataFrame): String =
    df.head().getString(0)

  test("enum: 1-based index → label, 0 → empty, passthrough, out-of-range") {
    val labels = Seq("apple", "banana")
    def e(v: String) = one(Seq(v).toDF("v").select(Normalize.mysqlEnum($"v", labels)))
    assert(e("1") == "apple")  // types_test.go: post-COPY "1" → "apple"
    assert(e("2") == "banana")
    assert(e("0") == "")
    assert(e("9") == "9") // out-of-range index → original (mapEnumValue fallthrough)
    assert(e("banana") == "banana")
  }

  test("set: bitmask 24 → San Jose,Oakland (reference vector)") {
    val labels = Seq("San Francisco", "New York", "London", "San Jose", "Oakland")
    def s(v: String) = one(Seq(v).toDF("v").select(Normalize.mysqlSet($"v", labels)))
    assert(s("24") == "San Jose,Oakland") // types_test.go:84,106
    assert(s("1") == "San Francisco")
    assert(s("31") == "San Francisco,New York,London,San Jose,Oakland")
    assert(s("0") == "0") // no bits mapped → original (mapSetValue fallthrough)
    assert(s("London") == "London")
  }

  test("tinyint(1) → boolean") {
    val r = Seq(0L, 1L, 2L, -1L).toDF("v")
      .select(Normalize.tinyintBool($"v")).as[Boolean].collect().toSeq
    assert(r == Seq(false, true, true, true))
  }

  test("datetime ISO-8601 with microseconds; zero-dates → epoch") {
    def d(v: String) = one(Seq(v).toDF("v").select(Normalize.isoDatetime($"v")))
    assert(d("2021-03-04 05:06:07") == "2021-03-04T05:06:07.000000")
    assert(d("0000-00-00 00:00:00") == "1970-01-01T00:00:00.000000")
    // EXACT match only (types.go:309-315): a zero DATE with a nonzero time
    // is NOT a zero-date — time.Parse fails on month 0 → original unchanged
    assert(d("0000-00-00 11:22:33") == "0000-00-00 11:22:33")
    // ...but the check is layout-independent: bare 0000-00-00 under DATETIME
    assert(d("0000-00-00") == "1970-01-01T00:00:00.000000")
    def dd(v: String) = one(Seq(v).toDF("v").select(Normalize.isoDate($"v")))
    assert(dd("0000-00-00") == "1970-01-01")
    assert(dd("0000-00-00 00:00:00") == "1970-01-01") // full spelling under DATE
    assert(dd("2021-03-04") == "2021-03-04")
  }

  test("timestamp WITH offset; TIME default branch passes bare times through " +
    "(types_test.go:158-198)") {
    def ts(v: String) = one(Seq(v).toDF("v").select(Normalize.isoTimestampTz($"v")))
    assert(ts("2025-02-14 08:08:08") == "2025-02-14T08:08:08.000000+00:00")
    assert(ts("0000-00-00 00:00:00") == "1970-01-01T00:00:00.000000+00:00")
    assert(ts("0000-00-00 11:22:33") == "0000-00-00 11:22:33") // not exact → original
    assert(ts("garbage") == "garbage") // unparseable → original (formatISO8601 fallback)
    def t(v: String) = one(Seq(v).toDF("v").select(Normalize.isoTime($"v")))
    assert(t("08:08:08") == "08:08:08")
    assert(t("2025-02-14 08:08:08") == "2025-02-14T08:08:08.000000+00:00")
  }

  test("decimal leading zero: .33 → 0.33, -.77 → -0.77") {
    def f(v: String) = one(Seq(v).toDF("v").select(Normalize.decimalFix($"v")))
    assert(f(".33") == "0.33")
    assert(f("-.77") == "-0.77")
    assert(f("12.34") == "12.34")
  }

  test("enum/set numeric edge cases stay ANSI-safe and reference-faithful: " +
    "zero-padded '00' → empty, padded index decodes, huge index/mask passes " +
    "through, 19-digit in-Long-range SET masks decode") {
    val labels = Seq("a", "b", "c")
    def enum(v: String) = one(Seq(v).toDF("v").select(Normalize.mysqlEnum($"v", labels)))
    assert(enum("00") == "")              // ParseInt("00")=0 → empty (no zero-index crash)
    assert(enum("0000000002") == "b")     // zero-padded index still decodes
    assert(enum("99999999999999999999") == "99999999999999999999") // >18 digits → original
    assert(enum("3000000000") == "3000000000") // > Int.MaxValue → original fallthrough
    val bigSet = (1 to 61).map(i => s"L$i")
    def set(v: String) = one(Seq(v).toDF("v").select(Normalize.mysqlSet($"v", bigSet)))
    assert(set((1L << 60).toString) == "L61")  // 19-digit in-range mask decodes
    assert(set("9223372036854775807").nonEmpty) // Long.MaxValue mask decodes (all 61 bits visible)
    assert(set("9999999999999999999") == "9999999999999999999") // 19 digits beyond Long → original
    def tiny(v: String) = Seq(v).toDF("v").select(Normalize.tinyintBoolWire($"v")).head()
    assert(tiny("2").getBoolean(0) && !tiny("0").getBoolean(0) && tiny("x").isNullAt(0))
    assert(tiny("18446744073709551615").isNullAt(0)) // >18 digits → null, never ANSI-throw
  }

  test("GC/vrepl table filter (planetscale_edge_mysql_test.go:9 semantics)") {
    val names = Seq(
      "users" -> false,
      "_vt_HOLD_6ace8bcef73211ea87e9f875a4d24e90_20200915120410" -> true,
      "_vt_PURGE_x" -> true,
      "_4e5dcf80_354b_11eb_82cd_f875a4d24e90_20201204114014_gho" -> true,
      "_aa1b2c3d_0000_11eb_0000_000000000000_vrepl" -> true,
      "normal_table" -> false)
    val got = names.map(_._1).toDF("t")
      .select(Normalize.isInternalTable($"t")).as[Boolean].collect().toSeq
    assert(got == names.map(_._2))
  }
}
