package graft.functions

import graft.SparkSupport
import org.scalatest.funsuite.AnyFunSuite

/** The custom Catalyst expressions as first-class SQL functions. */
class GraftFunctionsSpec extends AnyFunSuite with SparkSupport {

  test("registered SQL functions match the Column API results") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val uuid = "0d5afdd6-54a0-11eb-936d-0a8939501751"
    Seq(
      (s"MySQL56/$uuid:1-9", s"MySQL56/$uuid:1-5", "alpha beta gamma"),
      (s"MySQL56/$uuid:1-5", s"MySQL56/$uuid:1-9", "alpha beta delta"))
      .toDF("x", "y", "text").createOrReplaceTempView("gf")
    val rows = spark.sql(
      """SELECT vgtid_rank(x) AS r, vgtid_after(x, y) AS a, vgtid_equal(x, x) AS e,
         simhash64(split(text, ' ')) AS sh,
         size(minhash(split(text, ' '), 8)) AS mh,
         fingerprint(text, 4) AS fp
         FROM gf ORDER BY r""").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(5L, 9L))
    assert(rows.map(_.getBoolean(1)).toSeq == Seq(false, true))
    assert(rows.forall(_.getBoolean(2)))
    assert(rows.forall(_.getInt(4) == 8))
    assert(rows.forall(_.getLong(5) >= 0L))
    // SQL output == Column API output (same Expression underneath)
    import org.apache.spark.sql.functions._
    val viaCol = spark.table("gf")
      .select(VGtidRankExpr.vgtid_rank(col("x"))).orderBy(col("x")).collect()
    val viaSql = spark.sql("SELECT vgtid_rank(x) FROM gf ORDER BY x").collect()
    assert(viaCol.map(_.getLong(0)).toSeq == viaSql.map(_.getLong(0)).toSeq)
  }

  test("non-literal arity/argument misuse fails with a clear message") {
    GraftFunctions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT minhash(array('a'), id) FROM range(1)").collect()
    }
    assert(e.getMessage.contains("literal INT") || e.getMessage.toLowerCase.contains("minhash"))
  }
}
