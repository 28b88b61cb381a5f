package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SQL-surface registration of the engine's custom Catalyst expressions, so
  * `spark.sql("SELECT vgtid_rank(pos) …")` works like any built-in — the
  * reference's GTID/dedup primitives as first-class SQL functions.
  *
  * Two entry points:
  *  - `GraftFunctions.register(spark)` — register on a live session;
  *  - `spark.sql.extensions=graft.functions.GraftExtensions` — session-build
  *    injection via [[GraftExtensions]] (the `SparkSessionExtensions` path).
  */
object GraftFunctions {

  private def intLit(e: Expression, name: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$name expects a literal INT, got $other")
  }

  /** (name, description, builder) for every exposed function. */
  val functions: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("vgtid_rank",
      "vgtid_rank(pos) - total-order rank of a MySQL56 GTID-set position (max txn id)",
      (args: Seq[Expression]) => VGtidRankExpr(args.head)),
    ("vgtid_after",
      "vgtid_after(x, y) - strictly-greater GTID-set containment (blank never after)",
      (args: Seq[Expression]) => VGtidCompareExpr(args(0), args(1), after = true)),
    ("vgtid_equal",
      "vgtid_equal(x, y) - GTID-set equality at the string guard level",
      (args: Seq[Expression]) => VGtidCompareExpr(args(0), args(1), after = false)),
    ("simhash64",
      "simhash64(tokens) - 64-bit SimHash of an array<string> of tokens",
      (args: Seq[Expression]) => SimHash64Expr(args.head)),
    ("minhash",
      "minhash(shingles, k) - k-hash MinHash signature of an array<string>",
      (args: Seq[Expression]) => MinHashExpr(args(0), intLit(args(1), "minhash"))),
    ("fingerprint",
      "fingerprint(text, window) - Karp-Rabin rolling-min document fingerprint",
      (args: Seq[Expression]) => FingerprintExpr(args(0), intLit(args(1), "fingerprint"))))

  private def entries: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    functions.map { case (name, usage, builder) =>
      (FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", null, name, usage, ""),
        builder)
    }

  /** Register (or replace) all graft functions on a live session. */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    entries.foreach { case (id, info, builder) =>
      registry.registerFunction(id, info, builder)
    }
  }

  private[functions] def inject(ext: SparkSessionExtensions): Unit =
    entries.foreach { case (id, info, builder) =>
      ext.injectFunction((id, info, builder))
    }
}

/** `spark.sql.extensions` hook (build-time injection). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = GraftFunctions.inject(ext)
}
