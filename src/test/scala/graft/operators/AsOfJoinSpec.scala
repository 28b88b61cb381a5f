package graft.operators

import graft.SparkSupport
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AsOfJoinSpec extends AnyFunSuite with SparkSupport {
  import spark.implicits._

  test("asof: greatest right time <= left time, per key; unmatched dropped") {
    val trades = Seq(("A", 10L, 100), ("A", 20L, 101), ("B", 8L, 200),
      ("B", 5L, 201), ("C", 9L, 300)).toDF("sym", "t", "trade_id")
    val quotes = Seq(("A", 8L, 1.0), ("A", 15L, 2.0), ("A", 20L, 3.0), ("B", 7L, 9.0))
      .toDF("sym", "t", "px")
    val out = AsOfJoin.asof(trades, quotes, Seq("sym"), "t", "t", Seq("px"))
      .select($"sym", $"trade_id", $"px").as[(String, Int, Double)]
      .collect().sortBy(_._2).toSeq
    assert(out == Seq(
      ("A", 100, 1.0),   // t=10 → quote t=8
      ("A", 101, 3.0),   // t=20 → quote t=20 (tie: <= includes equality)
      ("B", 200, 9.0)))  // t=8 → quote t=7
    // B@t=5 precedes every B quote; C has no quotes → both dropped (inner)
    assert(!out.exists(_._2 == 201) && !out.exists(_._1 == "C"))
  }

  test("range join: value lands in exactly one [lo, hi) bucket") {
    val rows = Seq(0.0, 24.999, 25.0, 74.9, 75.0).toDF("value")
    val buckets = Seq((0.0, 25.0, "low"), (25.0, 75.0, "mid"), (75.0, 100.0, "high"))
      .toDF("lo", "hi", "bucket")
    val out = AsOfJoin.rangeJoin(rows, buckets, $"value", $"lo", $"hi")
      .select($"value", $"bucket").as[(Double, String)].collect().toMap
    assert(out == Map(0.0 -> "low", 24.999 -> "low", 25.0 -> "mid",
      74.9 -> "mid", 75.0 -> "high"))
  }
}
