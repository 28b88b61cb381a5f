package graft.functions

import graft.SparkSupport
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class VectorFunctionsSpec extends AnyFunSuite with SparkSupport {
  import spark.implicits._

  test("cosine: exact on known vectors, zero-norm guarded") {
    val r = Seq(
      (Seq(1.0f, 0.0f), Seq(1.0f, 0.0f)),
      (Seq(1.0f, 0.0f), Seq(0.0f, 1.0f)),
      (Seq(1.0f, 1.0f), Seq(1.0f, 1.0f)),
      (Seq(0.0f, 0.0f), Seq(1.0f, 1.0f))).toDF("a", "b")
      .select(VectorFunctions.cosine($"a", $"b")).as[Double].collect().toSeq
    assert(math.abs(r(0) - 1.0) < 1e-12)
    assert(math.abs(r(1)) < 1e-12)
    assert(math.abs(r(2) - 1.0) < 1e-12)
    assert(r(3) == 0.0)
  }

  test("brute-force top-k: ranks by cosine desc with id tie-break") {
    val vecs = Seq(
      (0L, Seq(1.0f, 0.0f)),
      (1L, Seq(0.9f, 0.1f)),
      (2L, Seq(0.0f, 1.0f)),
      (3L, Seq(1.0f, 0.01f))).toDF("id", "vec")
    val top = VectorFunctions.bruteForceTopK(vecs.filter($"id" === 0), vecs, 2)
      .orderBy($"rank").as[(Long, Long, Int)].collect().toSeq
    assert(top.map(_._2) == Seq(3L, 1L)) // closest first
  }

  test("LSH top-k: same-bucket recall vs brute force on sf0.001 embeddings") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val q = emb.filter($"id" < 5)
    val exact = VectorFunctions.bruteForceTopK(q, emb, 5)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val approx = VectorFunctions.lshTopK(q, emb, 5, dim = 64)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"LSH recall $recall collapsed — bucketing broken")
    // every approx neighbor must share the query's sign bucket by construction
    assert(approx.nonEmpty)
  }

  test("IVF top-k: nprobe probing returns candidates from probed cells only; " +
    "recall vs brute force is sane") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val q = emb.filter($"id" < 5)
    val exact = VectorFunctions.bruteForceTopK(q, emb, 5)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = VectorFunctions.ivfTopK(q, emb, emb.filter($"id" < 16), k = 5, nprobe = 4)
    val approx = ivf.select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.3, s"IVF recall $recall collapsed — cell assignment broken")
    // ranks are dense 1..k' per query
    val ranks = ivf.groupBy($"query_id")
      .agg(max($"rank").as("mx"), count(lit(1)).as("n"))
      .filter($"mx" =!= $"n")
    assert(ranks.count() == 0)
  }
}
