package graft.operators

import graft.SparkSupport
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Multimodal plumbing: binary payloads through partition-wise typed
  * decoders — schema, resize math, frame-sampling fan-out, and edge cases
  * (empty payload, sub-frame payload).
  */
class MultimodalSpec extends AnyFunSuite with SparkSupport {
  import spark.implicits._

  private def payloads(texts: (Long, String)*) =
    texts.toSeq.toDF("doc_id", "text")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))

  test("aspect-preserving integer fit") {
    assert(Multimodal.fit(64, 48, 32) == (32L, 24L))
    assert(Multimodal.fit(48, 64, 32) == (24L, 32L))
    assert(Multimodal.fit(16, 8, 32) == (16L, 8L))   // already fits
    assert(Multimodal.fit(1000, 1, 32) == (32L, 1L)) // never collapses to 0
  }

  test("decodeFeatures: schema + deterministic stub dims + resize") {
    val df = Multimodal.decodeFeatures(payloads(1L -> "x" * 100, 2L -> ""))
    assert(df.columns.toSeq == Seq("doc_id", "n_bytes", "width", "height",
      "format", "resized_w", "resized_h"))
    val r = df.orderBy("doc_id").collect()
    assert(r(0).getLong(1) == 100L)
    val w = 64L + (100L % 64L) * 4L
    assert(r(0).getLong(2) == w && r(0).getLong(3) == w * 3 / 4)
    assert(r(0).getLong(5) == 32L) // stub w is always > 32 and >= h
    assert(r(1).getLong(1) == 0L)  // empty payload decodes, doesn't crash
  }

  test("sampleFrames: every k-th frame, trailing partial frame, empty payload → no rows") {
    // 300 bytes @ 64/frame → 5 frames (last partial 44B); every 4th → idx 0, 4
    val df = Multimodal.sampleFrames(payloads(1L -> ("y" * 300), 2L -> ""),
      frameBytes = 64, every = 4)
    val rows = df.orderBy("doc_id", "frame_idx").collect()
    assert(rows.length == 2)
    assert(rows.map(_.getLong(1)).toSeq == Seq(0L, 4L))
    assert(rows.forall(_.getLong(2) == 5L))
    assert(rows.map(_.getLong(3)).toSeq == Seq(64L, 44L))
    assert(df.filter(col("doc_id") === 2L).count() == 0)
  }

  test("sub-frame payload: one partial frame") {
    val df = Multimodal.sampleFrames(payloads(1L -> "abc"), frameBytes = 64, every = 4)
    val r = df.head()
    assert(r.getLong(1) == 0L && r.getLong(2) == 1L && r.getLong(3) == 3L)
  }
}
