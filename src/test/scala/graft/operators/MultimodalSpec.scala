package graft.operators

import graft.SparkSupport
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Multimodal plumbing with a REAL codec: deterministic PNG payloads
  * through partition-wise `javax.imageio` decoders — encode→decode
  * round-trip fidelity vs the closed form, resize math, container
  * demux + frame-sampling fan-out, and corrupt-input behavior.
  */
class MultimodalSpec extends AnyFunSuite with SparkSupport {
  import spark.implicits._

  private def closedFormSum(seed: Long): Long = {
    val (w, h) = Multimodal.dims(seed)
    (for (y <- 0 until h; x <- 0 until w) yield Multimodal.pixel(seed, x, y).toLong).sum
  }

  test("aspect-preserving integer fit") {
    assert(Multimodal.fit(64, 48, 32) == (32L, 24L))
    assert(Multimodal.fit(48, 64, 32) == (24L, 32L))
    assert(Multimodal.fit(16, 8, 32) == (16L, 8L))   // already fits
    assert(Multimodal.fit(1000, 1, 32) == (32L, 1L)) // never collapses to 0
  }

  test("pngPayload → ImageCodec.decode is a REAL lossless round trip: " +
    "decoded dims, format, and per-pixel sum match the closed form") {
    val codec = new Multimodal.ImageCodec
    Seq(0L, 1L, 8L, 9L, 80L, 12345L).foreach { seed =>
      val bytes = Multimodal.pngPayload(seed)
      // genuine PNG bytes: magic header present
      assert((bytes(0) & 0xff) == 0x89 && bytes(1) == 'P' && bytes(2) == 'N' && bytes(3) == 'G')
      val (w, h, fmt, sum) = codec.decode(bytes)
      assert((w, h) == Multimodal.dims(seed), s"seed $seed dims")
      assert(fmt == "png")
      assert(sum == closedFormSum(seed), s"seed $seed pixel sum")
    }
  }

  test("decodeFeatures: schema, real decode across partitions, resize") {
    val payloads = Seq(0L, 5L, 80L).map(id => (id, Multimodal.pngPayload(id)))
      .toDF("doc_id", "payload").repartition(3)
    val df = Multimodal.decodeFeatures(payloads, maxDim = 12L)
    assert(df.columns.toSeq == Seq("doc_id", "width", "height", "format",
      "pix_sum", "resized_w", "resized_h"))
    val r = df.orderBy("doc_id").collect()
    // seed 0 → 8×8, fits 12² untouched
    assert(r(0).getLong(1) == 8L && r(0).getLong(2) == 8L)
    assert((r(0).getLong(5), r(0).getLong(6)) == (8L, 8L))
    assert(r(0).getLong(4) == closedFormSum(0L))
    // seed 5 → 13×8: w > 12 ⇒ fit to (12, 8*12/13 = 7)
    assert(r(1).getLong(1) == 13L)
    assert((r(1).getLong(5), r(1).getLong(6)) == (12L, 7L))
    // seed 80 → w = 8 + 80%9 = 16, h = 8 + (80/9)%9 = 16 ⇒ (12, 12)
    assert((r(2).getLong(1), r(2).getLong(2)) == (16L, 16L))
    assert((r(2).getLong(5), r(2).getLong(6)) == (12L, 12L))
  }

  test("sampleFrames: demux the length-prefixed container, decode every " +
    "k-th frame for real; empty payload → no rows") {
    // seed 4 → 1 + 4%5 = 5 frames; every 2nd → idx 0, 2, 4
    val payloads = Seq((4L, Multimodal.videoPayload(4L)), (99L, Array.empty[Byte]))
      .toDF("doc_id", "payload")
    val df = Multimodal.sampleFrames(payloads, every = 2)
    assert(df.columns.toSeq == Seq("doc_id", "frame_idx", "n_frames",
      "frame_w", "frame_h", "pix_sum"))
    val rows = df.orderBy("doc_id", "frame_idx").collect()
    assert(rows.length == 3)
    assert(rows.map(_.getLong(1)).toSeq == Seq(0L, 2L, 4L))
    assert(rows.forall(_.getLong(2) == 5L))
    rows.foreach { r =>
      val s = 4L * 31L + r.getLong(1)
      assert((r.getLong(3).toInt, r.getLong(4).toInt) == Multimodal.dims(s))
      assert(r.getLong(5) == closedFormSum(s))
    }
    assert(df.filter(col("doc_id") === 99L).count() == 0)
  }

  test("corrupt container fails loud (length prefix past the payload)") {
    val codec = new Multimodal.ImageCodec
    val bogus = Array[Byte](0, 0, 16, 0, 1, 2, 3) // claims 4096-byte frame in 3 bytes
    val e = intercept[IllegalStateException](codec.frames(bogus).toSeq)
    assert(e.getMessage.contains("corrupt container"))
  }

  test("truncated container fails loud too (1-3 stray trailing bytes after " +
    "the last complete frame must not pass as clean end-of-container)") {
    val codec = new Multimodal.ImageCodec
    val whole = Multimodal.videoPayload(0L) // exactly one complete frame
    val truncated = whole ++ Array[Byte](0, 7) // cut mid-length-prefix
    val e = intercept[IllegalStateException](codec.frames(truncated).toSeq)
    assert(e.getMessage.contains("truncated length prefix"))
    // and the intact container still parses cleanly
    assert(codec.frames(whole).size == 1)
  }

  test("non-image bytes fail loud in decode (no installed codec)") {
    val codec = new Multimodal.ImageCodec
    val e = intercept[IllegalStateException](codec.decode("not an image".getBytes))
    assert(e.getMessage.contains("no installed codec"))
  }
}
