package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for the training-data pipeline: image/audio/
  * video ride as opaque `binary` columns; decode / feature-extract / resize /
  * frame-sample run as PARTITION-WISE typed batches (`mapPartitions`) so a
  * real codec is initialized once per partition and fed a batch — the
  * execution shape `mapInPandas`/JNI decoders need. The pixel decode itself
  * is a clearly-marked deterministic STUB (this container ships no
  * image/audio libraries): dimensions/format derive from payload arithmetic
  * so the driver's DuckDB oracle can verify the plumbing end-to-end.
  */
object Multimodal {

  /** One "decoder" per partition — the stand-in for a codec handle (libjpeg,
    * ffmpeg context, …) that is expensive to construct and must be reused
    * across a batch, and is NOT serializable driver-side state.
    */
  final class StubCodec {
    /** STUB: real decode would parse actual image headers here. */
    def decode(bytes: Array[Byte]): (Long, Long, Long, String) = {
      val n = bytes.length.toLong
      val w = 64L + (n % 64L) * 4L
      val h = (w * 3L) / 4L
      val fmt = (n % 3L) match { case 0L => "jpeg"; case 1L => "png"; case _ => "webp" }
      (n, w, h, fmt)
    }
  }

  /** Largest aspect-preserving integer fit of (w, h) into maxDim². */
  private[operators] def fit(w: Long, h: Long, maxDim: Long): (Long, Long) =
    if (w <= maxDim && h <= maxDim) (w, h)
    else if (w >= h) (maxDim, math.max(1L, (h * maxDim) / w))
    else (math.max(1L, (w * maxDim) / h), maxDim)

  /** Decode + feature-extract + resize-to-32 per payload. Input needs
    * `(doc_id long, payload binary)`.
    */
  def decodeFeatures(payloads: DataFrame): DataFrame = {
    import payloads.sparkSession.implicits._
    payloads.as[(Long, Array[Byte])].mapPartitions { it =>
      val codec = new StubCodec // once per partition, reused across the batch
      it.map { case (id, bytes) =>
        val (n, w, h, fmt) = codec.decode(bytes)
        val (rw, rh) = fit(w, h, 32L)
        (id, n, w, h, fmt, rw, rh)
      }
    }.toDF("doc_id", "n_bytes", "width", "height", "format",
      "resized_w", "resized_h")
  }

  /** Frame-sample a "video" payload: fixed `frameBytes`-sized frames, keep
    * every `every`-th (frame 0, every, 2·every, …); a trailing partial frame
    * counts. One output row per KEPT frame — the 1→N fan-out real frame
    * extraction has, still batched per partition around one codec instance.
    */
  def sampleFrames(payloads: DataFrame, frameBytes: Int, every: Int): DataFrame = {
    import payloads.sparkSession.implicits._
    payloads.as[(Long, Array[Byte])].mapPartitions { it =>
      val codec = new StubCodec
      it.flatMap { case (id, bytes) =>
        val n = bytes.length
        val frames = (n + frameBytes - 1) / frameBytes // ceil; empty payload → 0
        // ONE container probe per payload, reused across every emitted frame
        // (a real codec would otherwise re-parse the whole payload per frame:
        // O(frames × payload))
        val fmt = if (frames == 0) "" else codec.decode(bytes)._4
        (0 until frames by every).iterator.map { f =>
          val len = math.min(frameBytes, n - f * frameBytes).toLong
          (id, f.toLong, frames.toLong, len, fmt)
        }
      }
    }.toDF("doc_id", "frame_idx", "n_frames", "frame_bytes", "format")
  }
}
