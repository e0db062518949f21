package graft.ops

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for a training-data pipeline: media as
  * opaque BINARY columns + typed metadata, with decode / feature-extract /
  * resize / frame-sample as distributed per-partition transforms.
  *
  * The container has no image/audio codecs, so the DECODE KERNEL IS A
  * DETERMINISTIC STUB (clearly marked below): it parses our own 16-byte
  * header instead of a real JPEG/WAV decoder. Everything around it — the
  * schema, the binary payload handling, the mapPartitions batch shape,
  * partition sizing, and the feature pipeline — is real Spark and tested.
  * Swapping `StubCodec.decode` for a JNI/lib decoder is the only change a
  * production deployment needs.
  */
object Multimodal {

  /** Media row: kind ∈ {image, audio, video}; payload is opaque bytes;
    * width/height/duration live in the typed metadata, as a real
    * WARC-extracted media table would. */
  final case class MediaRow(
      media_id: Long, kind: String, payload: Array[Byte],
      width: Int, height: Int, duration_ms: Int)

  final case class MediaFeature(
      media_id: Long, kind: String, n_bytes: Long,
      mean_byte: Double, histogram: Array[Long])

  final case class Frame(media_id: Long, frame_no: Int, frame_bytes: Array[Byte])

  /** Deterministic synthetic media derived from the documents table —
    * payload = header(16B: magic, w, h, dur) + repeated text bytes. */
  def syntheticMedia(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    DocOps.documents(spark, dir)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val kind = (id % 3) match {
          case 0 => "image"; case 1 => "audio"; case _ => "video"
        }
        val w = 16 + (id % 64).toInt
        val h = 16 + (id % 48).toInt
        val dur = 1000 + (id % 9000).toInt
        val body = {
          val t = text.getBytes(StandardCharsets.UTF_8)
          val need = 256 + (id % 1024).toInt
          if (t.isEmpty) Array.fill[Byte](need)(0) // empty text: zero body
          else Array.tabulate(need)(i => t(i % t.length))
        }
        MediaRow(id, kind, StubCodec.encodeHeader(w, h, dur) ++ body, w, h, dur)
      }
  }

  /** ───────────────────────── STUBBED DECODE ─────────────────────────
    * A real deployment decodes JPEG/PCM here; the sandbox has no codec
    * libraries, so this parses the deterministic 16-byte header written by
    * `encodeHeader`. The Spark-side contract (binary in → struct out,
    * per-partition batching, null on corrupt input) is the real thing. */
  object StubCodec extends Serializable {
    val Magic = 0x47524654 // "GRFT"
    def encodeHeader(w: Int, h: Int, durMs: Int): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(16)
      b.putInt(Magic).putInt(w).putInt(h).putInt(durMs)
      b.array()
    }
    /** Returns (width, height, duration_ms) or None on corrupt payload. */
    def decode(payload: Array[Byte]): Option[(Int, Int, Int)] = {
      if (payload == null || payload.length < 16) return None
      val b = java.nio.ByteBuffer.wrap(payload)
      if (b.getInt() != Magic) None
      else Some((b.getInt(), b.getInt(), b.getInt()))
    }
  }

  /** Decode + validate: distributed mapPartitions over the binary column;
    * corrupt rows surface as decode_ok=false rather than failing the job. */
  def decodeMeta(media: Dataset[MediaRow]): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        StubCodec.decode(m.payload) match {
          case Some((w, h, d)) =>
            (m.media_id, m.kind, true, w, h, d,
              w == m.width && h == m.height && d == m.duration_ms)
          case None =>
            (m.media_id, m.kind, false, -1, -1, -1, false)
        }
      }
    }.toDF("media_id", "kind", "decode_ok", "width", "height", "duration_ms", "meta_consistent")
  }

  /** Feature extraction: byte histogram (16 bins) + mean — the stand-in
    * for an embedding model, with the real batch shape (one pass per
    * partition, primitive arrays, no per-row driver work). */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeature] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val body = m.payload.drop(16)
        val hist = new Array[Long](16)
        var sum = 0L
        var i = 0
        while (i < body.length) {
          val v = body(i) & 0xff
          hist(v >> 4) += 1
          sum += v
          i += 1
        }
        MediaFeature(m.media_id, m.kind, body.length.toLong,
          if (body.isEmpty) 0.0 else sum.toDouble / body.length, hist)
      }
    }
  }

  /** Resize stub: rewrites the header to the target box preserving aspect
    * ratio (integer math only — deterministic). */
  def resize(media: Dataset[MediaRow], maxSide: Int): Dataset[MediaRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.map { m =>
      val scale = math.max(1, math.max(m.width, m.height) / maxSide.toDouble)
      val (w2, h2) = (math.max(1, (m.width / scale).toInt), math.max(1, (m.height / scale).toInt))
      m.copy(width = w2, height = h2,
        payload = StubCodec.encodeHeader(w2, h2, m.duration_ms) ++ m.payload.drop(16))
    }
  }

  /** Frame sampling for video rows: n evenly-spaced byte slices (the
    * production version samples decoded frames; the slicing/batch shape
    * is identical). */
  def sampleFrames(media: Dataset[MediaRow], n: Int): Dataset[Frame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.kind == "video").flatMap { m =>
      val body = m.payload.drop(16)
      // n <= 0 is "sample nothing", not a division by zero
      val step = math.max(1, body.length / math.max(n, 1))
      (0 until math.min(n, body.length)).iterator.map { f =>
        val start = f * step
        Frame(m.media_id, f, body.slice(start, math.min(start + step, body.length)))
      }
    }
  }
}
