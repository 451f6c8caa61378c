package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque binary payloads with typed metadata,
  * processed by a batched per-partition extractor.
  *
  * The real Spark-side machinery — schema (binary + struct metadata),
  * partition-parallel batch processing, typed output — is implemented and
  * tested. The *codec* itself is a clearly-marked deterministic stub
  * ([[StubCodec.decode]]): real image/audio libraries are not available in
  * this environment, so the stub derives "decoded" features purely from the
  * payload bytes, keeping every downstream result reproducible and
  * oracle-checkable.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, kind: String, payload: Array[Byte],
                            source: String, lang: String)
  final case class FeatureRow(doc_id: Long, kind: String, n_bytes: Long,
                              width: Long, height: Long, channels: Long,
                              resized_width: Long, resized_height: Long,
                              checksum: Long)
  final case class FrameRow(doc_id: Long, frame_idx: Long, offset_bytes: Long,
                            frame_checksum: Long)

  /** STUB: stands in for a real image/audio/video decoder. Deterministic
    * pure function of the payload so results are reproducible. */
  object StubCodec {
    def decode(kind: String, payload: Array[Byte]): (Long, Long, Long, Long) = {
      val n = payload.length.toLong
      val width = 64 + n % 512
      val height = 64 + (n * 7) % 512
      val channels = kind match {
        case "audio" => 1L
        case _ => 3L
      }
      var sum = 0L
      var i = 0
      while (i < payload.length) { sum += payload(i) & 0xff; i += 1 }
      (width, height, channels, sum % 997)
    }
  }

  /** Attach a synthetic binary payload + media kind to the documents table
    * (the driver corpus has no binary column; UTF-8 text bytes stand in as
    * the opaque payload). */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video").as("kind"),
      encode(col("text"), "UTF-8").as("payload"),
      col("source"), col("lang"))

  /** Fit-within-`box` resize dims, integer math (exact in any engine):
    * scale the longer edge to `box`, preserve aspect, floor, at least 1. */
  def resizeDims(w: Long, h: Long, box: Long = 256L): (Long, Long) = {
    val longest = math.max(w, h)
    (math.max(1L, w * box / longest), math.max(1L, h * box / longest))
  }

  /** Batched feature extraction: one decode pass per partition (the shape a
    * Pandas-UDF/mapInPandas pipeline has in PySpark — here a typed
    * mapPartitions), no driver involvement, linear scale-out. Includes the
    * resize stage (dims only — the stub codec has no pixels to resample;
    * the arithmetic and plumbing are the real part). */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[FeatureRow] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { it =>
      it.map { m =>
        val (w, h, c, sum) = StubCodec.decode(m.kind, m.payload)
        val (rw, rh) = resizeDims(w, h)
        FeatureRow(m.doc_id, m.kind, m.payload.length.toLong, w, h, c, rw, rh, sum)
      }
    }
  }

  /** Frame sampling for video payloads: one row per `frameBytes` window of
    * the payload (at least one frame), with the per-frame byte checksum —
    * the 1->N expansion shape a real frame sampler has, as a flatMap per
    * partition. */
  def sampleFrames(spark: SparkSession, media: DataFrame,
                   frameBytes: Int = 4096): Dataset[FrameRow] = {
    import spark.implicits._
    media.as[MediaRow].filter(_.kind == "video").mapPartitions { it =>
      it.flatMap { m =>
        val n = math.max(1L, (m.payload.length.toLong + frameBytes - 1) / frameBytes)
        (0L until n).iterator.map { i =>
          val from = (i * frameBytes).toInt
          val until = math.min(from + frameBytes, m.payload.length)
          var s = 0L
          var j = from
          while (j < until) { s += m.payload(j) & 0xff; j += 1 }
          FrameRow(m.doc_id, i, i * frameBytes.toLong, s % 997)
        }
      }
    }
  }
}
