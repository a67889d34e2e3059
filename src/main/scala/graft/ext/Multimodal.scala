package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** [EXT] Multimodal-column plumbing: image/audio/video payloads modeled as
  * opaque `binary` columns with typed metadata, processed in partition-local
  * batches via the typed Dataset API.
  *
  * The actual codec work (JPEG decode, resampling, frame sampling) is STUBBED
  * — this container has no image/audio libraries — behind
  * [[MultimodalPipeline.decodeStub]], a deterministic fake that derives
  * pseudo-features from the payload bytes. Everything around the stub is the
  * real production shape: schema (binary + metadata struct), per-partition
  * batched iteration (the Scala analog of mapInPandas batch processing),
  * fixed-width feature vectors, and partition sizing notes for 100 TB
  * (payloads dominate row size → spark.sql.files.maxPartitionBytes governs
  * decode parallelism; features are emitted WITHOUT the payload column so the
  * downstream shuffle never moves raw media bytes).
  */
object Multimodal {
  type Q = (SparkSession, String) => DataFrame

  /** Typed media row: opaque payload + metadata (nulls where not applicable). */
  case class MediaRow(
      media_id: Long,
      kind: String,              // image | audio | video
      payload: Array[Byte],      // opaque encoded bytes
      width: Option[Int],        // image/video
      height: Option[Int],       // image/video
      sample_rate: Option[Int],  // audio
      duration_ms: Option[Long]) // audio/video

  /** Fixed-width extracted features (payload column intentionally dropped). */
  case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Int,
      features: Array[Double])

  object MultimodalPipeline {
    val featureDim = 8

    /** STUB — stands in for the real codec (e.g. JPEG decode + CNN pooling /
      * PCM resample + mel spectrogram). Deterministic: features are derived
      * from byte content only, so tests are exact. A real implementation
      * replaces ONLY this function; the Spark plumbing is unchanged. */
    def decodeStub(payload: Array[Byte], kind: String): Array[Double] = {
      val feats = new Array[Double](featureDim)
      var i = 0
      while (i < payload.length) {
        feats(i % featureDim) += (payload(i) & 0xff) / 255.0
        i += 1
      }
      val n = math.max(payload.length, 1).toDouble
      feats.map(f => math.rint(f / n * 1e6) / 1e6)
    }

    /** Batched per-partition feature extraction. Rows are processed in
      * `batchSize` groups so a real codec could amortize native-lib setup
      * (the mapInPandas batch-shape analog). */
    def extractFeatures(ds: Dataset[MediaRow], batchSize: Int = 64): Dataset[MediaFeatures] = {
      import ds.sparkSession.implicits._
      ds.mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          // real impl: load codec once per batch here
          batch.iterator.map { r =>
            MediaFeatures(r.media_id, r.kind, r.payload.length,
              decodeStub(r.payload, r.kind))
          }
        }
      }
    }

    /** Demo source: wraps documents as fake media payloads (UTF-8 bytes),
      * alternating kinds, with plausible metadata. */
    def fromDocuments(s: SparkSession, d: String): Dataset[MediaRow] = {
      import s.implicits._
      documents(s, d).select(col("doc_id"), col("text")).as[(Long, String)]
        .map { case (id, text) =>
          val payload = text.getBytes("UTF-8")
          (id % 3) match {
            case 0 => MediaRow(id, "image", payload,
              Some(64 + (id % 16).toInt * 8), Some(64), None, None)
            case 1 => MediaRow(id, "audio", payload,
              None, None, Some(16000), Some(payload.length.toLong * 10))
            case _ => MediaRow(id, "video", payload,
              Some(128), Some(72), None, Some(payload.length.toLong * 40))
          }
        }
    }
  }

  /** One decoded frame sampled from a video payload. */
  case class FrameRow(media_id: Long, frame_idx: Int, frame_ms: Long,
      payload: Array[Byte])

  object Transforms {
    import MultimodalPipeline._

    /** Image resize stage. The resample itself is the STUB (payload kept,
      * deterministic); the real part is the metadata contract: target dims
      * recorded, aspect handling decided here, non-images passed through. */
    def resize(ds: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
      import ds.sparkSession.implicits._
      ds.map { r =>
        if (r.kind == "image")
          // real impl: decode → resample to (w, h) → re-encode payload
          r.copy(width = Some(w), height = Some(h))
        else r
      }
    }

    /** Audio resample stage. The PCM resample itself is the STUB (payload
      * kept, deterministic); the real part is the metadata contract:
      * sample_rate rewritten, duration preserved (resampling changes rate,
      * not length), non-audio rows passed through untouched. */
    def resample(ds: Dataset[MediaRow], targetRate: Int): Dataset[MediaRow] = {
      import ds.sparkSession.implicits._
      ds.map { r =>
        if (r.kind == "audio")
          // real impl: decode PCM → polyphase resample → re-encode payload
          r.copy(sample_rate = Some(targetRate))
        else r
      }
    }

    /** Video frame sampling: one row per sampled frame every `everyMs` of
      * duration (row-expanding, like mapInPandas yielding multiple rows).
      * Frame payloads are deterministic byte slices standing in for the
      * decoded frames; emitted WITHOUT the source payload so the expansion
      * never amplifies raw video bytes through the shuffle. */
    def sampleFrames(ds: Dataset[MediaRow], everyMs: Long = 1000L): Dataset[FrameRow] = {
      import ds.sparkSession.implicits._
      ds.filter(_.kind == "video").flatMap { r =>
        val dur = r.duration_ms.getOrElse(0L)
        val n = math.min((dur / everyMs).toInt + 1, 8)
        (0 until n).iterator.map { i =>
          // real impl: codec seek + decode at t = i*everyMs
          val start = if (r.payload.length == 0) 0
            else (i * everyMs % math.max(r.payload.length, 1)).toInt
          val len = math.min(16, r.payload.length - start)
          FrameRow(r.media_id, i, i * everyMs,
            r.payload.slice(start, start + math.max(len, 0)))
        }
      }
    }
  }

  val queries: Map[String, Q] = Map(
    // End-to-end: documents → typed media rows → batched stub decode →
    // per-kind feature aggregates (payloads never cross a shuffle).
    "x_multimodal_features" -> ((s, d) => {
      val feats = MultimodalPipeline.extractFeatures(
        MultimodalPipeline.fromDocuments(s, d))
      feats.toDF()
        .select(col("media_id"), col("kind"), col("n_bytes"),
          round(element_at(col("features"), 1), 6).as("f0"),
          round(element_at(col("features"), 2), 6).as("f1"))
        .orderBy("media_id")
    }),

    // Full pipeline: resize images, frame-sample videos, decode features
    // for every sampled frame, aggregate per media row.
    "x_multimodal_frames" -> ((s, d) => {
      import s.implicits._
      val media = MultimodalPipeline.fromDocuments(s, d)
      val frames = Transforms.sampleFrames(Transforms.resize(media, 224, 224))
      frames.map { f =>
        (f.media_id, f.frame_idx,
          MultimodalPipeline.decodeStub(f.payload, "video").sum)
      }.toDF("media_id", "frame_idx", "feat_sum")
        .groupBy(col("media_id"))
        .agg(count(lit(1)).as("frame_cnt"),
          round(sum(col("feat_sum")), 6).as("feat_total"))
        .orderBy("media_id")
    })
  )

  /** Binary/codec path is not SQL-expressible → rows-only check. */
  val oracle: Map[String, String] = Map()
}
