package graft.multimodal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Typed metadata extracted from an opaque media blob. */
case class MediaMeta(doc_id: Long, byte_len: Long, magic_hex: String, width: Long, height: Long)

/** Sample-level audio decode output: PCM parameters and per-clip
  * signal stats. */
case class DecodedAudio(
    doc_id: Long, sample_rate: Long, channels: Int, frames: Long,
    duration_ms: Long, rms: Double, peak: Double, decoded: Boolean)

/** Frame-level video decode output: one row per sampled frame with
  * per-frame channel-mean features. */
case class DecodedFrame(
    doc_id: Long, frame_no: Long, width: Long, height: Long,
    mean_r: Double, mean_g: Double, mean_b: Double, decoded: Boolean)

/** Pixel-level decode output: dims, channel-mean features, and the
  * byte length of the real resampled thumbnail. */
case class DecodedImage(
    doc_id: Long, width: Long, height: Long,
    mean_r: Double, mean_g: Double, mean_b: Double,
    thumb_bytes: Long, decoded: Boolean)

/** Multimodal column plumbing: media as opaque `binary` columns with
  * typed metadata, decoded batch-wise inside the executors.
  *
  * The reference pipeline has no media path; this is the brief-mandated
  * scale component. IMAGE decode is fully REAL: header fields via
  * [[MediaCodecs]] (pure byte parsing) and pixel decode / channel-mean
  * features / bilinear resample via [[ImageDecode]] (JDK ImageIO —
  * PNG/JPEG/BMP/GIF, no external library). AUDIO decode is fully REAL:
  * WAV headers via [[MediaCodecs]] and PCM sample decode / signal
  * stats via [[AudioDecode]] (JDK javax.sound.sampled). VIDEO frame
  * decode is REAL for the two container/codec combos the JDK can
  * decode — animated GIF and MJPEG-in-AVI ([[VideoDecode]]); inter-
  * frame codecs (H.264 …) genuinely need a codec library this
  * container lacks and stay a disclosed stub ([[sampleFrames]] keeps
  * the offset-only fallback shape for them). The Spark-side plumbing
  * is the same either way: binary column ingestion, partition-wise
  * typed `mapPartitions` (the Scala analogue of `mapInPandas` batch
  * decode), and a deterministic schema downstream queries join
  * against.
  */
object BinaryDocs {

  /** REAL pixel decode + feature-extract + resize over the binary
    * column, batch-wise per partition: JDK ImageIO decodes PNG/JPEG/
    * BMP/GIF pixels ([[ImageDecode]] — no external codec library),
    * channel means are the extracted features, and the thumbnail is a
    * real bilinear resample. Rows whose bytes aren't a decodable
    * image come back with decoded=false instead of killing the task. */
  def decodeImages(bin: DataFrame, maxW: Int = 64, maxH: Int = 64): DataFrame = {
    val spark = bin.sparkSession
    import spark.implicits._
    bin.select(col("doc_id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          // one ImageIO decode serves both the stats and the thumbnail
          ImageDecode.decodeWithThumb(bytes, maxW, maxH) match {
            case Some((p, thumb)) =>
              DecodedImage(id, p.width.toLong, p.height.toLong,
                p.meanR, p.meanG, p.meanB,
                thumb.map(_.length.toLong).getOrElse(0L), decoded = true)
            case None =>
              DecodedImage(id, 0L, 0L, 0.0, 0.0, 0.0, 0L, decoded = false)
          }
        }
      }
      .toDF()
  }

  /** PERCEPTUAL image near-dup pairs over the binary column — the
    * image half of corpus dedup (#36c handles text): every decodable
    * blob gets a 64-bit dHash ([[ImageDecode.dhash]], real pixel
    * decode), and pairs within `maxDist` Hamming bits are returned.
    *
    * Candidate generation is BANDED exact matching, not all-pairs:
    * the hash splits into 4 × 16-bit bands; by pigeonhole, two
    * hashes within Hamming distance ≤ 3 agree on at least one whole
    * band, so the 4-way band index is provably COMPLETE for
    * maxDist ≤ 3 (the prefix-filter theorem's shape, applied to
    * bits). Each band bucket is an equi-join key; the verify is a
    * row-local `bit_count(xor)`. Identical pixels under different
    * encodings (PNG vs BMP) hash identically — distance 0.
    *
    * @param bin (doc_id, media binary)
    * @return (doc_a, doc_b, hamming) pairs, hamming ≤ maxDist */
  def imageNearDupPairs(bin: DataFrame, maxDist: Int = 3): DataFrame = {
    val spark = bin.sparkSession
    import spark.implicits._
    val hashes = bin.select(col("doc_id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          ImageDecode.dhashBytes(bytes).map(h => (id, h))
        }
      }
      .toDF("doc_id", "h")
    bandedHammingPairs(hashes, maxDist)
  }

  /** Shared banded-Hamming pair join over a 64-bit (doc_id, h) hash
    * frame — the candidate shape all three media dedup members
    * (image dHash, audio energy-delta, video frame-class) use. The
    * hash splits into 4 × 16-bit bands; by pigeonhole two hashes
    * within Hamming ≤ 3 agree on at least one whole band, so the
    * 4-way band index is provably COMPLETE for maxDist ≤ 3 (the
    * prefix-filter theorem's shape, applied to bits). Each band
    * bucket is an equi-join key; the verify is a row-local
    * `bit_count(xor)`. */
  private[multimodal] def bandedHammingPairs(
      hashes: DataFrame, maxDist: Int): DataFrame = {
    require(maxDist <= 3, "4-band index is only complete for maxDist <= 3")
    val banded = hashes.select(col("doc_id"), col("h"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"),
          shiftright(col("h"), b * 16).bitwiseAND(lit(0xffffL)).as("key"))): _*)).as("bk"))
      .select(col("doc_id"), col("h"), col("bk.band"), col("bk.key"))
    banded.as("a")
      .join(banded.as("b").hint("shuffle_hash"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.h").bitwiseXOR(col("b.h"))).as("hamming"))
      // filter BEFORE distinct: the Hamming predicate is row-local and
      // band collisions vastly outnumber true near-dups, so pruning
      // first keeps far pairs out of the distinct's shuffle
      .filter(col("hamming") <= maxDist)
      .distinct()
  }

  /** Near-duplicate AUDIO pairs over a binary media column: each clip
    * gets the 64-bit energy-delta fingerprint
    * ([[AudioFingerprint]], real PCM decode), and pairs within
    * `maxDist` Hamming bits are returned — the audio member of the
    * multimodal dedup family beside [[imageNearDupPairs]]' dHash.
    *
    * Same provably-complete candidate shape: the fingerprint splits
    * into 4 × 16-bit bands; two hashes within Hamming ≤ 3 agree on a
    * whole band by pigeonhole, each band bucket is an equi-join key,
    * the verify is a row-local `bit_count(xor)`. Volume-scaled
    * re-encodes of the same material fingerprint identically —
    * distance 0 — where their byte hashes all differ.
    *
    * @param bin (doc_id, media binary)
    * @return (doc_a, doc_b, hamming) pairs, hamming ≤ maxDist */
  def audioNearDupPairs(bin: DataFrame, maxDist: Int = 3): DataFrame = {
    val spark = bin.sparkSession
    import spark.implicits._
    val hashes = bin.select(col("doc_id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          AudioFingerprint.fingerprint(bytes).map(h => (id, h))
        }
      }
      .toDF("doc_id", "h")
    bandedHammingPairs(hashes, maxDist)
  }

  /** Near-duplicate VIDEO pairs over a binary media column: each clip
    * gets the 64-bit frame-class fingerprint ([[VideoFingerprint]],
    * real GIF/MJPEG frame decode), and pairs within `maxDist` Hamming
    * bits come back through the same provably-complete 4×16-bit
    * banded join as [[imageNearDupPairs]] / [[audioNearDupPairs]] —
    * the video member of the multimodal dedup family. Re-renders of
    * the same frame sequence at a DIFFERENT resolution have different
    * bytes (an exact hash misses them) but identical fingerprints
    * (the per-frame dominant-channel class is resolution-invariant). */
  def videoNearDupPairs(bin: DataFrame, maxDist: Int = 3): DataFrame = {
    val spark = bin.sparkSession
    import spark.implicits._
    val hashes = bin.select(col("doc_id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          VideoFingerprint.fingerprint(bytes).map(h => (id, h))
        }
      }
      .toDF("doc_id", "h")
    bandedHammingPairs(hashes, maxDist)
  }

  /** REAL audio PCM sample decode over the binary column, batch-wise
    * per partition: `javax.sound.sampled` ([[AudioDecode]], in the
    * JDK) converts WAV payloads to 16-bit PCM and reduces them to
    * per-clip stats (frames, duration, RMS, peak) in one streaming
    * pass. Undecodable rows come back decoded=false instead of killing
    * the task. Stats are rounded to 6 places for deterministic
    * downstream comparison. */
  def decodeAudio(bin: DataFrame): DataFrame = {
    val spark = bin.sparkSession
    import spark.implicits._
    bin.select(col("doc_id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          AudioDecode.decode(bytes) match {
            case Some(a) =>
              DecodedAudio(id, a.sampleRate, a.channels, a.frames, a.durationMs,
                math.rint(a.rms * 1e6) / 1e6, math.rint(a.peak * 1e6) / 1e6,
                decoded = true)
            case None =>
              DecodedAudio(id, 0L, 0, 0L, 0L, 0.0, 0.0, decoded = false)
          }
        }
      }
      .toDF()
  }

  /** Ingest: treat utf-8 text bytes as the opaque media column (in a
    * real pipeline this is the image/audio/video payload). */
  def toBinary(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"), encode(col(textCol), "utf-8").as("media"))

  /** Resize metadata transform: scales decoded dims to fit a bounding
    * box preserving aspect ratio (integer math — deterministic). The
    * pixel-level resample belongs in the same partition-wise decode
    * stage; here only the metadata contract is computed. */
  def resizeMeta(meta: DataFrame, maxW: Long, maxH: Long): DataFrame = {
    val scaleNum = least(lit(maxW) * col("height"), lit(maxH) * col("width"))
    val scaleDen = col("width") * col("height")
    meta
      .withColumn("out_width",
        when(col("width") <= 0 || col("height") <= 0, 0L)
          .otherwise((col("width") * scaleNum / scaleDen).cast("long")))
      .withColumn("out_height",
        when(col("width") <= 0 || col("height") <= 0, 0L)
          .otherwise((col("height") * scaleNum / scaleDen).cast("long")))
  }

  /** REAL video frame decode + sampling over the binary column,
    * batch-wise per partition: [[VideoDecode]] (pure JDK) decodes
    * every frame of an animated GIF or an MJPEG AVI and this emits
    * every `stride`-th frame's pixel stats — one row per SAMPLED
    * frame, the explode shape a frame-level feature extractor
    * consumes. Blobs in codecs the JDK cannot decode (or corrupt
    * blobs) come back as a single decoded=false row instead of
    * killing the task. Stats rounded to 6 places for deterministic
    * comparison. */
  def decodeVideo(bin: DataFrame, stride: Int = 1): DataFrame = {
    val spark = bin.sparkSession
    import spark.implicits._
    require(stride >= 1, s"stride must be >= 1, got $stride")
    bin.select(col("doc_id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          // stride is pushed INTO the decode: unsampled frames are
          // never pixel-decoded (at stride 32 that is ~32x less work)
          VideoDecode.decodeSampled(bytes, stride) match {
            case Some(frames) =>
              frames.iterator.map { case (i, p) =>
                DecodedFrame(id, i.toLong, p.width.toLong, p.height.toLong,
                  math.rint(p.meanR * 1e6) / 1e6,
                  math.rint(p.meanG * 1e6) / 1e6,
                  math.rint(p.meanB * 1e6) / 1e6, decoded = true)
              }
            case None => // incl. null blobs — never a task death
              Iterator.single(
                DecodedFrame(id, 0L, 0L, 0L, 0.0, 0.0, 0.0, decoded = false))
          }
        }
      }
      .toDF()
  }

  /** Frame-sampling FALLBACK for codecs outside [[VideoDecode]]'s
    * reach (inter-frame codecs need a library this container lacks):
    * every `stride`-th byte offset stands in for a frame index.
    * Emits (doc_id, frame_no, byte_offset) rows — same explode shape
    * as [[decodeVideo]]. */
  def sampleFrames(bin: DataFrame, stride: Int): DataFrame =
    bin.select(col("doc_id"),
        org.apache.spark.sql.functions.length(col("media")).cast("long").as("byte_len"))
      .withColumn("frame_no",
        explode(sequence(lit(0L),
          greatest(((col("byte_len") - 1) / stride).cast("long"), lit(0L)))))
      .select(col("doc_id"), col("frame_no"),
        (col("frame_no") * stride).as("byte_offset"))

  /** Batch decode: per-partition iteration over the binary payloads,
    * emitting typed metadata (the shape a 100 TB media scan needs —
    * any per-codec init happens once per partition, not per row).
    *
    * REAL for header-carrying containers: BMP/PNG/JPEG dimensions and
    * WAV parameters are parsed from bytes ([[MediaCodecs]], pure
    * byte arithmetic — no codec library). For unknown formats the
    * (width, height) fields fall back to a DETERMINISTIC placeholder
    * derived from the byte length (disclosed stub: full pixel/sample
    * decode of compressed payloads needs codec libs not present in
    * this container). */
  def extractMeta(bin: DataFrame): DataFrame = {
    val spark = bin.sparkSession
    import spark.implicits._
    bin.select(col("doc_id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, null) => MediaMeta(id, 0L, "", 0L, 0L)
          case (id, bytes) =>
          val len   = bytes.length.toLong
          val magic = bytes.take(4).map("%02x".format(_)).mkString
          MediaCodecs.decodeImage(bytes) match {
            case Some(m) => MediaMeta(id, len, magic, m.width, m.height)
            case None =>
              MediaCodecs.decodeWav(bytes) match {
                // audio has no dims; carry (sampleRate, channels) in the
                // dimension slots of the shared metadata contract
                case Some(a) => MediaMeta(id, len, magic, a.sampleRate, a.channels.toLong)
                case None =>
                  VideoDecode.meta(bytes) match {
                    case Some(v) => MediaMeta(id, len, magic, v.width, v.height)
                    case None    => MediaMeta(id, len, magic, len % 640, len % 480)
                  }
              }
          }
        }
      }
      .toDF()
  }
}
