package graft.multimodal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Typed metadata extracted from an opaque media blob. */
case class MediaMeta(doc_id: Long, byte_len: Long, magic_hex: String, width: Long, height: Long)

/** Multimodal column plumbing: media as opaque `binary` columns with
  * typed metadata, decoded batch-wise inside the executors.
  *
  * The reference pipeline has no media path; this is the brief-mandated
  * scale component. The decode step is a STUB — image/audio codecs are
  * not in this container — but the Spark-side plumbing is real: binary
  * column ingestion, partition-wise typed `mapPartitions` (the Scala
  * analogue of `mapInPandas` batch decode), and a deterministic
  * metadata schema that downstream queries join against.
  */
object BinaryDocs {

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

  /** Frame-sampling stub: every `stride`-th byte offset stands in for
    * a decoded video frame index (a real codec would seek keyframes).
    * Emits (doc_id, frame_no, byte_offset) rows — the explode shape a
    * frame-level feature extractor consumes. */
  def sampleFrames(bin: DataFrame, stride: Int): DataFrame =
    bin.select(col("doc_id"),
        org.apache.spark.sql.functions.length(col("media")).cast("long").as("byte_len"))
      .withColumn("frame_no",
        explode(sequence(lit(0L),
          greatest(((col("byte_len") - 1) / stride).cast("long"), lit(0L)))))
      .select(col("doc_id"), col("frame_no"),
        (col("frame_no") * stride).as("byte_offset"))

  /** Batch decode stub: per-partition iteration over the binary
    * payloads, emitting typed metadata. Replace the body marked STUB
    * with a real codec call (one codec init per partition, streaming
    * over the batch — the shape a 100 TB media scan needs). */
  def extractMeta(bin: DataFrame): DataFrame = {
    val spark = bin.sparkSession
    import spark.implicits._
    bin.select(col("doc_id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // one decoder instance per partition would be initialized here
        it.map { case (id, bytes) =>
          val len   = bytes.length.toLong
          val magic = bytes.take(4).map("%02x".format(_)).mkString
          // STUB: deterministic fake of a decoder's (width, height);
          // a real implementation returns the codec's header fields.
          MediaMeta(id, len, magic, len % 640, len % 480)
        }
      }
      .toDF()
  }
}
