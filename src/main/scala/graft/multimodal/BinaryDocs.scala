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
