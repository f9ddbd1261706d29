package graft.multimodal

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO
import javax.imageio.stream.MemoryCacheImageOutputStream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic synthetic media — the planted-probe pattern (#70/#79/
  * #157) applied to VIDEO. The synthetic corpus ships no real media,
  * so each doc_id plants an animated GIF whose frame count, dimensions
  * and solid frame colors are pure functions of the id; the REAL
  * decode path ([[VideoDecode]]: GIF container walk + JDK pixel
  * decode) then has an arithmetically replayable DuckDB oracle — a
  * regression in the container walk, frame ordering, palette handling
  * or channel stats breaks an exact-hash gate instead of hiding
  * behind spec-only coverage.
  *
  * Solid primary frames survive GIF palette quantization exactly
  * (means decode to 255.0/0.0 — VideoDecodeSpec pins this), which is
  * what makes the integer-exact gate possible.
  */
object SyntheticMedia {
  private val primaries = Array(0xff0000, 0x00ff00, 0x0000ff)

  /** Animated GIF of solid-color frames via the JDK's ImageIO writer. */
  def gifBytes(colors: Seq[Int], w: Int, h: Int): Array[Byte] = {
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val out = new ByteArrayOutputStream()
    val ios = new MemoryCacheImageOutputStream(out)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      colors.foreach { c =>
        val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
        val g = img.createGraphics()
        g.setColor(new java.awt.Color(c)); g.fillRect(0, 0, w, h); g.dispose()
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
      }
      writer.endWriteSequence(); ios.flush()
    } finally {
      writer.dispose()
      // per-row hot path: release the memory-cache buffer eagerly
      // rather than waiting on GC
      try ios.close() finally out.close()
    }
    out.toByteArray
  }

  /** One planted GIF per doc — 1 + id%3 frames, (4+id%5)×(3+id%4) px,
    * frame i solid primary (id+i)%3 (0 red, 1 green, 2 blue). Runs
    * partition-wise like every media stage; in production this node is
    * the binaryFile source, not a generator. */
  def plantGifs(ids: DataFrame): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(col("doc_id")).as[Long].mapPartitions { it =>
      it.map { id =>
        val n = (1 + id % 3).toInt
        val w = (4 + id % 5).toInt
        val h = (3 + id % 4).toInt
        (id, gifBytes((0 until n).map(i => primaries(((id + i) % 3).toInt)), w, h))
      }
    }.toDF("doc_id", "media")
  }
}
