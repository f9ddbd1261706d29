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

  // ---------------------------------------------------------- video

  /** Frame colors for one video scene id: [[VideoFingerprint.Frames]]
    * primary indices from a quadratic mixing recurrence chosen so the
    * 25 scene fingerprints are pairwise ≥ 20 Hamming bits apart with
    * all 16-bit bands distinct (verified by VideoDedupSpec) — scenes
    * never collide under the ≤3-bit near-dup join. */
  def sceneColorsFor(scene: Int): Seq[Int] =
    (0 until VideoFingerprint.Frames).map(k =>
      ((scene * 29 + k * 13 + scene * k * 7) % 101) % 3)

  /** One planted GIF CLIP per doc for the video near-dup path:
    * scene = id % 25 (docs sharing a scene are TRUE near-dups),
    * rendered at one of 3 resolutions (id % 3) — so same-scene clips
    * differ BYTE-wise (an exact hash misses every pair) while their
    * frame-class fingerprints are identical. Partition-wise like
    * every media stage; in production this node is the binaryFile
    * source. */
  def plantVideoGifs(ids: DataFrame): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    val dims = Array((4, 3), (6, 4), (8, 6))
    ids.select(col("doc_id")).as[Long].mapPartitions { it =>
      it.map { id =>
        val (w, h) = dims((id % 3).toInt)
        (id, gifBytes(sceneColorsFor((id % 25).toInt).map(primaries), w, h))
      }
    }.toDF("doc_id", "media")
  }

  // ------------------------------------------------- FLV screen video

  /** Encode an FLV / Screen Video v1 clip (the INTER-FRAME planted
    * probe): `frames(i)` lists one entry per 16×16 block in codec
    * order (bottom-left first, rows of blocks bottom-up) — Some(rgb)
    * writes the block as a zlib tile, None encodes the zero-length
    * "persist previous frame" entry. Frame 0 must be all-Some (the
    * keyframe). This is the encoder side of
    * [[VideoDecode.flvFramesSampled]]; VideoDecodeSpec round-trips
    * them and `q_video_interframe` gates the pair against an
    * arithmetic oracle. */
  def flvScreenBytes(frames: Seq[Seq[Option[Int]]], w: Int, h: Int): Array[Byte] = {
    require(frames.nonEmpty && frames.head.forall(_.nonEmpty),
      "frame 0 is the keyframe: every block must be present")
    val bw = 16; val bh = 16
    val blocksPerRow = (w + bw - 1) / bw
    val blockRows = (h + bh - 1) / bh
    require(frames.forall(_.length == blocksPerRow * blockRows),
      s"each frame needs ${blocksPerRow * blockRows} block entries")
    def deflate(raw: Array[Byte]): Array[Byte] = {
      val d = new java.util.zip.Deflater()
      try {
        d.setInput(raw); d.finish()
        val buf = new Array[Byte](raw.length + 64)
        val n = d.deflate(buf)
        require(d.finished(), "deflate buffer too small")
        buf.take(n)
      } finally d.end()
    }
    val out = new ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xff)
    def be16(v: Int): Unit = { u8(v >> 8); u8(v) }
    def be24(v: Int): Unit = { u8(v >> 16); u8(v >> 8); u8(v) }
    def be32(v: Long): Unit = { u8((v >> 24).toInt); u8((v >> 16).toInt); u8((v >> 8).toInt); u8(v.toInt) }
    // FLV header: signature, version 1, video-only flag, dataOffset 9
    out.write('F'); out.write('L'); out.write('V'); u8(1); u8(0x01); be32(9L)
    be32(0L) // PreviousTagSize0
    frames.zipWithIndex.foreach { case (blocks, fi) =>
      val payload = new ByteArrayOutputStream()
      def p8(v: Int): Unit = payload.write(v & 0xff)
      def p16(v: Int): Unit = { p8(v >> 8); p8(v) }
      val frameType = if (fi == 0) 1 else 2 // keyframe | interframe
      p8((frameType << 4) | 3)              // codec id 3 = Screen Video
      p16(((bw / 16 - 1) << 12) | w)
      p16(((bh / 16 - 1) << 12) | h)
      var bi = 0
      var y0 = 0
      while (y0 < h) {
        val tileH = math.min(bh, h - y0)
        var x0 = 0
        while (x0 < w) {
          val tileW = math.min(bw, w - x0)
          blocks(bi) match {
            case Some(rgb) =>
              // solid tile, rows bottom-up, pixels BGR
              val raw = new Array[Byte](tileW * tileH * 3)
              var i = 0
              while (i < tileW * tileH) {
                raw(i * 3) = (rgb & 0xff).toByte
                raw(i * 3 + 1) = ((rgb >> 8) & 0xff).toByte
                raw(i * 3 + 2) = ((rgb >> 16) & 0xff).toByte
                i += 1
              }
              val z = deflate(raw)
              p16(z.length); payload.write(z, 0, z.length)
            case None => p16(0) // persist
          }
          bi += 1
          x0 += bw
        }
        y0 += bh
      }
      val body = payload.toByteArray
      u8(9); be24(body.length)               // tag type video, dataSize
      be24(fi * 40); u8(0); be24(0)          // timestamp, streamId
      out.write(body, 0, body.length)
      be32(11L + body.length)                // PreviousTagSize
    }
    out.toByteArray
  }

  /** One planted Screen-Video FLV per doc for the INTER-FRAME decode
    * gate: 32×16 canvas = two 16×16 blocks [left, right];
    * 2 + id%3 frames. The keyframe paints left = primary id%3 and
    * right = primary (id+1)%3; interframe i updates ONLY one block —
    * right when i is odd, left when i is even — to primary
    * (id + 2i)%3, the other block PERSISTING through the codec's
    * zero-length entry. Every frame after the first is therefore
    * readable only through carried state, which is what the gate
    * verifies arithmetically. */
  def plantFlvs(ids: DataFrame): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(col("doc_id")).as[Long].mapPartitions { it =>
      it.map { id =>
        val n = (2 + id % 3).toInt
        val key = Seq(Some(primaries(((id % 3) + 3).toInt % 3)),
          Some(primaries((((id + 1) % 3) + 3).toInt % 3)))
        val inter = (1 until n).map { i =>
          val c = Some(primaries((((id + 2 * i) % 3) + 3).toInt % 3))
          if (i % 2 == 1) Seq(None, c) else Seq(c, None)
        }
        (id, flvScreenBytes(key +: inter, 32, 16))
      }
    }.toDF("doc_id", "media")
  }

  // ---------------------------------------------------------- audio

  /** Segments per clip (= fingerprint windows + 1: 65 segments give
    * the 64 energy-delta bits of [[AudioFingerprint]]). */
  val WavSegments = 65
  /** Samples per segment; total clip = 65 × 400 = 26 000 samples, so
    * the fingerprint's frames/65 windows align exactly on segment
    * boundaries. */
  val WavSamplesPerSeg = 400
  val WavSampleRate = 8000

  /** The amplitude-level sequence for one melody id: 65 levels drawn
    * from 7 steps (0.15 … 0.75) by a fixed mixing recurrence, with a
    * bump rule guaranteeing ADJACENT SEGMENTS ALWAYS DIFFER — the
    * energy comparison between neighboring windows then has a gap far
    * above 16-bit quantization noise, which is what makes the
    * fingerprint volume-invariant and the pair oracle arithmetic. */
  def levelsFor(melody: Int): Seq[Double] = {
    var prev = -1
    (0 until WavSegments).map { k =>
      var v = ((melody * 31 + k * 13) % 97) % 7
      if (v == prev) v = (v + 1) % 7
      prev = v
      0.15 + 0.1 * v
    }
  }

  /** Mono 16-bit PCM WAV of a 440 Hz tone whose amplitude steps
    * through `levels`, one segment per level, written via the JDK's
    * AudioSystem (no codec library). */
  def wavBytes(levels: Seq[Double], volume: Double): Array[Byte] = {
    val n = levels.length * WavSamplesPerSeg
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val a = levels(i / WavSamplesPerSeg) * volume
      val s = math.round(a * math.sin(2.0 * math.Pi * 440.0 * i / WavSampleRate)
        * 32767.0).toInt
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
      WavSampleRate.toFloat, 16, 1, 2, WavSampleRate.toFloat, false)
    val in = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val out = new ByteArrayOutputStream()
    try {
      javax.sound.sampled.AudioSystem.write(
        in, javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    } finally { in.close(); out.close() }
  }

  /** One planted WAV per doc: melody = id % 40 (docs sharing a melody
    * are TRUE near-dups), volume = 0.5 + 0.25·(id % 3) (so their BYTES
    * differ — an exact-hash dedup misses them; the energy-delta
    * fingerprint does not). Partition-wise like every media stage. */
  def plantWavs(ids: DataFrame): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(col("doc_id")).as[Long].mapPartitions { it =>
      it.map { id =>
        val vol = 0.5 + 0.25 * (id % 3)
        (id, wavBytes(levelsFor((id % 40).toInt), vol))
      }
    }.toDF("doc_id", "media")
  }
}
