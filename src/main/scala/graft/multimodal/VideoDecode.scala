package graft.multimodal

import java.io.ByteArrayInputStream

import javax.imageio.ImageIO

import scala.collection.mutable.ArrayBuffer

/** REAL video frame decode on the pure JDK for the two container/codec
  * combinations the JDK can actually decode without an external
  * library:
  *
  *  - animated GIF — `javax.imageio`'s GIF reader exposes every frame
  *    of the animation (`getNumImages`/`read(i)`);
  *  - MJPEG-in-AVI — AVI is a RIFF container (same chunk grammar as
  *    WAV, see [[MediaCodecs.decodeWav]]); Motion-JPEG stores each
  *    frame as an independent JPEG in a `00dc`/`00db` chunk of the
  *    `movi` LIST, which ImageIO's JPEG codec decodes frame by frame.
  *
  * Inter-frame codecs (H.264 etc.) genuinely need a codec library not
  * present in this container and remain out of scope — detection
  * returns None and the caller records decoded=false.
  *
  * All entry points are total: malformed input returns None, never
  * throws. Chunk offsets are tracked in Long so a corrupt 32-bit chunk
  * size can only terminate the walk, never step backward or loop
  * (the decodeWav lesson). Frame count is capped ([[MaxFrames]]) so a
  * hostile header cannot balloon executor memory.
  */
object VideoDecode {

  /** Upper bound on decoded frames per blob — bounds memory on a
    * hostile/corrupt frame index; real sampling strides skip most
    * frames anyway. */
  val MaxFrames = 4096

  final case class VideoMeta(format: String, width: Long, height: Long, nFrames: Long)

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def le32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong | (u8(b, i + 1).toLong << 8) |
      (u8(b, i + 2).toLong << 16) | (u8(b, i + 3).toLong << 24)) & 0xffffffffL
  private def fourcc(b: Array[Byte], i: Int): String =
    new String(b.slice(i, i + 4), "US-ASCII")

  /** Container sniffing: animated-capable formats only. */
  def detectFormat(b: Array[Byte]): String =
    if (b.length >= 6 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8') "gif"
    else if (b.length >= 12 && fourcc(b, 0) == "RIFF" && fourcc(b, 8) == "AVI ") "avi"
    else "unknown"

  /** All frames of an animated GIF as per-frame pixel stats. A
    * single-frame GIF is a 1-frame video. Frames are decoded as
    * stored (no disposal-method compositing — features per stored
    * frame are what a sampling pipeline consumes). */
  def gifFrames(bytes: Array[Byte]): Option[Vector[ImageDecode.Pixels]] = {
    if (detectFormat(bytes) != "gif") return None
    try {
      val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
      try {
        val readers = ImageIO.getImageReaders(iis)
        if (!readers.hasNext) return None
        val r = readers.next()
        r.setInput(iis, false, true)
        try {
          val n = math.min(r.getNumImages(true), MaxFrames)
          if (n <= 0) None
          else Some((0 until n).map(i => ImageDecode.stats(r.read(i))).toVector)
        } finally r.dispose()
      } finally iis.close()
    } catch { case _: Throwable => None }
  }

  /** Walk an AVI RIFF tree and return the payloads of the video
    * frame chunks (`00dc`/`00db`, also inside `rec ` groups). */
  private def aviFramePayloads(b: Array[Byte]): Vector[Array[Byte]] = {
    val out = ArrayBuffer.empty[Array[Byte]]
    // (start, end) spans of chunk lists still to walk, seeded with the
    // RIFF body; LIST bodies push their own span (iterative, no
    // recursion on untrusted depth)
    var spans = List((12L, math.min(12L + le32(b, 4) - 4L, b.length.toLong)))
    while (spans.nonEmpty && out.length < MaxFrames) {
      val (start, end) = spans.head
      spans = spans.tail
      var i = start
      while (i + 8 <= end && out.length < MaxFrames) {
        val o = i.toInt
        val id = fourcc(b, o)
        val size = le32(b, o + 4) // unsigned, >= 0
        val body = i + 8
        if (id == "LIST" && size >= 4 && body + 4 <= end) {
          // walk the list body after its 4-byte type tag
          spans = (body + 4, math.min(body + size, end)) :: spans
        } else if ((id.endsWith("dc") || id.endsWith("db")) && size > 0 &&
          body + size <= end) {
          out += b.slice(body.toInt, (body + size).toInt)
        }
        i = body + size + (size & 1L) // word-aligned; step >= 8
      }
    }
    out.toVector
  }

  /** All MJPEG frames of an AVI as per-frame pixel stats: each
    * `00dc`/`00db` payload is an independent JPEG decoded by ImageIO.
    * Undecodable payloads are skipped; None if the container yields no
    * decodable frame at all. */
  def aviFrames(bytes: Array[Byte]): Option[Vector[ImageDecode.Pixels]] = {
    if (detectFormat(bytes) != "avi") return None
    try {
      val frames = aviFramePayloads(bytes).flatMap(ImageDecode.decode)
      if (frames.isEmpty) None else Some(frames)
    } catch { case _: Throwable => None }
  }

  /** Per-frame pixel stats for any supported container. */
  def decode(bytes: Array[Byte]): Option[Vector[ImageDecode.Pixels]] =
    detectFormat(bytes) match {
      case "gif" => gifFrames(bytes)
      case "avi" => aviFrames(bytes)
      case _     => None
    }

  /** Header-level metadata without decoding frames: AVI `avih`
    * (dwTotalFrames at +16, dwWidth/dwHeight at +32/+36 of the chunk
    * body) or the GIF logical screen descriptor + frame count. */
  def meta(bytes: Array[Byte]): Option[VideoMeta] = detectFormat(bytes) match {
    case "avi" =>
      try {
        // avih lives in LIST hdrl — find it with the same flat walk,
        // descending into LISTs
        var spans = List((12L, math.min(12L + le32(bytes, 4) - 4L, bytes.length.toLong)))
        while (spans.nonEmpty) {
          val (start, end) = spans.head
          spans = spans.tail
          var i = start
          while (i + 8 <= end) {
            val o = i.toInt
            val id = fourcc(bytes, o)
            val size = le32(bytes, o + 4)
            val body = i + 8
            if (id == "LIST" && size >= 4 && body + 4 <= end)
              spans = (body + 4, math.min(body + size, end)) :: spans
            else if (id == "avih" && size >= 40 && body + 40 <= end) {
              val ob = body.toInt
              return Some(VideoMeta("avi",
                le32(bytes, ob + 32), le32(bytes, ob + 36), le32(bytes, ob + 16)))
            }
            i = body + size + (size & 1L)
          }
        }
        None
      } catch { case _: Throwable => None }
    case "gif" =>
      // width/height LE16 at offsets 6/8 of the logical screen
      // descriptor; frame count needs the reader
      if (bytes.length < 10) None
      else {
        val w = (u8(bytes, 6) | (u8(bytes, 7) << 8)).toLong
        val h = (u8(bytes, 8) | (u8(bytes, 9) << 8)).toLong
        val n = gifFrames(bytes).map(_.length.toLong).getOrElse(0L)
        if (n == 0) None else Some(VideoMeta("gif", w, h, n))
      }
    case _ => None
  }
}
