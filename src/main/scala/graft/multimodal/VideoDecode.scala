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

  /** Container sniffing: animated-capable formats only. Null-safe —
    * a null blob (failed upstream fetch) is "unknown", not an NPE in
    * the middle of a task. */
  def detectFormat(b: Array[Byte]): String =
    if (b == null) "unknown"
    else if (b.length >= 6 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8') "gif"
    else if (b.length >= 12 && fourcc(b, 0) == "RIFF" && fourcc(b, 8) == "AVI ") "avi"
    else "unknown"

  /** Every `stride`-th frame of an animated GIF as (frame index,
    * pixel stats). A single-frame GIF is a 1-frame video. Frames are
    * decoded as stored (no disposal-method compositing — features per
    * stored frame are what a sampling pipeline consumes). Unsampled
    * frames are never pixel-decoded — the reader seeks past them. */
  def gifFramesSampled(
      bytes: Array[Byte], stride: Int = 1): Option[Vector[(Int, ImageDecode.Pixels)]] = {
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
          else Some((0 until n by stride)
            .map(i => i -> ImageDecode.stats(r.read(i))).toVector)
        } finally r.dispose()
      } finally iis.close()
    } catch { case _: Throwable => None }
  }

  /** All frames of an animated GIF as per-frame pixel stats. */
  def gifFrames(bytes: Array[Byte]): Option[Vector[ImageDecode.Pixels]] =
    gifFramesSampled(bytes, 1).map(_.map(_._2))

  /** Frame COUNT of a GIF without decoding any pixels — the reader
    * seeks the image stream ([[ImageDecode.stats]] never runs). */
  def gifFrameCount(bytes: Array[Byte]): Option[Int] = {
    if (detectFormat(bytes) != "gif") return None
    try {
      val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
      try {
        val readers = ImageIO.getImageReaders(iis)
        if (!readers.hasNext) return None
        val r = readers.next()
        r.setInput(iis, false, true)
        try {
          val n = r.getNumImages(true)
          if (n <= 0) None else Some(math.min(n, MaxFrames))
        } finally r.dispose()
      } finally iis.close()
    } catch { case _: Throwable => None }
  }

  /** Depth-first, DOCUMENT-ORDER walk of a RIFF chunk tree (iterative
    * — no recursion on untrusted depth). On hitting a LIST, the
    * remainder of the current span is stacked and the walk continues
    * INSIDE the list immediately, so chunks are visited exactly in
    * file order — an interleaved AVI that wraps each frame in its own
    * `rec ` LIST still yields frames in sequence (a naive
    * collect-then-descend walk would reverse them). `visit` returns
    * false to stop the walk. */
  private def walkRiff(b: Array[Byte])(visit: (String, Long, Long) => Boolean): Unit = {
    var stack = List((12L, math.min(12L + le32(b, 4) - 4L, b.length.toLong)))
    var done = false
    while (!done && stack.nonEmpty) {
      var (i, end) = stack.head
      stack = stack.tail
      var descend = false
      while (!done && !descend && i + 8 <= end) {
        val o = i.toInt
        val id = fourcc(b, o)
        val size = le32(b, o + 4) // unsigned, >= 0
        val body = i + 8
        val next = body + size + (size & 1L) // word-aligned; step >= 8
        if (id == "LIST" && size >= 4 && body + 4 <= end) {
          // resume this span after the list, AFTER walking its body
          stack = (body + 4, math.min(body + size, end)) :: (next, end) :: stack
          descend = true
        } else {
          if (!visit(id, body, size)) done = true
          i = next
        }
      }
    }
  }

  /** Payloads of the video frame chunks (`00dc`/`00db`, bare or
    * inside `rec ` groups), in file order. */
  private def aviFramePayloads(b: Array[Byte]): Vector[Array[Byte]] = {
    val out = ArrayBuffer.empty[Array[Byte]]
    walkRiff(b) { (id, body, size) =>
      if ((id.endsWith("dc") || id.endsWith("db")) && size > 0 &&
        body + size <= b.length) {
        out += b.slice(body.toInt, (body + size).toInt)
      }
      out.length < MaxFrames
    }
    out.toVector
  }

  /** Every `stride`-th MJPEG frame of an AVI as (frame index, pixel
    * stats): each sampled `00dc`/`00db` payload is an independent
    * JPEG decoded by ImageIO — unsampled frames are never decoded
    * (MJPEG frames are independent, so the stride filter legally
    * precedes the decode). Undecodable sampled payloads are skipped;
    * None if the container yields no decodable frame at all. */
  def aviFramesSampled(
      bytes: Array[Byte], stride: Int = 1): Option[Vector[(Int, ImageDecode.Pixels)]] = {
    if (detectFormat(bytes) != "avi") return None
    try {
      val frames = aviFramePayloads(bytes).zipWithIndex
        .collect { case (p, i) if i % stride == 0 => i -> p }
        .flatMap { case (i, p) => ImageDecode.decode(p).map(i -> _) }
      if (frames.isEmpty) None else Some(frames)
    } catch { case _: Throwable => None }
  }

  /** All MJPEG frames of an AVI as per-frame pixel stats. */
  def aviFrames(bytes: Array[Byte]): Option[Vector[ImageDecode.Pixels]] =
    aviFramesSampled(bytes, 1).map(_.map(_._2))

  /** Every `stride`-th frame's (index, pixel stats) for any supported
    * container — the sampling entry point: unsampled frames are never
    * pixel-decoded in either container. */
  def decodeSampled(
      bytes: Array[Byte], stride: Int = 1): Option[Vector[(Int, ImageDecode.Pixels)]] =
    detectFormat(bytes) match {
      case "gif" => gifFramesSampled(bytes, stride)
      case "avi" => aviFramesSampled(bytes, stride)
      case _     => None
    }

  /** Per-frame pixel stats for any supported container. */
  def decode(bytes: Array[Byte]): Option[Vector[ImageDecode.Pixels]] =
    decodeSampled(bytes, 1).map(_.map(_._2))

  /** Header-level metadata without decoding frame PIXELS: AVI `avih`
    * (dwTotalFrames at +16, dwWidth/dwHeight at +32/+36 of the chunk
    * body) or the GIF logical screen descriptor + a pixel-free frame
    * count ([[gifFrameCount]] — the reader seeks the stream, stats
    * never run). */
  def meta(bytes: Array[Byte]): Option[VideoMeta] = detectFormat(bytes) match {
    case "avi" =>
      try {
        var found: Option[VideoMeta] = None
        walkRiff(bytes) { (id, body, size) =>
          if (id == "avih" && size >= 40 && body + 40 <= bytes.length) {
            val ob = body.toInt
            found = Some(VideoMeta("avi",
              le32(bytes, ob + 32), le32(bytes, ob + 36), le32(bytes, ob + 16)))
          }
          found.isEmpty
        }
        found
      } catch { case _: Throwable => None }
    case "gif" =>
      // width/height LE16 at offsets 6/8 of the logical screen
      // descriptor
      if (bytes.length < 10) None
      else {
        val w = (u8(bytes, 6) | (u8(bytes, 7) << 8)).toLong
        val h = (u8(bytes, 8) | (u8(bytes, 9) << 8)).toLong
        gifFrameCount(bytes).map(n => VideoMeta("gif", w, h, n.toLong))
      }
    case _ => None
  }
}
