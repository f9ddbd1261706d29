package graft.multimodal

/** Pure-byte header decoders for common media containers.
  *
  * No codec library is needed to read DIMENSIONS and AUDIO PARAMETERS:
  * BMP/PNG/WAV/JPEG all carry them in fixed or scannable header
  * fields (public file-format layouts). This turns the multimodal
  * decode stage from a stub into a real decoder for these formats —
  * full pixel/sample decode of compressed payloads still belongs to a
  * codec library and remains out of scope in this container.
  *
  * All functions are total: malformed input returns None, never
  * throws — a 100 TB media scan always contains corrupt blobs, and a
  * task death per bad file is not acceptable.
  */
object MediaCodecs {

  final case class ImageMeta(format: String, width: Long, height: Long)
  final case class AudioMeta(
      format: String, channels: Int, sampleRate: Long, bitsPerSample: Int, durationMs: Long)

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def le32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong | (u8(b, i + 1).toLong << 8) |
      (u8(b, i + 2).toLong << 16) | (u8(b, i + 3).toLong << 24)) & 0xffffffffL
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def be32(b: Array[Byte], i: Int): Long =
    ((u8(b, i).toLong << 24) | (u8(b, i + 1).toLong << 16) |
      (u8(b, i + 2).toLong << 8) | u8(b, i + 3).toLong) & 0xffffffffL

  /** Container sniffing by magic bytes. */
  def detectFormat(b: Array[Byte]): String =
    if (b.length >= 2 && b(0) == 'B' && b(1) == 'M') "bmp"
    else if (b.length >= 8 && u8(b, 0) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') "png"
    else if (b.length >= 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E') "wav"
    else if (b.length >= 3 && u8(b, 0) == 0xff && u8(b, 1) == 0xd8 && u8(b, 2) == 0xff) "jpeg"
    else "unknown"

  /** BMP: BITMAPINFOHEADER width/height are int32 LE at offsets 18/22
    * (height may be negative for top-down rows — abs it). */
  def decodeBmp(b: Array[Byte]): Option[ImageMeta] =
    if (b.length < 26 || detectFormat(b) != "bmp") None
    else {
      val w = le32(b, 18).toInt
      val h = le32(b, 22).toInt
      if (w <= 0 || h == 0) None else Some(ImageMeta("bmp", w.toLong, math.abs(h).toLong))
    }

  /** PNG: IHDR is always the first chunk, so width/height are uint32
    * BE at fixed offsets 16/20. */
  def decodePng(b: Array[Byte]): Option[ImageMeta] =
    if (b.length < 24 || detectFormat(b) != "png") None
    else {
      val w = be32(b, 16)
      val h = be32(b, 20)
      if (w == 0 || h == 0) None else Some(ImageMeta("png", w, h))
    }

  /** JPEG: scan the marker stream for an SOFn frame header (C0-CF,
    * excluding DHT/JPG/DAC C4/C8/CC); height BE16 at +5, width at +7. */
  def decodeJpeg(b: Array[Byte]): Option[ImageMeta] = {
    if (b.length < 4 || detectFormat(b) != "jpeg") return None
    var i = 2
    while (i + 9 < b.length) {
      if (u8(b, i) != 0xff) return None
      val marker = u8(b, i + 1)
      if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd7)) i += 2 // standalone
      else {
        val len = be16(b, i + 2)
        if (len < 2) return None
        if (marker >= 0xc0 && marker <= 0xcf &&
          marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
          if (i + 8 >= b.length) return None
          return Some(ImageMeta("jpeg", be16(b, i + 7).toLong, be16(b, i + 5).toLong))
        }
        i += 2 + len
      }
    }
    None
  }

  /** WAV: walk RIFF chunks for `fmt ` (channels LE16 at +2, sample
    * rate LE32 at +4, byte rate at +8, bits at +14) and `data` (size →
    * duration = bytes * 1000 / byteRate). */
  def decodeWav(b: Array[Byte]): Option[AudioMeta] = {
    if (detectFormat(b) != "wav") return None
    var channels = 0; var sampleRate = 0L; var bits = 0; var byteRate = 0L
    var dataBytes = -1L
    // offset tracked in Long: a corrupt chunk size (up to 0xffffffff)
    // must advance the cursor past the end and terminate the walk, never
    // wrap to a negative Int (backward step / infinite loop on a bad blob)
    var i = 12L
    while (i + 8 <= b.length) {
      val o = i.toInt
      val id = new String(b.slice(o, o + 4), "US-ASCII")
      val size = le32(b, o + 4) // unsigned, always >= 0
      if (id == "fmt " && i + 8 + 16 <= b.length) {
        channels = le16(b, o + 8 + 2)
        sampleRate = le32(b, o + 8 + 4)
        byteRate = le32(b, o + 8 + 8)
        bits = le16(b, o + 8 + 14)
      } else if (id == "data") {
        dataBytes = size
      }
      i += 8L + size + (size & 1L) // chunks are word-aligned; step >= 8
    }
    if (channels <= 0 || sampleRate <= 0 || byteRate <= 0) None
    else {
      val dur = if (dataBytes < 0) 0L else dataBytes * 1000L / byteRate
      Some(AudioMeta("wav", channels, sampleRate, bits, dur))
    }
  }

  /** Image dims for any supported container. */
  def decodeImage(b: Array[Byte]): Option[ImageMeta] = detectFormat(b) match {
    case "bmp"  => decodeBmp(b)
    case "png"  => decodePng(b)
    case "jpeg" => decodeJpeg(b)
    case _      => None
  }
}
