package graft.multimodal

import java.io.ByteArrayInputStream

import javax.sound.sampled.{AudioFormat, AudioSystem}

/** REAL audio sample decode via `javax.sound.sampled` (ships in the
  * JDK — no external codec library): WAV/AIFF/AU PCM payloads are
  * decoded to normalized samples and reduced to per-clip signal stats
  * (frames, duration, RMS, peak). This closes the audio half of the
  * former A/V stub; video frame decode genuinely needs a codec library
  * absent from this container and remains the one disclosed stub.
  *
  * Total like the other decoders: malformed/unsupported bytes return
  * None, never throw — a 100 TB media scan always contains corrupt
  * blobs.
  */
object AudioDecode {

  /** @param frames   sample frames (per-channel samples / channels)
    * @param rms      root-mean-square of normalized samples in [-1, 1]
    * @param peak     max |sample|, normalized */
  final case class PcmStats(
      sampleRate: Long, channels: Int, frames: Long,
      durationMs: Long, rms: Double, peak: Double)

  /** Decode any JDK-supported audio container to 16-bit signed PCM
    * and reduce to signal stats in one streaming pass (constant
    * memory — clips are never buffered whole). */
  def decode(bytes: Array[Byte]): Option[PcmStats] =
    scala.util.Try {
      val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
      try {
        val fmt = in.getFormat
        val target = new AudioFormat(
          AudioFormat.Encoding.PCM_SIGNED, fmt.getSampleRate, 16,
          fmt.getChannels, fmt.getChannels * 2, fmt.getSampleRate, false)
        val pcm = AudioSystem.getAudioInputStream(target, in)
        val buf = new Array[Byte](8192)
        var sumSq = 0.0; var peak = 0.0; var n = 0L
        var read = pcm.read(buf)
        while (read > 0) {
          var i = 0
          while (i + 1 < read) {
            // little-endian signed 16-bit → [-1, 1]
            val s = (((buf(i) & 0xff) | (buf(i + 1) << 8)).toShort) / 32768.0
            sumSq += s * s
            val a = math.abs(s); if (a > peak) peak = a
            n += 1
            i += 2
          }
          read = pcm.read(buf)
        }
        val ch = math.max(fmt.getChannels, 1)
        if (n == 0) None
        else {
          val frames = n / ch
          val rate = fmt.getSampleRate.toLong
          Some(PcmStats(rate, ch, frames,
            if (rate > 0) frames * 1000L / rate else 0L,
            math.sqrt(sumSq / n), peak))
        }
      } finally in.close()
    }.toOption.flatten
}
