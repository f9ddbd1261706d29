package graft.multimodal

import java.io.ByteArrayInputStream

import javax.sound.sampled.{AudioFormat, AudioSystem}

/** 64-bit acoustic fingerprint by TEMPORAL ENERGY DELTAS — the
  * Haitsma-Kalker (2002) robust-hash idea reduced to its time axis:
  * the clip splits into 65 equal windows, per-window signal energy is
  * accumulated in one streaming pass, and bit k = (E[k+1] > E[k]).
  * Comparisons of energies are invariant to VOLUME (a global gain
  * scales both sides), codec-level requantization, and container
  * re-encoding — exactly the transformations that defeat byte-hash
  * audio dedup — while different material orders its energy envelope
  * differently.
  *
  * The same total-decode discipline as [[AudioDecode]]: malformed
  * bytes return None, never throw. Window size comes from the
  * container's frame length, so the pass is single and
  * constant-memory (65 accumulators, clips never buffered whole).
  */
object AudioFingerprint {
  val Windows = 65

  /** 64-bit energy-delta fingerprint, or None when the clip cannot
    * decode or is shorter than one sample per window. */
  def fingerprint(bytes: Array[Byte]): Option[Long] =
    scala.util.Try {
      val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
      try {
        val fmt = in.getFormat
        val target = new AudioFormat(
          AudioFormat.Encoding.PCM_SIGNED, fmt.getSampleRate, 16,
          fmt.getChannels, fmt.getChannels * 2, fmt.getSampleRate, false)
        val frames = in.getFrameLength
        if (frames < Windows) None
        else {
          val pcm = AudioSystem.getAudioInputStream(target, in)
          val ch = math.max(fmt.getChannels, 1)
          val samplesPerWindow = (frames / Windows) * ch
          val energy = new Array[Double](Windows)
          val buf = new Array[Byte](8192)
          var idx = 0L
          var read = pcm.read(buf)
          while (read > 0) {
            var i = 0
            while (i + 1 < read) {
              val w = (idx / samplesPerWindow).toInt
              if (w < Windows) {
                val s = (((buf(i) & 0xff) | (buf(i + 1) << 8)).toShort) / 32768.0
                energy(w) += s * s
              }
              idx += 1
              i += 2
            }
            read = pcm.read(buf)
          }
          var h = 0L
          var k = 0
          while (k < Windows - 1) {
            if (energy(k + 1) > energy(k)) h |= (1L << k)
            k += 1
          }
          Some(h)
        }
      } finally in.close()
    }.toOption.flatten
}
