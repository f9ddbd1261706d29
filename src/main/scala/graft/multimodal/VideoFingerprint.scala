package graft.multimodal

/** 64-bit VIDEO fingerprint: the per-frame dominant-channel class of
  * the first 32 frames, packed 2 bits per frame — the video member of
  * the multimodal near-dup fingerprint family beside
  * [[ImageDecode.dhash]] (spatial) and [[AudioFingerprint]]
  * (temporal energy deltas).
  *
  * The class of a frame is which channel mean dominates (R=0, G=1,
  * B=2) — a feature that is invariant to the clip's RESOLUTION and to
  * palette re-encoding (a solid or color-dominated frame keeps its
  * dominant channel at any size), so re-renders of the same frame
  * sequence fingerprint identically while their bytes differ
  * everywhere. Frame decode is REAL ([[VideoDecode]]: GIF container
  * walk / MJPEG-AVI + JDK pixel decode); the fingerprint is a pure
  * fold over the decoded channel means, row-local inside
  * mapPartitions.
  */
object VideoFingerprint {

  /** Frames folded into the fingerprint (32 × 2 bits = 64). */
  val Frames = 32

  /** Dominant-channel class of one decoded frame (ties break toward
    * the lower channel index — deterministic). */
  def colorClass(p: ImageDecode.Pixels): Int =
    if (p.meanR >= p.meanG && p.meanR >= p.meanB) 0
    else if (p.meanG >= p.meanB) 1
    else 2

  /** Fingerprint of a decodable clip with at least [[Frames]] frames;
    * None for undecodable blobs or clips too short to sign (callers
    * drop them from the pair join rather than dying). */
  def fingerprint(bytes: Array[Byte]): Option[Long] =
    VideoDecode.decode(bytes).filter(_.length >= Frames).map { fs =>
      (0 until Frames).foldLeft(0L) { (acc, k) =>
        acc | (colorClass(fs(k)).toLong << (2 * k))
      }
    }
}
