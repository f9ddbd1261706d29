package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.{SyntheticMedia, VideoFingerprint}

/** Video near-dup dedup (#196): fingerprint invariances and the
  * planted-pair arithmetic the oracle relies on. */
class VideoDedupSpec extends AnyFunSuite {
  import TestSpark._

  private def clip(scene: Int, w: Int, h: Int): Array[Byte] =
    SyntheticMedia.gifBytes(
      SyntheticMedia.sceneColorsFor(scene).map(Seq(0xff0000, 0x00ff00, 0x0000ff)),
      w, h)

  test("fingerprint is resolution-invariant but bytes are not") {
    for (scene <- Seq(0, 7, 24)) {
      val sizes = Seq((4, 3), (6, 4), (8, 6)).map { case (w, h) => clip(scene, w, h) }
      val fps = sizes.map(b => VideoFingerprint.fingerprint(b))
      assert(fps.forall(_.isDefined))
      assert(fps.distinct.size == 1, s"scene $scene resolutions must agree")
      // the bytes themselves all differ — exact hashing misses these
      assert(sizes.map(_.toSeq).distinct.size == 3)
    }
  }

  test("the 25 scene fingerprints are pairwise separated far beyond the 3-bit join") {
    val fps = (0 until 25).map(sc =>
      VideoFingerprint.fingerprint(clip(sc, 4, 3)).get)
    assert(fps.distinct.size == 25)
    for (i <- 0 until 25; j <- (i + 1) until 25) {
      val d = java.lang.Long.bitCount(fps(i) ^ fps(j))
      assert(d > 3, s"scenes $i/$j hamming $d")
      // band-distinctness: no 16-bit band collides, so cross-scene
      // pairs never even become candidates
      for (b <- 0 until 4)
        assert(((fps(i) >>> (16 * b)) & 0xffffL) != ((fps(j) >>> (16 * b)) & 0xffffL),
          s"scenes $i/$j share band $b")
    }
  }

  test("fingerprint replays the declared frame-class arithmetic") {
    val scene = 13
    val fp = VideoFingerprint.fingerprint(clip(scene, 6, 4)).get
    val expected = SyntheticMedia.sceneColorsFor(scene).zipWithIndex
      .foldLeft(0L) { case (acc, (c, k)) => acc | (c.toLong << (2 * k)) }
    assert(fp == expected)
  }

  test("q_video_dedup returns exactly the same-scene pairs at hamming 0") {
    val df = SparkEntry.queries("q_video_dedup")(spark, sf).collect()
    // 400 probe docs, 25 scenes of 16 docs → 25 × C(16,2) pairs
    assert(df.length == 25 * (16 * 15) / 2)
    df.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      assert(a < b && a % 25 == b % 25)
      assert(r.getInt(2) == 0)
    }
  }

  test("too-short or undecodable blobs are dropped, not fatal") {
    assert(VideoFingerprint.fingerprint(Array[Byte](1, 2, 3)).isEmpty)
    // a clip with fewer frames than the fingerprint needs
    val short = SyntheticMedia.gifBytes(Seq(0xff0000, 0x00ff00), 4, 3)
    assert(VideoFingerprint.fingerprint(short).isEmpty)
  }
}
