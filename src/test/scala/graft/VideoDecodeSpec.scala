package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}

import javax.imageio.{IIOImage, ImageIO}

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.{BinaryDocs, VideoDecode}

class VideoDecodeSpec extends AnyFunSuite {
  import TestSpark._

  private def solid(w: Int, h: Int, rgb: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    (0 until h).foreach(y => (0 until w).foreach(x => img.setRGB(x, y, rgb)))
    img
  }

  /** Real animated GIF via the JDK's own sequence writer. */
  private def gifBytes(colors: Seq[Int], w: Int, h: Int): Array[Byte] = {
    val buf = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(buf)
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    colors.foreach { c =>
      writer.writeToSequence(
        new IIOImage(solid(w, h, c), null, null), writer.getDefaultWriteParam)
    }
    writer.endWriteSequence()
    ios.close(); writer.dispose()
    buf.toByteArray
  }

  private def jpegBytes(img: BufferedImage): Array[Byte] = {
    val buf = new ByteArrayOutputStream()
    ImageIO.write(img, "jpg", buf)
    buf.toByteArray
  }

  private def chunk(id: String, body: Array[Byte]): Array[Byte] = {
    val pad = body.length % 2
    val b = ByteBuffer.allocate(8 + body.length + pad).order(ByteOrder.LITTLE_ENDIAN)
    b.put(id.getBytes("US-ASCII")).putInt(body.length).put(body)
    b.array()
  }

  private def list(typ: String, body: Array[Byte]): Array[Byte] =
    chunk("LIST", typ.getBytes("US-ASCII") ++ body)

  /** Hand-assembled MJPEG AVI: RIFF(AVI  LIST(hdrl avih) LIST(movi 00dc…)). */
  private def aviBytes(frames: Seq[Array[Byte]], w: Int, h: Int): Array[Byte] = {
    val avih = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
    avih.putInt(33366).putInt(0).putInt(0).putInt(0)
    avih.putInt(frames.length)            // dwTotalFrames @16
    avih.putInt(0).putInt(1).putInt(0)
    avih.putInt(w).putInt(h)              // dwWidth/dwHeight @32/@36
    val hdrl = list("hdrl", chunk("avih", avih.array()))
    val movi = list("movi", frames.flatMap(f => chunk("00dc", f)).toArray)
    val body = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    val out = ByteBuffer.allocate(8 + body.length).order(ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(body.length).put(body)
    out.array()
  }

  test("animated GIF: every frame decoded with correct per-frame features") {
    val bytes = gifBytes(Seq(0xff0000, 0x00ff00, 0x0000ff), 8, 6)
    assert(VideoDecode.detectFormat(bytes) == "gif")
    val frames = VideoDecode.gifFrames(bytes).get
    assert(frames.length == 3)
    assert(frames.forall(p => p.width == 8 && p.height == 6))
    assert(frames(0).meanR == 255.0 && frames(0).meanG == 0.0)
    assert(frames(1).meanG == 255.0 && frames(1).meanB == 0.0)
    assert(frames(2).meanB == 255.0 && frames(2).meanR == 0.0)
    val m = VideoDecode.meta(bytes).get
    assert(m.format == "gif" && m.width == 8 && m.height == 6 && m.nFrames == 3)
  }

  test("MJPEG AVI: frames decoded from the RIFF walk, header meta real") {
    val frames = Seq(solid(16, 12, 0xff0000), solid(16, 12, 0x0000ff)).map(jpegBytes)
    val bytes = aviBytes(frames, 16, 12)
    assert(VideoDecode.detectFormat(bytes) == "avi")
    val px = VideoDecode.aviFrames(bytes).get
    assert(px.length == 2)
    assert(px.forall(p => p.width == 16 && p.height == 12))
    // JPEG is lossy; solid primaries decode within a small tolerance
    assert(math.abs(px(0).meanR - 255.0) < 3 && px(0).meanB < 3)
    assert(math.abs(px(1).meanB - 255.0) < 3 && px(1).meanR < 3)
    val m = VideoDecode.meta(bytes).get
    assert(m.format == "avi" && m.width == 16 && m.height == 12 && m.nFrames == 2)
  }

  test("interleaved AVI (frames in rec LISTs) keeps document frame order") {
    // the standard interleaved layout: each frame wrapped in its own
    // 'rec ' LIST inside movi — a collect-then-descend walk would
    // reverse these
    val f = Seq(0xff0000, 0x00ff00, 0x0000ff).map(c => jpegBytes(solid(8, 8, c)))
    val movi = list("movi",
      f.flatMap(p => list("rec ", chunk("00dc", p))).toArray)
    val avih = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
    avih.putInt(33366).putInt(0).putInt(0).putInt(0).putInt(3)
    avih.putInt(0).putInt(1).putInt(0).putInt(8).putInt(8)
    val body = "AVI ".getBytes("US-ASCII") ++
      list("hdrl", chunk("avih", avih.array())) ++ movi
    val out = ByteBuffer.allocate(8 + body.length).order(ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(body.length).put(body)
    val px = VideoDecode.aviFrames(out.array()).get
    assert(px.length == 3)
    assert(px(0).meanR > 200 && px(1).meanG > 200 && px(2).meanB > 200)
    // mixed layout: bare chunk, then a rec group, then another bare
    val mixed = list("movi",
      chunk("00dc", f(0)) ++ list("rec ", chunk("00dc", f(1))) ++ chunk("00dc", f(2)))
    val body2 = "AVI ".getBytes("US-ASCII") ++ mixed
    val out2 = ByteBuffer.allocate(8 + body2.length).order(ByteOrder.LITTLE_ENDIAN)
    out2.put("RIFF".getBytes("US-ASCII")).putInt(body2.length).put(body2)
    val px2 = VideoDecode.aviFrames(out2.array()).get
    assert(px2.length == 3)
    assert(px2(0).meanR > 200 && px2(1).meanG > 200 && px2(2).meanB > 200)
  }

  test("sampling skips the decode of unsampled frames; meta never decodes pixels") {
    val gif4 = gifBytes(Seq(0xff0000, 0x00ff00, 0x0000ff, 0xffffff), 4, 4)
    val sampled = VideoDecode.decodeSampled(gif4, 2).get
    assert(sampled.map(_._1) == Vector(0, 2))
    assert(sampled(0)._2.meanR == 255.0 && sampled(1)._2.meanB == 255.0)
    assert(VideoDecode.gifFrameCount(gif4).contains(4))
    // null blobs: total, everywhere
    assert(VideoDecode.detectFormat(null) == "unknown")
    assert(VideoDecode.decode(null).isEmpty && VideoDecode.meta(null).isEmpty)
  }

  test("decodeVideo samples every stride-th frame in the distributed path") {
    import spark.implicits._
    val gif4 = gifBytes(Seq(0xff0000, 0x00ff00, 0x0000ff, 0xffffff), 4, 4)
    val avi2 = aviBytes(Seq(solid(8, 8, 0x00ff00), solid(8, 8, 0xff0000)).map(jpegBytes), 8, 8)
    val rows = Seq(
      (1L, gif4),
      (2L, avi2),
      (3L, "h264 would live here".getBytes("UTF-8")),
      (4L, null: Array[Byte]))
    val out = BinaryDocs.decodeVideo(rows.toDF("doc_id", "media"), stride = 2)
      .collect().groupBy(_.getAs[Long]("doc_id"))
    // 4-frame GIF at stride 2 → frames 0 and 2
    val g = out(1L).sortBy(_.getAs[Long]("frame_no"))
    assert(g.map(_.getAs[Long]("frame_no")).toSeq == Seq(0L, 2L))
    assert(g.forall(_.getAs[Boolean]("decoded")))
    assert(g(0).getAs[Double]("mean_r") == 255.0)
    assert(g(1).getAs[Double]("mean_b") == 255.0)
    // 2-frame AVI at stride 2 → frame 0 only
    val a = out(2L)
    assert(a.map(_.getAs[Long]("frame_no")).toSeq == Seq(0L))
    assert(math.abs(a(0).getAs[Double]("mean_g") - 255.0) < 3)
    // unsupported codec → one decoded=false row, task survives
    val u = out(3L)
    assert(u.length == 1 && !u(0).getAs[Boolean]("decoded"))
    // null media blob (failed upstream fetch) → same contract
    val nl = out(4L)
    assert(nl.length == 1 && !nl(0).getAs[Boolean]("decoded"))
  }

  test("extractMeta picks up video headers in the fallback chain") {
    import spark.implicits._
    val avi = aviBytes(Seq(jpegBytes(solid(8, 8, 0))), 320, 240)
    val out = BinaryDocs.extractMeta(Seq((1L, avi)).toDF("doc_id", "media"))
      .collect().head
    assert(out.getAs[Long]("width") == 320 && out.getAs[Long]("height") == 240)
  }

  test("corrupt containers terminate cleanly: fuzz, truncation, hostile chunk sizes") {
    val rnd = new scala.util.Random(4321)
    val gif = gifBytes(Seq(0xff0000, 0x00ff00), 8, 8)
    val avi = aviBytes(Seq(jpegBytes(solid(8, 8, 0xff0000))), 8, 8)
    (0 to 80).foreach { n =>
      VideoDecode.decode(Array.fill(n * 5)(rnd.nextInt(256).toByte))
      VideoDecode.decode(gif.take(n * 3)); VideoDecode.meta(gif.take(n * 3))
      VideoDecode.decode(avi.take(n * 3)); VideoDecode.meta(avi.take(n * 3))
    }
    // hostile chunk size right after the AVI header: the Long cursor
    // walks past the end instead of stepping backward or looping
    Seq(0xFFFFFFF8L, 0xFFFFFFF9L, 0x80000000L, 0xFFFFFFFFL).foreach { sz =>
      val b = ByteBuffer.allocate(20).order(ByteOrder.LITTLE_ENDIAN)
      b.put("RIFF".getBytes).putInt(12).put("AVI ".getBytes)
      b.put("00dc".getBytes).putInt(sz.toInt)
      assert(VideoDecode.decode(b.array()).isEmpty, s"size=$sz")
      assert(VideoDecode.meta(b.array()).isEmpty, s"size=$sz")
    }
    // a LIST whose declared size overruns the buffer is clamped
    val overrun = {
      val inner = list("movi", chunk("00dc", jpegBytes(solid(4, 4, 0x0000ff))))
      val patched = inner.clone()
      val bb = ByteBuffer.wrap(patched).order(ByteOrder.LITTLE_ENDIAN)
      bb.putInt(4, Int.MaxValue) // hostile LIST size
      val body = "AVI ".getBytes ++ patched
      val out = ByteBuffer.allocate(8 + body.length).order(ByteOrder.LITTLE_ENDIAN)
      out.put("RIFF".getBytes).putInt(body.length).put(body)
      out.array()
    }
    val decoded = VideoDecode.decode(overrun)
    assert(decoded.forall(_.nonEmpty)) // clamped walk still finds the frame or bails clean
  }

  // --------------------------------------- FLV / Screen Video v1

  test("FLV screen video round-trip: keyframe + interframes, block PERSISTENCE is the decode") {
    import graft.multimodal.SyntheticMedia
    // 32x16 = two 16x16 blocks [left, right]
    val red = 0xff0000; val green = 0x00ff00; val blue = 0x0000ff
    val clip = SyntheticMedia.flvScreenBytes(Seq(
      Seq(Some(red), Some(green)),  // keyframe: L red, R green
      Seq(None, Some(blue)),        // inter: L PERSISTS red, R -> blue
      Seq(Some(green), None)        // inter: L -> green, R PERSISTS blue
    ), 32, 16)
    assert(VideoDecode.detectFormat(clip) == "flv")
    val frames = VideoDecode.flvFrames(clip).get
    assert(frames.length == 3)
    assert(frames.forall(p => p.width == 32 && p.height == 16))
    // full-frame means: each block contributes channel/2
    def rgb(p: graft.multimodal.ImageDecode.Pixels) =
      (p.meanR, p.meanG, p.meanB)
    assert(rgb(frames(0)) == (127.5, 127.5, 0.0))   // red + green
    // frame 1 readable ONLY via carried state: left is still red
    assert(rgb(frames(1)) == (127.5, 0.0, 127.5))   // red + blue
    assert(rgb(frames(2)) == (0.0, 127.5, 127.5))   // green + blue
    // header-only meta: dims + frame count, no pixel work
    val m = VideoDecode.meta(clip).get
    assert(m == VideoDecode.VideoMeta("flv", 32, 16, 3))
    // sampling: state still decodes every frame, stats only on sampled
    val sampled = VideoDecode.flvFramesSampled(clip, stride = 2).get
    assert(sampled.map(_._1) == Vector(0, 2))
    assert(rgb(sampled(1)._2) == (0.0, 127.5, 127.5))
  }

  test("FLV screen video: partial edge blocks (canvas not a multiple of 16) and vertical orientation") {
    import graft.multimodal.SyntheticMedia
    // 24x20: block grid 2x2 -> tiles 16x16, 8x16, 16x4, 8x4; codec
    // order is BOTTOM row of blocks first
    val r = 0xff0000; val g = 0x00ff00; val b = 0x0000ff; val k = 0x000000
    val clip = SyntheticMedia.flvScreenBytes(Seq(
      // bottom row [left 16x16, right 8x16], top row [left 16x4, right 8x4]
      Seq(Some(r), Some(r), Some(g), Some(g)), // bottom red, top green
      Seq(None, None, Some(b), Some(k))        // top-left -> blue, top-right -> black
    ), 24, 20)
    val frames = VideoDecode.flvFrames(clip).get
    assert(frames.length == 2)
    assert(frames.forall(p => p.width == 24 && p.height == 20))
    // frame 0: 24x16 red (384 px) + 24x4 green (96 px) over 480 px
    assert(frames(0).meanR == 255.0 * 384 / 480)
    assert(frames(0).meanG == 255.0 * 96 / 480)
    // frame 1: bottom PERSISTS red; top row now 16x4 blue + 8x4 black
    assert(frames(1).meanR == 255.0 * 384 / 480)
    assert(frames(1).meanG == 0.0)
    assert(frames(1).meanB == 255.0 * 64 / 480)
  }

  test("FLV screen video: malformed input is None, never a throw") {
    import graft.multimodal.SyntheticMedia
    val good = SyntheticMedia.flvScreenBytes(
      Seq(Seq(Some(0xff0000), Some(0x00ff00))), 32, 16)
    // truncations at every length: None or a clean partial, no throw
    (0 until good.length by 7).foreach { n =>
      VideoDecode.flvFrames(good.take(n)) // must not throw
    }
    // corrupt deflate stream inside a block
    val corrupt = good.clone()
    corrupt(corrupt.length - 10) = 0x55.toByte
    assert(VideoDecode.flvFrames(corrupt).isEmpty ||
      VideoDecode.flvFrames(corrupt).nonEmpty) // total either way
    // a clip that opens on an INTERFRAME has no prediction base: None
    val orphan = SyntheticMedia.flvScreenBytes(
      Seq(Seq(Some(0xff0000), Some(0x00ff00)),
        Seq(None, Some(0x0000ff))), 32, 16)
    // splice out the keyframe tag: header(9) + prevTag0(4) then tag 1
    val tag1Size = {
      val ds = ((orphan(13 + 1) & 0xff) << 16) | ((orphan(13 + 2) & 0xff) << 8) | (orphan(13 + 3) & 0xff)
      11 + ds + 4
    }
    val spliced = orphan.take(13) ++ orphan.drop(13 + tag1Size)
    assert(VideoDecode.flvFrames(spliced).isEmpty,
      "an interframe with no keyframe base must not decode")
  }
}
