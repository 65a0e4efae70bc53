package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO

import graft.operators.Multimodal
import graft.operators.Multimodal.Asset

/** The REAL image path: synthetic PNGs with known pixels driven through
  * the decode / resize operators end-to-end (Dataset + mapPartitions),
  * plus the pixel-level helpers directly. The testdata's text stand-ins
  * always take the byte fallback (oracle-checked elsewhere); these tests
  * pin what a user pointing the operators at actual images gets. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  /** w×h PNG where pixel (x,y) = rgb(x,y). */
  private def png(w: Int, h: Int)(rgb: (Int, Int) => Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb(x, y))
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("decodeImage: luminance histogram of a half-black half-white PNG") {
    // 4×4: top two rows black (luma 0 → bin 0), bottom two white
    // (luma 255 → bin 15); histogram = [0.5, 0, ..., 0, 0.5]
    val bytes = png(4, 4)((_, y) => if (y < 2) 0x000000 else 0xffffff)
    val feats = Multimodal.decodeImage(bytes).get
    assert(feats.length == 16)
    assert(math.abs(feats(0) - 0.5f) < 1e-6f, feats.toList)
    assert(math.abs(feats(15) - 0.5f) < 1e-6f, feats.toList)
    assert(feats.slice(1, 15).forall(_ == 0f), feats.toList)
  }

  test("decodeImage: undecodable payloads return None, never throw") {
    assert(Multimodal.decodeImage("not an image".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.decodeImage(Array.emptyByteArray).isEmpty)
    // a PNG truncated mid-stream must not crash the decode loop
    val trunc = png(8, 8)((x, y) => x * 1000 + y).take(20)
    assert(Multimodal.decodeImage(trunc).isEmpty)
  }

  test("featuresOf routes real PNGs through the pixel decoder end-to-end") {
    val grad = png(16, 1)((x, _) => { val v = x * 16; (v << 16) | (v << 8) | v })
    val as = Seq(
      Asset(1L, "image", "png", png(4, 4)((_, _) => 0xffffff)),
      Asset(2L, "image", "png", grad),
      Asset(3L, "audio", "wav", "plain bytes".getBytes("UTF-8"))).toDS()
    val out = Multimodal.featuresOf(as).collect().sortBy(_.asset_id)
    // all-white image: every pixel in the top luma bin
    assert(out(0).features(15) == 1f && out(0).features.sum == 1f)
    // 16-px gray gradient: gray v=x*16 has luma x*16 → exactly one pixel
    // per bin (1/16 each)
    assert(out(1).features.forall(f => math.abs(f - 1f / 16) < 1e-6f),
      out(1).features.toList)
    // audio keeps the byte-histogram stand-in (normalized, 16 bins)
    assert(out(2).features.length == 16 &&
      math.abs(out(2).features.sum - 1f) < 1e-5f)
  }

  test("resizeOf really resamples decodable pixels (factor 2, known RGB)") {
    // 4×2 image; factor 2 keeps pixels (0,0) and (2,0)
    val bytes = png(4, 2)((x, y) => if (x == 0 && y == 0) 0xff0000
      else if (x == 2 && y == 0) 0x0000ff else 0x00ff00)
    val out = Multimodal.resizeOf(
      Seq(Asset(7L, "image", "png", bytes)).toDS(), 2).collect()
    assert(out.length == 1)
    // 2×1 surviving pixels × 3 RGB bytes
    assert(out(0).resized_bytes == 6L, out(0))
    val expected = Array[Byte](0xff.toByte, 0, 0, 0, 0, 0xff.toByte)
    val md5 = java.security.MessageDigest.getInstance("MD5")
    val hex = md5.digest(expected).map("%02x".format(_)).mkString
    assert(out(0).resized_fp == java.lang.Long.parseLong(hex.take(8), 16),
      out(0))
    assert(out(0).n_bytes == bytes.length.toLong)
  }

  test("resizeOf falls back to byte stride for undecodable image payloads") {
    val payload = "abcdefghij".getBytes("UTF-8")
    val out = Multimodal.resizeOf(
      Seq(Asset(9L, "image", "png", payload)).toDS(), 2).collect()
    assert(out(0).resized_bytes == 5L, out(0)) // ceil(10/2), bytes "acegi"
    val md5 = java.security.MessageDigest.getInstance("MD5")
    val hex = md5.digest("acegi".getBytes("UTF-8")).map("%02x".format(_))
      .mkString
    assert(out(0).resized_fp == java.lang.Long.parseLong(hex.take(8), 16))
  }
}
