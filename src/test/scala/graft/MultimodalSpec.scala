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

  /** Mono 16-bit little-endian PCM WAV from raw samples. */
  private def wav(samples: Array[Short],
      sampleRate: Float = 8000f): Array[Byte] = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat,
      AudioInputStream, AudioSystem}
    val fmt = new AudioFormat(sampleRate, 16, 1, true, false)
    val pcm = new Array[Byte](samples.length * 2)
    for (i <- samples.indices) {
      pcm(2 * i) = (samples(i) & 0xff).toByte
      pcm(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
    }
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("decodeAudio: duration/RMS/ZCR/peak of a known square wave") {
    // 1 s @ 8 kHz, alternating ±16384 (= ±0.5 full scale): every
    // consecutive pair crosses zero, RMS = peak = 0.5 exactly
    val sq = Array.tabulate(8000)(i =>
      (if (i % 2 == 0) 16384 else -16384).toShort)
    val f = Multimodal.decodeAudio(wav(sq)).get
    assert(f.length == 16)
    assert(math.abs(f(0) - 1f) < 1e-6f, s"duration ${f(0)}")
    assert(math.abs(f(1) - 0.5f) < 1e-6f, s"rms ${f(1)}")
    assert(math.abs(f(2) - 1f) < 1e-6f, s"zcr ${f(2)}")
    assert(math.abs(f(3) - 0.5f) < 1e-6f, s"peak ${f(3)}")
    // flat signal → every envelope slice carries the global RMS
    assert((4 until 16).forall(j => math.abs(f(j) - 0.5f) < 1e-6f),
      f.toList)
  }

  test("decodeAudio: silence and a one-sided envelope are separable") {
    // first half silent, second half ±0.25 square — the envelope is the
    // feature that tells them apart
    val n = 4800
    val sig = Array.tabulate(n)(i =>
      (if (i < n / 2) 0 else if (i % 2 == 0) 8192 else -8192).toShort)
    val f = Multimodal.decodeAudio(wav(sig, 4800f)).get
    assert(math.abs(f(0) - 1f) < 1e-6f)
    assert((4 until 10).forall(j => f(j) == 0f), f.toList) // silent slices
    assert((10 until 16).forall(j => math.abs(f(j) - 0.25f) < 1e-6f),
      f.toList)
  }

  test("decodeAudio: non-audio payloads return None, never throw") {
    assert(Multimodal.decodeAudio("not a wav".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.decodeAudio(Array.emptyByteArray).isEmpty)
    assert(Multimodal.decodeAudio(wav(Array.tabulate(100)(_.toShort))
      .take(30)).isEmpty) // truncated header
  }

  test("featuresOf routes real WAVs through the PCM decoder end-to-end") {
    val sq = Array.tabulate(4000)(i =>
      (if (i % 2 == 0) 16384 else -16384).toShort)
    val as = Seq(Asset(11L, "audio", "wav", wav(sq))).toDS()
    val out = Multimodal.featuresOf(as).collect()
    // real path: f0 is 0.5 s duration — the byte-histogram stand-in
    // would have produced a normalized histogram summing to 1
    assert(math.abs(out(0).features(0) - 0.5f) < 1e-6f,
      out(0).features.toList)
    assert(math.abs(out(0).features(1) - 0.5f) < 1e-6f)
  }

  /** Minimal MJPEG-AVI: RIFF("AVI " LIST("movi" 00dc-chunks)). */
  private def mjpegAvi(frames: Seq[Array[Byte]]): Array[Byte] = {
    def le(i: Int) = Array((i & 0xff).toByte, ((i >> 8) & 0xff).toByte,
      ((i >> 16) & 0xff).toByte, ((i >> 24) & 0xff).toByte)
    val movi = new ByteArrayOutputStream()
    movi.write("movi".getBytes("US-ASCII"))
    frames.foreach { f =>
      movi.write("00dc".getBytes("US-ASCII")); movi.write(le(f.length))
      movi.write(f)
      if (f.length % 2 == 1) movi.write(0) // word alignment
    }
    val body = new ByteArrayOutputStream()
    body.write("AVI ".getBytes("US-ASCII"))
    body.write("LIST".getBytes("US-ASCII")); body.write(le(movi.size()))
    body.write(movi.toByteArray)
    val out = new ByteArrayOutputStream()
    out.write("RIFF".getBytes("US-ASCII")); out.write(le(body.size()))
    out.write(body.toByteArray)
    out.toByteArray
  }

  test("aviFrames demuxes RIFF stream chunks exactly; rejects non-AVI") {
    val f1 = Array[Byte](1, 2, 3, 4, 5) // odd length → padded chunk
    val f2 = Array[Byte](9, 8, 7, 6)
    val got = Multimodal.aviFrames(mjpegAvi(Seq(f1, f2))).get
    assert(got.length == 2)
    assert(got(0).toSeq == f1.toSeq && got(1).toSeq == f2.toSeq)
    assert(Multimodal.aviFrames("plain text doc".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.aviFrames(Array.emptyByteArray).isEmpty)
    // truncated mid-chunk: parser clamps, never throws
    assert(Multimodal.aviFrames(mjpegAvi(Seq(f1, f2)).dropRight(3)) != null)
  }

  test("aviFrames skips non-stream chunks and nested headers (real AVI shape)") {
    // a standards-shaped file carries LIST("hdrl") with codec headers
    // before LIST("movi") — the walker must recurse past it and take
    // only NNdc/NNdb stream chunks
    def le(i: Int) = Array((i & 0xff).toByte, ((i >> 8) & 0xff).toByte,
      ((i >> 16) & 0xff).toByte, ((i >> 24) & 0xff).toByte)
    val frame = Array[Byte](42, 43, 44)
    val hdrl = new ByteArrayOutputStream()
    hdrl.write("hdrl".getBytes("US-ASCII"))
    hdrl.write("avih".getBytes("US-ASCII")); hdrl.write(le(4))
    hdrl.write(Array[Byte](1, 2, 3, 4)) // junk header payload
    val movi = new ByteArrayOutputStream()
    movi.write("movi".getBytes("US-ASCII"))
    movi.write("00dc".getBytes("US-ASCII")); movi.write(le(frame.length))
    movi.write(frame); movi.write(0) // odd → padded
    val body = new ByteArrayOutputStream()
    body.write("AVI ".getBytes("US-ASCII"))
    body.write("LIST".getBytes("US-ASCII")); body.write(le(hdrl.size()))
    body.write(hdrl.toByteArray)
    body.write("LIST".getBytes("US-ASCII")); body.write(le(movi.size()))
    body.write(movi.toByteArray)
    val out = new ByteArrayOutputStream()
    out.write("RIFF".getBytes("US-ASCII")); out.write(le(body.size()))
    out.write(body.toByteArray)
    val got = Multimodal.aviFrames(out.toByteArray).get
    assert(got.length == 1 && got.head.toSeq == frame.toSeq,
      got.map(_.toSeq).toList) // the avih header chunk must NOT leak in
  }

  test("a well-formed AVI with zero stream chunks yields zero frames") {
    // 'parsed AVI, empty movi' must emit NO rows — the fallback slicer
    // fabricating 'frames' from container/header bytes would be wrong
    // for a genuinely empty video (round-5 advice)
    val empty = mjpegAvi(Seq.empty)
    assert(Multimodal.aviFrames(empty).exists(_.isEmpty)) // parsed, empty
    val out = Multimodal.frameSampleOf(
      Seq(Asset(22L, "video", "mp4", empty)).toDS()).collect()
    assert(out.isEmpty, out.toSeq)
    // while a NON-AVI payload still takes the byte-window stand-in
    val text = Asset(23L, "video", "mp4",
      Array.fill[Byte](600)('x'.toByte))
    assert(Multimodal.frameSampleOf(Seq(text).toDS()).collect().nonEmpty)
  }

  test("frameSampleOf emits real demuxed frames for an MJPEG-AVI") {
    val frames = (0 until 5).map(i => Array.fill[Byte](10 + i)(i.toByte))
    val avi = mjpegAvi(frames)
    val out = Multimodal.frameSampleOf(
      Seq(Asset(21L, "video", "mp4", avi)).toDS()).collect()
      .sortBy(_.frame_idx)
    // stride 2 over 5 real frames → indices 0, 2, 4 with TRUE sizes
    assert(out.map(_.frame_idx).toSeq == Seq(0L, 2L, 4L))
    assert(out.map(_.n_bytes).toSeq == Seq(10L, 12L, 14L))
    val md5 = java.security.MessageDigest.getInstance("MD5")
    val expFp = java.lang.Long.parseLong(
      md5.digest(frames(2)).map("%02x".format(_)).mkString.take(8), 16)
    assert(out(1).frame_fp == expFp)
  }

  /** Minimal H.264 Annex-B stream assembler: each NAL = 4-byte start
    * code + header byte + body. */
  private def annexB(nals: Seq[Array[Byte]]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    nals.foreach { n =>
      out.write(Array[Byte](0, 0, 0, 1)); out.write(n)
    }
    out.toByteArray
  }
  // NAL builders: header = nal_ref_idc<<5 | type; body first byte's MSB
  // is first_mb_in_slice's ue(v) leading bit (1 ⇔ first_mb == 0)
  private def sps = Array[Byte](0x67, 0x42, 0x00, 0x0a)
  private def pps = Array[Byte](0x68, 0x3c, 0x00 /* MSB 0: no AU cut */)
  private def idrFirst(tag: Byte) = Array[Byte](0x65, 0x88.toByte, tag)
  private def sliceFirst(tag: Byte) = Array[Byte](0x41, 0x9a.toByte, tag)
  private def sliceCont(tag: Byte) = Array[Byte](0x41, 0x3a, tag)

  test("annexBFrames: access-unit boundaries by first_mb_in_slice, no decoder") {
    // SPS+PPS ride with frame 0 (IDR + a continuation slice); frames 1
    // and 2 start at first-slice NALs; the continuation slice (MSB 0)
    // must NOT cut
    val stream = annexB(Seq(
      sps, pps, idrFirst(1), sliceCont(1), sliceFirst(2), sliceFirst(3)))
    val frames = Multimodal.annexBFrames(stream).get
    assert(frames.length == 3, frames.map(_.length))
    // frame 0 = SPS+PPS+IDR+cont = 4 NALs × (4-byte sc) + 4+3+3+3 bytes
    assert(frames(0).length == 16 + 13, frames(0).length)
    assert(frames(1).length == 4 + 3 && frames(2).length == 4 + 3)
    // frames concatenate back to the exact stream (no byte lost)
    assert(frames.flatten.toSeq == stream.toSeq)
    // an AUD (type 9) also cuts
    val withAud = annexB(Seq(sps, idrFirst(1),
      Array[Byte](0x09, 0x10), sliceCont(9)))
    assert(Multimodal.annexBFrames(withAud).get.length == 2)
  }

  test("annexBFrames rejects non-streams and forbidden-bit corruption; never throws") {
    assert(Multimodal.annexBFrames("plain text doc".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.annexBFrames(Array.emptyByteArray).isEmpty)
    // valid start code but forbidden_zero_bit set in a later NAL header
    val bad = annexB(Seq(idrFirst(1), Array[Byte](0xe5.toByte, 0x00)))
    assert(Multimodal.annexBFrames(bad).isEmpty)
    // parameter sets only: a valid stream with ZERO frames
    assert(Multimodal.annexBFrames(annexB(Seq(sps, pps))).exists(_.isEmpty))
  }

  test("frameSampleOf segments an H.264 Annex-B payload into real access units") {
    // 5 frames, stride 2 → indices 0, 2, 4 with TRUE access-unit sizes
    val stream = annexB(Seq(sps, pps, idrFirst(0), sliceFirst(1),
      sliceFirst(2), sliceFirst(3), sliceFirst(4)))
    val out = Multimodal.frameSampleOf(
      Seq(Asset(31L, "video", "h264", stream)).toDS()).collect()
      .sortBy(_.frame_idx)
    assert(out.map(_.frame_idx).toSeq == Seq(0L, 2L, 4L), out.toSeq)
    // frame 0 = 4+4 (sps) + 4+3 (pps) + 4+3 (idr) = 22; others 4+3
    assert(out.map(_.n_bytes).toSeq == Seq(22L, 7L, 7L), out.toSeq)
    // a parameter-sets-only stream is a parsed-but-empty video: no rows
    val psOnly = Multimodal.frameSampleOf(
      Seq(Asset(32L, "video", "h264", annexB(Seq(sps, pps)))).toDS())
      .collect()
    assert(psOnly.isEmpty, psOnly.toSeq)
  }

  test("featuresOf decodes the first MJPEG frame's pixels for video") {
    // JPEG-encode a synthetic image, wrap in AVI: the video features
    // must equal decodeImage on that same JPEG (real pixel path), not
    // the byte histogram of the container
    val img = new BufferedImage(8, 8, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 8) img.setRGB(x, y, 0x808080)
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "jpg", bos)
    val jpeg = bos.toByteArray
    val avi = mjpegAvi(Seq(jpeg))
    val out = Multimodal.featuresOf(
      Seq(Asset(31L, "video", "mp4", avi)).toDS()).collect()
    val expected = Multimodal.decodeImage(jpeg).get
    assert(out(0).features.toSeq == expected.toSeq)
    // and NOT the container's byte histogram (which sums to 1 over
    // container bytes — the pixel histogram of a gray image is a
    // single spike)
    assert(expected.count(_ > 0.99f) == 1, expected.toList)
  }

  // ---- MP4/ISO-BMFF fixtures: hand-built box trees, offsets computed
  // against the final file layout (ftyp ++ mdat ++ moov) ----
  private def be4(i: Long) = Array(((i >> 24) & 0xff).toByte,
    ((i >> 16) & 0xff).toByte, ((i >> 8) & 0xff).toByte, (i & 0xff).toByte)
  private def be8(l: Long) = be4(l >> 32) ++ be4(l & 0xffffffffL)
  private def bmffBox(typ: String, payload: Array[Byte]*): Array[Byte] = {
    val body = payload.flatten.toArray
    be4(body.length + 8L) ++ typ.getBytes("US-ASCII") ++ body
  }
  private def hdlr(handler: String) = // full box: ver/flags, pre_defined
    bmffBox("hdlr", be4(0), be4(0), handler.getBytes("US-ASCII"))

  /** Two chunks: samples 1-2 (AAA, BBBB) then 3-5 (CCCCC, DDDDDD,
    * EEEEEEE); a 'soun' trak FIRST so track selection is exercised. */
  private def mp4Fixture: (Array[Byte], Seq[Array[Byte]]) = {
    val samples = Seq("AAA", "BBBB", "CCCCC", "DDDDDD", "EEEEEEE")
      .map(_.getBytes("US-ASCII"))
    val ftyp = bmffBox("ftyp", "isom".getBytes, be4(0x200))
    val mdat = bmffBox("mdat", samples.flatten.toArray)
    val chunk1 = ftyp.length + 8L
    val chunk2 = chunk1 + 3 + 4
    val stbl = bmffBox("stbl",
      bmffBox("stsz", be4(0), be4(0), be4(5),
        samples.map(s => be4(s.length.toLong)).flatten.toArray),
      bmffBox("stsc", be4(0), be4(2),
        be4(1), be4(2), be4(1), // chunks 1.. : 2 samples each
        be4(2), be4(3), be4(1)), // chunks 2.. : 3 samples each
      bmffBox("stco", be4(0), be4(2), be4(chunk1), be4(chunk2)))
    val vide = bmffBox("trak", bmffBox("mdia", hdlr("vide"),
      bmffBox("minf", stbl)))
    val soun = bmffBox("trak", bmffBox("mdia", hdlr("soun")))
    (ftyp ++ mdat ++ bmffBox("moov", soun, vide), samples)
  }

  test("mp4Frames resolves stbl sample tables to the true sample bytes") {
    val (payload, samples) = mp4Fixture
    val got = Multimodal.mp4Frames(payload)
    assert(got.isDefined)
    assert(got.get.map(_.toSeq) == samples.map(_.toSeq))
  }

  test("mp4Frames: co64 offsets and fixed-size stsz") {
    val samples = Seq("XXXX", "YYYY", "ZZZZ").map(_.getBytes("US-ASCII"))
    val ftyp = bmffBox("ftyp", "isom".getBytes, be4(0x200))
    val mdat = bmffBox("mdat", samples.flatten.toArray)
    val stbl = bmffBox("stbl",
      bmffBox("stsz", be4(0), be4(4) /* fixed */, be4(3)),
      bmffBox("stsc", be4(0), be4(1), be4(1), be4(3), be4(1)),
      bmffBox("co64", be4(0), be4(1), be8(ftyp.length + 8L)))
    val payload = ftyp ++ mdat ++ bmffBox("moov",
      bmffBox("trak", bmffBox("mdia", hdlr("vide"), bmffBox("minf", stbl))))
    val got = Multimodal.mp4Frames(payload)
    assert(got.isDefined)
    assert(got.get.map(_.toSeq) == samples.map(_.toSeq))
  }

  test("mp4Frames rejects non-BMFF, truncated boxes, and out-of-range samples") {
    assert(Multimodal.mp4Frames("plain ascii stand-in text".getBytes).isEmpty)
    val (payload, _) = mp4Fixture
    assert(Multimodal.mp4Frames(payload.take(payload.length - 4)).isEmpty,
      "truncated moov must not segment")
    // corrupt the first stco offset to point past the file
    val idx = payload.indexOfSlice("stco".getBytes("US-ASCII"))
    val bad = payload.clone()
    System.arraycopy(be4(100000L), 0, bad, idx + 12, 4)
    assert(Multimodal.mp4Frames(bad).isEmpty,
      "out-of-range sample must not segment")
  }

  test("frameSampleOf segments an MP4 payload via the box walk") {
    val (payload, samples) = mp4Fixture
    val rows = Multimodal.frameSampleOf(
        Seq(Asset(31L, "video", "mp4", payload)).toDS(), every = 1)
      .collect().sortBy(_.frame_idx)
    assert(rows.length == 5)
    assert(rows.map(_.n_bytes).toSeq == Seq(3L, 4L, 5L, 6L, 7L))
    val md5 = java.security.MessageDigest.getInstance("MD5")
    val hex = md5.digest(samples(2)).map("%02x".format(_)).mkString
    assert(rows(2).frame_fp == java.lang.Long.parseLong(hex.take(8), 16))
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
