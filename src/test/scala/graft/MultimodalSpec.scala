package graft

import org.apache.spark.sql.functions._

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO

import graft.operators.Multimodal
import graft.operators.Multimodal.{ImageCodec, MediaAsset, StubCodec, WavCodec}

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def asset(id: Long, bytes: Array[Byte]) =
    MediaAsset(id, "image", bytes, 640, 480, 0L)

  /** Deterministic w×h test image: pixel (x,y) = the rgb triple returned
    * by `px` — encoded losslessly so decode is bit-exact. */
  private def makeImage(w: Int, h: Int)(px: (Int, Int) => (Int, Int, Int)): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = px(x, y)
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    img
  }

  private def encode(img: BufferedImage, fmt: String): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    assert(ImageIO.write(img, fmt, out), s"no $fmt writer in this JDK")
    out.toByteArray
  }

  test("StubCodec is deterministic and byte-exact") {
    val b = "hello world".getBytes("UTF-8")
    assert(StubCodec.fnv64(b) === StubCodec.fnv64(b.clone()))
    assert(StubCodec.brightness(Array[Byte](0, -1)) === (255.0 / 2 / 255.0))
    // non-ASCII text: brightness is mean over UTF-8 BYTES (multi-byte
    // codepoints contribute one term per byte, all with the high bit
    // set, i.e. unsigned) — the same formulation the q_media_features
    // oracle now computes byte-level in DuckDB, so a non-ASCII document
    // row cannot produce a false hash mismatch
    val nb = "héllo — 日本語".getBytes("UTF-8")
    val expected = nb.map(_ & 0xff).map(_.toLong).sum.toDouble / nb.length / 255.0
    assert(StubCodec.brightness(nb) === expected)
    assert(nb.length > "héllo — 日本語".length) // really multi-byte
    assert(math.abs(StubCodec.histogram8(b).sum - 1.0f) < 1e-6)
    assert(StubCodec.resample(b, 4).length === 4)
    // chunks of 4: "hell","o wo","rld"; stride 2 keeps indices 0 and 2
    assert(StubCodec.sampleFrames(b, 4, 2).map(_.toSeq)
      === Seq("hell".getBytes.toSeq, "rld".getBytes.toSeq))
  }

  test("ImageCodec decodes PNG and BMP bit-exactly (dims, brightness, histogram)") {
    // 2×2 with known luminances: (0,0,0)→0, (255,255,255)→255,
    // (30,60,90)→60, (100,150,200)→150; integer-mean luminance
    val img = makeImage(2, 2) {
      case (0, 0) => (0, 0, 0)
      case (1, 0) => (255, 255, 255)
      case (0, 1) => (30, 60, 90)
      case (1, 1) => (100, 150, 200)
    }
    val expectedBrightness = (0 + 255 + 60 + 150).toDouble / 4 / 255.0
    for (fmt <- Seq("png", "bmp")) {
      val decoded = ImageCodec.decode(encode(img, fmt))
      assert(decoded.isDefined, s"$fmt did not decode")
      val bi = decoded.get
      assert(bi.getWidth === 2 && bi.getHeight === 2)
      assert(ImageCodec.brightness(bi) === expectedBrightness, fmt)
      // luminances 0,60,150,255 → bins 0,1,4,7, one pixel each
      val hist = ImageCodec.histogram8(bi)
      assert(hist.toSeq === Seq(0.25f, 0.25f, 0f, 0f, 0.25f, 0f, 0f, 0.25f), fmt)
    }
  }

  test("extractFeatures really decodes image payloads; stub only as fallback") {
    implicit val sp = spark
    val png = encode(makeImage(5, 3)((_, _) => (120, 120, 120)), "png")
    val ds = Seq(
      MediaAsset(1L, "image", png, 0, 0, 0L), // real decode
      MediaAsset(2L, "image", "not an image".getBytes("UTF-8"), 0, 0, 0L),
      MediaAsset(3L, "audio", png, 0, 0, 0L)  // media-type gated: stub
    ).toDS()
    val out = Multimodal.extractFeatures(ds).collect().sortBy(_.assetId)

    assert(out(0).decoded && out(0).imgWidth === 5 && out(0).imgHeight === 3)
    assert(out(0).brightness === 120.0 / 255.0) // true pixel luminance
    assert(out(0).checksum === StubCodec.fnv64(png))

    assert(!out(1).decoded && out(1).imgWidth === 0)
    assert(out(1).brightness ===
      StubCodec.brightness("not an image".getBytes("UTF-8")))

    assert(!out(2).decoded) // audio payloads never go through imageio
    assert(out(2).brightness === StubCodec.brightness(png))
  }

  test("JPEG decodes with correct dims (lossy: no pixel-exact assert)") {
    val jpeg = encode(makeImage(17, 9)((_, _) => (200, 50, 50)), "jpg")
    val bi = ImageCodec.decode(jpeg)
    assert(bi.isDefined && bi.get.getWidth === 17 && bi.get.getHeight === 9)
    assert(ImageCodec.brightness(bi.get) > 0.0)
  }

  test("resizeImages scales oversized images, passes small/undecodable through") {
    implicit val sp = spark
    val big = encode(makeImage(100, 80)((_, _) => (10, 20, 30)), "png")
    val small = encode(makeImage(8, 8)((_, _) => (10, 20, 30)), "png")
    val ds = Seq(
      MediaAsset(1L, "image", big, 100, 80, 0L),
      MediaAsset(2L, "image", small, 8, 8, 0L),
      MediaAsset(3L, "image", Array[Byte](1, 2, 3), 0, 0, 0L)).toDS()
    val out = Multimodal.resizeImages(ds, maxDim = 50).collect().sortBy(_.assetId)
    val resized = ImageCodec.decode(out(0).payload).get
    assert(resized.getWidth === 50 && resized.getHeight === 40) // aspect kept
    assert(out(0).width === 50 && out(0).height === 40)
    assert(out(1).payload.toSeq === small.toSeq) // within bounds: untouched
    assert(out(2).payload.toSeq === Seq[Byte](1, 2, 3)) // undecodable: untouched
  }

  test("resizeImages re-encodes in the source format (JPEG stays JPEG)") {
    implicit val sp = spark
    val jpegIn = encode(makeImage(100, 80)((x, y) => (x * 2, y * 3, 40)), "jpg")
    val pngIn = encode(makeImage(100, 80)((x, y) => (x * 2, y * 3, 40)), "png")
    assert(ImageCodec.detectFormat(jpegIn) === Some("jpeg"))
    assert(ImageCodec.detectFormat(pngIn) === Some("png"))
    val ds = Seq(
      MediaAsset(1L, "image", jpegIn, 100, 80, 0L),
      MediaAsset(2L, "image", pngIn, 100, 80, 0L)).toDS()
    val out = Multimodal.resizeImages(ds, maxDim = 50).collect().sortBy(_.assetId)
    // a resized photo must not silently convert to lossless PNG (which
    // can be LARGER than the JPEG input, defeating the resize-before-
    // shuffle size rationale); each payload keeps its container format
    assert(ImageCodec.detectFormat(out(0).payload) === Some("jpeg"))
    assert(ImageCodec.detectFormat(out(1).payload) === Some("png"))
    assert(out.forall(a => ImageCodec.decode(a.payload).get.getWidth === 50))
  }

  test("extractFeatures preserves ids and computes stub features") {
    implicit val sp = spark
    val ds = Seq(
      asset(1L, Array[Byte](0, 0, 0, 0)),
      asset(2L, Array[Byte](-1, -1, -1, -1))).toDS()
    val out = Multimodal.extractFeatures(ds).collect().sortBy(_.assetId)
    assert(out.map(_.assetId).toSeq === Seq(1L, 2L))
    assert(out(0).brightness === 0.0)
    assert(math.abs(out(1).brightness - 1.0) < 1e-12)
    assert(out.forall(_.features.length === 8))
  }

  test("resizeAll bounds payload size; sampleFrames explodes with frame index") {
    implicit val sp = spark
    val big = asset(1L, Array.tabulate(1000)(_.toByte))
    val resized = Multimodal.resizeAll(Seq(big).toDS(), 64).collect().head
    assert(resized.payload.length === 64)
    val frames = Multimodal.sampleFrames(Seq(big).toDS(), frameSize = 100, stride = 3)
    val rows = frames.orderBy("frame_idx").collect()
    assert(rows.length === 4) // chunks 0,3,6,9 of 10
    assert(rows.map(_.getAs[Int]("frame_idx")).toSeq === Seq(0, 1, 2, 3))
  }

  test("assetsFromDocuments: payload is the UTF-8 text, pipeline runs on fixture") {
    implicit val sp = spark
    val assets = Multimodal.assetsFromDocuments(Tables.documents(spark, sf))
    val feats = Multimodal.extractFeatures(assets)
    val n = feats.count()
    assert(n === Tables.documents(spark, sf).count())
    val medias = feats.toDF().select("mediaType").distinct()
      .collect().map(_.getString(0)).toSet
    assert(medias === Set("image", "audio", "video"))
  }

  // ===== WAV codec (real audio decode, round-5) =====

  test("WAV round-trip: encodePcm8 → decode recovers header and amplitude stats") {
    // samples 128±{0,32,64,127}: |amplitude| = 0, 0.25, 0.5, 0.9921875
    val data = Array[Byte](128.toByte, 160.toByte, 96.toByte, 255.toByte)
    val wav = WavCodec.encodePcm8(data, sampleRate = 8000, channels = 2)
    assert(wav.length === 44 + 4)
    val w = WavCodec.decode(wav).get
    assert(w.sampleRate === 8000 && w.channels === 2 && w.bitsPerSample === 8)
    // 4 data bytes / (8000 Hz × 2 ch × 1 B) s → 0 ms (integer)
    assert(w.durationMs === 0L)
    assert(w.meanAbsAmplitude === (0.0 + 32.0 / 128 + 32.0 / 128 + 127.0 / 128) / 4)
    // bins: 0 → bin 0, 0.25 → bin 2 (×2 samples), 0.9921875 → bin 7
    assert(w.hist8.toSeq === Seq(0.25f, 0f, 0.5f, 0f, 0f, 0f, 0f, 0.25f))
  }

  test("WAV duration: data bytes over byte rate, integer milliseconds") {
    val oneSecond = Array.fill[Byte](16000)(128.toByte)
    val w = WavCodec.decode(WavCodec.encodePcm8(oneSecond, 16000, 1)).get
    assert(w.durationMs === 1000L)
    // stereo halves the per-channel sample count at the same byte rate
    val stereo = WavCodec.decode(WavCodec.encodePcm8(oneSecond, 16000, 2)).get
    assert(stereo.durationMs === 500L)
    // silence (all 128) has zero amplitude everywhere
    assert(w.meanAbsAmplitude === 0.0)
    assert(w.hist8.toSeq === Seq(1f, 0f, 0f, 0f, 0f, 0f, 0f, 0f))
  }

  test("WAV 16-bit signed LE parse (hand-built): amplitudes over 32768") {
    // fmt: PCM, mono, 1000 Hz, 16-bit; data: samples 0, +16384, -32768
    val out = new ByteArrayOutputStream()
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def w32(v: Int): Unit = { w16(v & 0xffff); w16((v >> 16) & 0xffff) }
    out.write("RIFF".getBytes); w32(36 + 6); out.write("WAVE".getBytes)
    out.write("fmt ".getBytes); w32(16)
    w16(1); w16(1); w32(1000); w32(2000); w16(2); w16(16)
    out.write("data".getBytes); w32(6)
    w16(0); w16(16384); w16(-32768 & 0xffff)
    val w = WavCodec.decode(out.toByteArray).get
    assert(w.bitsPerSample === 16 && w.sampleRate === 1000 && w.channels === 1)
    assert(w.durationMs === 3L) // 6 bytes / 2000 B/s = 3 ms
    assert(w.meanAbsAmplitude === (0.0 + 0.5 + 1.0) / 3)
  }

  test("WAV decode rejects non-WAV, truncated, and non-PCM payloads") {
    assert(WavCodec.decode("not audio at all".getBytes("UTF-8")).isEmpty)
    assert(WavCodec.decode(Array.emptyByteArray).isEmpty)
    val good = WavCodec.encodePcm8(Array[Byte](1, 2, 3, 4), 8000, 1)
    assert(WavCodec.decode(good.take(30)).isEmpty) // truncated header
    // flip the audioFormat field (offset 20) to 7 (µ-law): not PCM
    val mulaw = good.clone(); mulaw(20) = 7
    assert(WavCodec.decode(mulaw).isEmpty)
  }

  test("extractFeatures: audio WAV payloads take the real decode path") {
    implicit val sp = spark
    val wav = WavCodec.encodePcm8(Array[Byte](128.toByte, 0), 16000, 1)
    val ds = Seq(
      MediaAsset(1L, "audio", wav, 0, 0, 0L), // real WAV decode
      MediaAsset(2L, "audio", "mp3-ish garbage".getBytes("UTF-8"), 0, 0, 0L),
      MediaAsset(3L, "video", wav, 0, 0, 0L) // media-type gated: stub
    ).toDS()
    val out = Multimodal.extractFeatures(ds).collect().sortBy(_.assetId)
    assert(out(0).decoded && out(0).sampleRate === 16000 &&
      out(0).channels === 1 && out(0).imgWidth === 0)
    assert(out(0).brightness === 0.5) // |128-128|/128, |0-128|/128 → mean 0.5
    assert(!out(1).decoded && out(1).sampleRate === 0)
    assert(out(1).brightness === StubCodec.brightness("mp3-ish garbage".getBytes("UTF-8")))
    assert(!out(2).decoded && out(2).sampleRate === 0) // video never WAV-decodes
  }

  // ===== MP4 container codec (real video metadata parse, round-5) =====

  test("MP4 round-trip: encodeMp4 → decode recovers duration, dims, tracks, mdat") {
    import graft.operators.Multimodal.Mp4Codec
    val media = Array[Byte](1, 2, 3, 4, 5)
    val mp4 = Mp4Codec.encodeMp4(media, timescale = 600L, duration = 1200L,
      width = 640, height = 360, tracks = 2)
    assert(mp4.length === 140 + 100 * 2 + media.length) // the documented constant
    val v = Mp4Codec.decode(mp4).get
    assert(v.timescale === 600L)
    assert(v.durationMs === 2000L) // 1200 units / 600 Hz
    assert(v.nTracks === 2)
    assert(v.width === 640 && v.height === 360)
    assert(java.util.Arrays.copyOfRange(mp4, v.mdatOffset,
      v.mdatOffset + v.mdatLen).toSeq === media.toSeq)
  }

  test("MP4 v1 mvhd/tkhd (64-bit times) parse from a hand-built box tree") {
    import graft.operators.Multimodal.Mp4Codec
    val out = new ByteArrayOutputStream()
    def w16(v: Int): Unit = { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    def w32(v: Long): Unit = { w16(((v >> 16) & 0xffff).toInt); w16((v & 0xffff).toInt) }
    def w64(v: Long): Unit = { w32(v >>> 32); w32(v & 0xffffffffL) }
    def box(t: String, bodyLen: Int): Unit = { w32(8L + bodyLen); out.write(t.getBytes, 0, 4) }
    box("ftyp", 8); out.write("isom".getBytes, 0, 4); w32(0L)
    // mvhd v1 body: ver/flags + 8+8 times + ts(4) + dur(8) = 32 (+rest omitted:
    // the parser only needs the leading fields, cLen >= 28 suffices)
    box("moov", 8 + 32 + 8 + (8 + 96))
    box("mvhd", 32)
    w32(0x01000000L); w64(0L); w64(0L); w32(1000L); w64(4500L)
    box("trak", 8 + 96)
    box("tkhd", 96) // v1: ver/flags + 8+8 + id + res + dur8 = 36; +8 res +8 layer.. matrix 36 @52.. width@88
    w32(0x01000000L); w64(0L); w64(0L); w32(1L); w32(0L); w64(4500L)
    w32(0L); w32(0L); w16(0); w16(0); w16(0); w16(0)
    (1 to 9).foreach(_ => w32(0L)) // matrix
    w32(1280L << 16); w32(720L << 16)
    val v = Mp4Codec.decode(out.toByteArray).get
    assert(v.timescale === 1000L && v.durationMs === 4500L)
    assert(v.nTracks === 1 && v.width === 1280 && v.height === 720)
  }

  test("MP4 decode rejects non-MP4, truncated, and length-corrupt payloads") {
    import graft.operators.Multimodal.Mp4Codec
    assert(Mp4Codec.decode("definitely not a movie".getBytes).isEmpty)
    assert(Mp4Codec.decode(Array.emptyByteArray).isEmpty)
    val good = Mp4Codec.encodeMp4(Array[Byte](1), 600L, 600L, 10, 10, 1)
    assert(Mp4Codec.decode(good.take(40)).isEmpty) // truncated inside moov
    val corrupt = good.clone()
    corrupt(16) = 0x7f // moov size field blown past the payload end
    assert(Mp4Codec.decode(corrupt).isEmpty)
  }

  test("extractFeatures: video MP4 payloads parse container metadata for real") {
    implicit val sp = spark
    import graft.operators.Multimodal.Mp4Codec
    val media = Array.tabulate[Byte](100)(_.toByte)
    val mp4 = Mp4Codec.encodeMp4(media, 600L, 3000L, 320, 240, 1)
    val ds = Seq(
      MediaAsset(1L, "video", mp4, 0, 0, 0L), // real container parse
      MediaAsset(2L, "video", "mpeg-ish garbage".getBytes, 0, 0, 0L),
      MediaAsset(3L, "image", mp4, 0, 0, 0L) // media-type gated: stub
    ).toDS()
    val out = Multimodal.extractFeatures(ds).collect().sortBy(_.assetId)
    assert(out(0).decoded && out(0).tracks === 1)
    assert(out(0).imgWidth === 320 && out(0).imgHeight === 240)
    assert(out(0).mediaMs === 5000L) // 3000 units / 600
    assert(out(0).brightness === StubCodec.brightness(media)) // mdat bytes, not container
    assert(!out(1).decoded && out(1).tracks === 0)
    assert(!out(2).decoded) // images never go through the MP4 parser
  }

  test("fixture audio assets decode for real with doc_id-derived parameters") {
    implicit val sp = spark
    val feats = Multimodal.extractFeatures(
        Multimodal.assetsFromDocuments(Tables.documents(spark, sf)))
      .filter(_.mediaType == "audio").collect()
    assert(feats.nonEmpty)
    assert(feats.forall(_.decoded))
    assert(feats.forall(_.sampleRate === 16000))
    assert(feats.forall(f => f.channels === (1 + f.assetId % 2).toInt))
  }

  /** Striped horizontal gradient, values ≤ 196 so a +30 brightness
    * shift neither clamps at 255 nor wraps — every horizontal gradient
    * keeps its SIGN, which is the invariant dHash keys on. */
  private def gradientImage(delta: Int): BufferedImage =
    makeImage(64, 64) { (x, _) =>
      val v = x * 2 + (if ((x / 8) % 2 == 0) 40 else 0) + delta
      (v, v, v)
    }

  private def unrelatedImage: BufferedImage =
    makeImage(64, 64) { (x, y) =>
      val v = (x * 7 + y * 13) % 256; (255 - v, v, (v * 3) % 256)
    }

  test("dHash64: brightness shift is near-identical, different image is far") {
    val base = gradientImage(0)
    val brighter = gradientImage(30)
    val other = unrelatedImage
    def dist(a: BufferedImage, b: BufferedImage): Int =
      java.lang.Long.bitCount(Multimodal.dHash64(a) ^ Multimodal.dHash64(b))
    assert(dist(base, base) === 0)
    assert(dist(base, brighter) <= 3, "brightness shift must stay near")
    assert(dist(base, other) > 10, "unrelated image must be far")
    // PNG-encode round-trip (lossless) preserves the hash exactly
    val decoded = ImageCodec.decode(encode(base, "png")).get
    assert(Multimodal.dHash64(decoded) === Multimodal.dHash64(base))
  }

  test("imageNearDupPairs finds perceptual variants via the banding join") {
    // 1↔2 are perceptual variants (brightness shift); 3 is its own
    // image; 4 is audio; 5 is garbage bytes — only (1,2) should pair
    val base = gradientImage(0)
    val brighter = gradientImage(30)
    val other = unrelatedImage
    val assets = Seq(
      asset(1L, encode(base, "png")),
      asset(2L, encode(brighter, "png")),
      asset(3L, encode(other, "png")),
      MediaAsset(4L, "audio", encode(base, "png"), 0, 0, 1000L),
      asset(5L, Array[Byte](1, 2, 3))).toDS()
    val pairs = Multimodal.imageNearDupPairs(assets, maxDist = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((1L, 2L)))
    // signatures exist only for decodable images (4 is typed audio,
    // 5 is undecodable)
    val sigIds = Multimodal.imageDHashes(assets)
      .collect().map(_.getLong(0)).toSet
    assert(sigIds === Set(1L, 2L, 3L))
  }

  // ===== real video FRAME decode (round-6): BMP stills + MJPEG =====

  test("encodeBmp24 round-trips through imageio at the documented byte length") {
    val img = makeImage(7, 5)((x, y) => (x * 30, y * 40, (x + y) * 10))
    val bmp = ImageCodec.encodeBmp24(img)
    assert(bmp.length === 54 + 5 * ((3 * 7 + 3) & ~3)) // padded rows
    val back = ImageCodec.decode(bmp).get
    assert(back.getWidth === 7 && back.getHeight === 5)
    for (y <- 0 until 5; x <- 0 until 7)
      assert((back.getRGB(x, y) & 0xffffff) === (img.getRGB(x, y) & 0xffffff))
  }

  test("splitFrames walks concatenated BMP stills exactly") {
    import graft.operators.Multimodal.Mp4Codec
    val frames = (0 until 3).map(i =>
      ImageCodec.encodeBmp24(makeImage(4, 4)((_, _) => (i * 50, i * 50, i * 50))))
    val mdat = frames.reduce(_ ++ _)
    val split = Mp4Codec.splitFrames(mdat)
    assert(split.map(_.toSeq) === frames.map(_.toSeq))
    // trailing garbage after a valid walk stops cleanly
    assert(Mp4Codec.splitFrames(mdat ++ Array[Byte]('B', 'M', 0, 0)).size === 3)
    assert(Mp4Codec.splitFrames("not media".getBytes).isEmpty)
  }

  test("splitFrames walks an MJPEG stream (SOI..EOI) and frames decode for real") {
    import graft.operators.Multimodal.Mp4Codec
    val jpegs = (0 until 3).map(i =>
      ImageCodec.encodeAs(makeImage(16, 16)((_, _) => (i * 60 + 40, i * 60 + 40, i * 60 + 40)), "jpeg"))
    assert(jpegs.forall(j => (j(0) & 0xff) == 0xff && (j(1) & 0xff) == 0xd8))
    val split = Mp4Codec.splitFrames(jpegs.reduce(_ ++ _))
    assert(split.size === 3)
    val decoded = split.flatMap(ImageCodec.decode(_))
    assert(decoded.size === 3)
    // JPEG is lossy: constant-gray frames decode NEAR their planted level
    decoded.zipWithIndex.foreach { case (bi, i) =>
      val b = ImageCodec.brightness(bi)
      assert(math.abs(b - (i * 60 + 40) / 255.0) < 0.02, s"frame $i: $b")
    }
  }

  test("splitFrames MJPEG: FF D9 inside an APPn payload does not end the frame") {
    import graft.operators.Multimodal.Mp4Codec
    // plant an EXIF-style APP1 segment right after SOI whose payload
    // contains a COMPLETE miniature JPEG (its own SOI..EOI) — the
    // embedded-thumbnail shape that a raw FFD9 scan mis-splits on
    def withThumbnail(jpeg: Array[Byte]): Array[Byte] = {
      val thumb = Array[Byte](0xff.toByte, 0xd8.toByte, 1, 2, 3,
        0xff.toByte, 0xd9.toByte)
      val payload = "Exif  ".getBytes("ISO-8859-1") ++ thumb
      val len = payload.length + 2
      jpeg.take(2) ++
        Array(0xff.toByte, 0xe1.toByte, (len >> 8).toByte, (len & 0xff).toByte) ++
        payload ++ jpeg.drop(2)
    }
    val jpegs = (0 until 3).map(i => withThumbnail(
      ImageCodec.encodeAs(makeImage(16, 16)((_, _) =>
        (i * 60 + 40, i * 60 + 40, i * 60 + 40)), "jpeg")))
    val split = Mp4Codec.splitFrames(jpegs.reduce(_ ++ _))
    assert(split.map(_.toSeq) === jpegs.map(_.toSeq)) // exact frame boundaries
    assert(split.flatMap(ImageCodec.decode(_)).size === 3) // and they decode
  }

  test("extractFeatures: MP4 with planted stills decodes PIXELS, not bytes") {
    implicit val sp = spark
    import graft.operators.Multimodal.Mp4Codec
    // two 16x16 frames, gray 40 and 200 -> pooled brightness (40+200)/2/255
    val mdat = ImageCodec.encodeBmp24(makeImage(16, 16)((_, _) => (40, 40, 40))) ++
      ImageCodec.encodeBmp24(makeImage(16, 16)((_, _) => (200, 200, 200)))
    val mp4 = Mp4Codec.encodeMp4(mdat, 600L, 1200L, 320, 240, 2)
    val out = Multimodal.extractFeatures(
      Seq(MediaAsset(1L, "video", mp4, 0, 0, 0L)).toDS()).collect().head
    assert(out.decoded && out.frames === 2)
    assert(out.brightness === (40.0 + 200.0) / 2 / 255.0)
    assert(out.tracks === 2 && out.imgWidth === 320 && out.imgHeight === 240)
    // histogram: gray 40 -> bin 1, gray 200 -> bin 6, half the pixels each
    assert(out.features(1) === 0.5f && out.features(6) === 0.5f)
  }

  test("fixture video assets frame-decode with doc_id-derived expectations") {
    implicit val sp = spark
    val feats = Multimodal.extractFeatures(
        Multimodal.assetsFromDocuments(Tables.documents(spark, sf)))
      .filter(_.mediaType == "video").collect()
    assert(feats.nonEmpty)
    feats.foreach { f =>
      val k = (2 + f.assetId % 3).toInt
      assert(f.decoded && f.frames === k, s"asset ${f.assetId}")
      val expected = (0 until k).map(i => (f.assetId * 31 + i * 17) % 256)
        .sum.toDouble / k / 255.0
      assert(f.brightness === expected, s"asset ${f.assetId}")
    }
  }
}
