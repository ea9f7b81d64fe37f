package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val jpeg = Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte, 0xE0.toByte, 1, 2)
  private val png = Array[Byte](0x89.toByte, 'P', 'N', 'G', 13, 10)
  private val riff = "RIFFxxxx".getBytes

  test("binaryMeta sniffs magic bytes") {
    val df = Seq((1L, jpeg), (2L, png), (3L, riff)).toDF("id", "payload")
    val out = Multimodal.binaryMeta(df, "id", "payload")
      .select("id", "sniffed_kind").as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "jpeg", 2L -> "png", 3L -> "riff"))
  }

  test("decodeFeatures: deterministic stubbed features, streamed per partition") {
    val df = Seq((1L, jpeg), (2L, png)).toDF("id", "payload").repartition(2)
    val feats = Multimodal.decodeFeatures(df, "id", "payload").collect()
      .map(f => f.id -> f).toMap
    assert(feats(1L) == Multimodal.DecodeStub.decode(1L, jpeg))
    assert(feats(2L) == Multimodal.DecodeStub.decode(2L, png))
    assert(feats(1L).meanLuma > 0)
  }

  test("sampleFrames expands then filters frame indexes") {
    val df = Seq((1L, Array.fill[Byte](7)(1))).toDF("id", "payload")
    val feats = Multimodal.decodeFeatures(df, "id", "payload")
    val n = feats.head().nFrames
    val frames = Multimodal.sampleFrames(feats, everyNth = 2)
    assert(frames.count() == (0 until n count (_ % 2 == 0)))
  }

  test("resizePlan: aspect-preserving fit, never upscales") {
    val feats = Seq(
      Multimodal.MediaFeatures(1L, 64, 32, 1, 0.5), // wide: limited by width
      Multimodal.MediaFeatures(2L, 8, 8, 1, 0.5)    // small: untouched
    ).toDS()
    val out = Multimodal.resizePlan(feats, maxW = 32, maxH = 32)
      .select("id", "out_w", "out_h").as[(Long, Int, Int)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(out(1L) == ((32, 16)))
    assert(out(2L) == ((8, 8)))
  }

  test("ImageIoDecoder decodes real PNG/JPEG bytes; non-images fall back to the stub") {
    import java.awt.image.BufferedImage
    def imageBytes(w: Int, h: Int, rgb: Int, format: String): Array[Byte] = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
      val out = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, format, out))
      out.toByteArray
    }
    val whitePng = imageBytes(40, 24, 0xFFFFFF, "png")
    val blackJpg = imageBytes(8, 8, 0x000000, "jpg")
    val df = Seq((1L, whitePng), (2L, blackJpg), (3L, riff))
      .toDF("id", "payload").repartition(2)

    val feats = Multimodal.decodeFeatures(df, "id", "payload",
      Multimodal.ImageIoDecoder).collect().map(f => f.id -> f).toMap
    assert(feats(1L).width == 40 && feats(1L).height == 24)
    assert(feats(1L).meanLuma > 254.0) // solid white, BT.601 luma ~255
    assert(feats(2L).width == 8 && feats(2L).height == 8)
    assert(feats(2L).meanLuma < 5.0) // solid black (JPEG may not hit 0 exactly)
    assert(feats(3L) == Multimodal.DecodeStub.decode(3L, riff)) // RIFF: stub fallback

    // real bytes flow through the downstream plumbing: aspect-preserving
    // resize off TRUE dims, then the stub encoder into ANN-ready embeddings
    val spark2 = spark
    import spark2.implicits._
    val resized = Multimodal.resizePlan(
        Multimodal.decodeFeatures(df, "id", "payload", Multimodal.ImageIoDecoder),
        maxW = 20, maxH = 20)
      .select("id", "out_w", "out_h").as[(Long, Int, Int)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(resized(1L) == ((20, 12))) // 40x24 fit into 20x20
    assert(resized(2L) == ((8, 8)))   // never upscaled
    assert(Multimodal.embedStub(df, "id", "payload", dim = 16).count() == 3)
  }

  test("ImageIoDecoder bulk luma == per-pixel getRGB reference on gradient images") {
    import java.awt.image.BufferedImage
    // gradients, not solids: a band-order mix-up (B read as R) or a row/col
    // swap changes the mean on these but not on any solid color
    def gradientBytes(w: Int, h: Int, imgType: Int, format: String): Array[Byte] = {
      val img = new BufferedImage(w, h, imgType)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y, ((x * 7) % 256 << 16) | ((y * 11) % 256 << 8) | ((x + 3 * y) % 256))
      val out = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, format, out))
      out.toByteArray
    }
    def referenceLuma(bytes: Array[Byte]): Double = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      var sum = 0.0
      for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
        val rgb = img.getRGB(x, y)
        sum += 0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
          0.114 * (rgb & 0xff)
      }
      sum / (img.getWidth.toDouble * img.getHeight)
    }
    val fixtures = Seq(
      gradientBytes(33, 17, BufferedImage.TYPE_INT_RGB, "png"),   // decodes 3BYTE_BGR
      gradientBytes(16, 24, BufferedImage.TYPE_INT_RGB, "jpg"),   // decodes 3BYTE_BGR
      gradientBytes(9, 9, BufferedImage.TYPE_INT_ARGB, "png"),    // alpha: getRGB path
      gradientBytes(5, 40, BufferedImage.TYPE_BYTE_GRAY, "png")   // gray: getRGB path
    )
    fixtures.zipWithIndex.foreach { case (bytes, i) =>
      val got = Multimodal.ImageIoDecoder.decode(i.toLong, bytes).meanLuma
      assert(math.abs(got - referenceLuma(bytes)) < 1e-6,
        s"fixture $i: bulk=$got reference=${referenceLuma(bytes)}")
    }
  }

  private def wav(rate: Float, channels: Int, bits: Int,
                  samples: Array[Int]): Array[Byte] = {
    import javax.sound.sampled._
    val fmt = new AudioFormat(rate, bits, channels, /*signed=*/ bits == 16,
      /*bigEndian=*/ false)
    val data = new Array[Byte](samples.length * (bits / 8))
    samples.indices.foreach { i =>
      if (bits == 16) {
        data(2 * i) = (samples(i) & 0xff).toByte
        data(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      } else data(i) = (samples(i) & 0xff).toByte
    }
    val ais = new AudioInputStream(new java.io.ByteArrayInputStream(data),
      fmt, samples.length / channels)
    val out = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  test("WavDecoder: exact rate/frames/duration/RMS from a generated WAV") {
    // mono 16-bit 8000 Hz, 4000 constant-amplitude samples of 8192
    // (= 0.25 full scale): every derived value is exact, not approximate
    val mono = Multimodal.WavDecoder.decode(1L,
      wav(8000f, 1, 16, Array.fill(4000)(8192)))
    assert(mono == Multimodal.AudioFeatures(1L, 8000.0, 1, 4000L, 0.5, 0.25,
      decoded = true), s"got $mono")
    // stereo: L constant 0.25, R constant 0.5 -> pooled RMS
    // sqrt((0.25^2 + 0.5^2) / 2), frames = samples / channels
    val st = (0 until 2000).flatMap(_ => Seq(8192, 16384)).toArray
    val stereo = Multimodal.WavDecoder.decode(2L, wav(16000f, 2, 16, st))
    assert(stereo.sampleRate == 16000.0 && stereo.channels == 2 &&
      stereo.nFrames == 2000L && stereo.durationSec == 0.125 &&
      stereo.rms == math.sqrt((0.0625 + 0.25) / 2) && stereo.decoded)
    // 8-bit unsigned: constant 192 -> (192-128)/128 = 0.5 exactly
    val eight = Multimodal.WavDecoder.decode(3L,
      wav(8000f, 1, 8, Array.fill(800)(192)))
    assert(eight.rms == 0.5 && eight.nFrames == 800L && eight.decoded)
  }

  test("decodeAudio streams WAVs distributed; non-audio falls back to the stub") {
    val rows = Seq(
      (1L, wav(8000f, 1, 16, Array.fill(4000)(8192))),
      (2L, "definitely not a wav".getBytes("UTF-8")),
      (3L, null.asInstanceOf[Array[Byte]])
    ).toDF("id", "payload").repartition(3)
    val out = Multimodal.decodeAudio(rows, "id", "payload")
      .collect().map(f => f.id -> f).toMap
    assert(out(1L).decoded && out(1L).rms == 0.25 && out(1L).durationSec == 0.5)
    assert(!out(2L).decoded &&
      out(2L) == Multimodal.AudioStub.decode(2L, "definitely not a wav".getBytes("UTF-8")))
    assert(!out(3L).decoded && out(3L).nFrames == 0L)
  }

  test("Embedder seam: decode -> embed -> ANN end-to-end; EmbedStub matches embedStub") {
    // id 5 is a NULL payload: both paths must embed it as empty content
    // (a real encoder never throws on a bad payload; the stub mirrors that)
    val df = Seq((1L, jpeg), (2L, png), (3L, riff), (4L, jpeg),
        (5L, null: Array[Byte]))
      .toDF("id", "payload").repartition(2)
    // the row-at-a-time stub through the seam computes the SAME embedding
    // as the codegen'd column formulation (md5 over identical bytes)
    val viaSeam = Multimodal.embedFeatures(df, "id", "payload", Multimodal.EmbedStub(32))
      .as[(Long, Array[Float])].collect().toMap
    val viaCols = Multimodal.embedStub(df, "id", "payload", dim = 32)
      .as[(Long, Array[Float])].collect().toMap
    assert(viaSeam.keySet == viaCols.keySet)
    viaSeam.foreach { case (id, v) => assert(v.sameElements(viaCols(id)), s"id=$id") }

    // full pipeline through the pluggable traits: decode (real features),
    // then embed, then brute-force ANN — duplicate payloads are mutual NNs
    val feats = Multimodal.decodeFeatures(df, "id", "payload", Multimodal.ImageIoDecoder)
    assert(feats.count() == 5)
    val emb = Multimodal.embedFeatures(df, "id", "payload", Multimodal.EmbedStub(16))
    val q = emb.where(col("id") === 1L)
      .select(col("id").as("q_id"), col("embedding").as("q_vec"))
    val nn = Similarity.bruteForceTopK(emb, q, "id", "embedding", "q_id", "q_vec", 1)
      .select("id", "cos_sim").as[(Long, Double)].head()
    assert(nn == ((4L, 1.0)))
  }

  test("embedStub: deterministic unit-range embeddings feed the ANN operators") {
    val df = Seq((1L, jpeg), (2L, png), (3L, riff), (4L, jpeg))
      .toDF("id", "payload")
    val emb = Multimodal.embedStub(df, "id", "payload", dim = 32)
    val vals = emb.select(explode(col("embedding"))).as[Float].collect()
    assert(vals.forall(v => v >= -1.0f && v < 1.0f))
    // identical payloads embed identically; the whole binary -> embedding
    // -> ANN pipeline runs with only the encoder stubbed
    val q = emb.where(col("id") === 1L)
      .select(col("id").as("q_id"), col("embedding").as("q_vec"))
    val nn = Similarity.bruteForceTopK(emb, q, "id", "embedding", "q_id", "q_vec", 1)
      .select("id", "cos_sim").as[(Long, Double)].head()
    assert(nn == ((4L, 1.0))) // the duplicate jpeg is its own nearest neighbor
  }

  // --- MJPEG-in-AVI fixtures: a hand-assembled RIFF container around
  // real ImageIO JPEG frames (little-endian sizes, even-byte chunk
  // alignment — the real AVI layout, JDK-only) ---
  private def le32(v: Long): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  private def aviChunk(id: String, data: Array[Byte]): Array[Byte] = {
    val pad: Array[Byte] =
      if (data.length % 2 == 1) Array(0.toByte) else Array.emptyByteArray
    id.getBytes("US-ASCII") ++ le32(data.length.toLong) ++ data ++ pad
  }
  private def aviList(typ: String, children: Array[Byte]*): Array[Byte] =
    aviChunk("LIST", typ.getBytes("US-ASCII") ++ children.flatten)

  private def jpegFrame(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", out))
    out.toByteArray
  }

  private def mjpegAvi(frames: Seq[Array[Byte]], w: Int, h: Int,
                       scale: Int, rate: Int): Array[Byte] = {
    import java.nio.{ByteBuffer, ByteOrder}
    val avih = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
    avih.putInt(0, (1000000L * scale / rate).toInt) // dwMicroSecPerFrame
    avih.putInt(16, frames.size)                    // dwTotalFrames
    avih.putInt(24, 1)                              // dwStreams
    avih.putInt(32, w).putInt(36, h)
    val strh = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
    strh.put(0, "vids".getBytes("US-ASCII")).put(4, "MJPG".getBytes("US-ASCII"))
    strh.putInt(20, scale).putInt(24, rate).putInt(32, frames.size)
    val strf = ByteBuffer.allocate(40).order(ByteOrder.LITTLE_ENDIAN)
    strf.putInt(0, 40).putInt(4, w).putInt(8, h)
    strf.putShort(12, 1.toShort).putShort(14, 24.toShort)
    strf.put(16, "MJPG".getBytes("US-ASCII"))
    val hdrl = aviList("hdrl", aviChunk("avih", avih.array()),
      aviList("strl", aviChunk("strh", strh.array()), aviChunk("strf", strf.array())))
    val movi = aviList("movi", frames.zipWithIndex.map { case (f, i) =>
      aviChunk(f"$i%02ddc", f)
    }: _*)
    val body = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    "RIFF".getBytes("US-ASCII") ++ le32(body.length.toLong) ++ body
  }

  test("AviMjpegDecoder: exact frames/fps/dims and frame-averaged luma from a generated AVI") {
    // odd-length first frame (trailing byte after EOI — ImageIO ignores
    // it) so the even-alignment pad is actually exercised mid-stream
    val f0 = {
      val f = jpegFrame(20, 12, 0x808080)
      if (f.length % 2 == 0) f :+ 0.toByte else f
    }
    val frames = Seq(f0, jpegFrame(20, 12, 0xFFFFFF), jpegFrame(20, 12, 0x000000))
    val avi = mjpegAvi(frames, 20, 12, scale = 2, rate = 25)
    val got = Multimodal.AviMjpegDecoder.decode(7L, avi)
    assert(got.decoded && got.width == 20 && got.height == 12 &&
      got.nFrames == 3 && got.fps == 12.5, s"got $got")
    val expectedLuma = frames
      .map(Multimodal.ImageIoDecoder.decode(0L, _).meanLuma).sum / 3
    assert(math.abs(got.meanLuma - expectedLuma) < 1e-9,
      s"luma ${got.meanLuma} != $expectedLuma")
    // mid-gray ~128, white ~255, black ~0 -> average lands near 128
    assert(got.meanLuma > 100 && got.meanLuma < 160)
  }

  test("AviMjpegDecoder: a corrupt frame is skipped, not fatal; non-AVI falls back to the stub") {
    val good = jpegFrame(8, 8, 0x4080C0)
    val corrupt = good.take(10) // truncated JPEG: ImageIO returns null
    val avi = mjpegAvi(Seq(good, corrupt, good), 8, 8, scale = 1, rate = 30)
    val got = Multimodal.AviMjpegDecoder.decode(1L, avi)
    assert(got.decoded && got.nFrames == 2 && got.fps == 30.0, s"got $got")

    // RIFF-but-not-AVI (a WAV), garbage, truncated header, null: all stub
    val wavBytes = wav(8000f, 1, 16, Array.fill(100)(1000))
    Seq(wavBytes, "garbage".getBytes, "RIFF".getBytes, null: Array[Byte])
      .zipWithIndex.foreach { case (b, i) =>
        assert(Multimodal.AviMjpegDecoder.decode(i.toLong, b) ==
          Multimodal.VideoStub.decode(i.toLong, b), s"payload $i")
      }
    // an AVI whose every frame is corrupt parses but decodes nothing: stub
    val allBad = mjpegAvi(Seq(corrupt, corrupt), 8, 8, 1, 30)
    assert(Multimodal.AviMjpegDecoder.decode(9L, allBad) ==
      Multimodal.VideoStub.decode(9L, allBad))
  }

  /** Generated Y4M: header + FRAME markers + planar YUV with constant Y
    * per frame (closed-form luma). */
  private def y4m(w: Int, h: Int, fps: String, colorspace: String,
                  frameLumas: Seq[Int]): Array[Byte] = {
    val chroma = colorspace match {
      case c if c.startsWith("C420") => 2 * ((w / 2) * (h / 2))
      case c if c.startsWith("C422") => 2 * ((w / 2) * h)
      case c if c.startsWith("C444") => 2 * w * h
      case _ => 0 // Cmono
    }
    val header = s"YUV4MPEG2 W$w H$h F$fps Ip A1:1 $colorspace\n"
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val frames = frameLumas.flatMap { y =>
      "FRAME\n".getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++
        Array.fill(w * h)(y.toByte) ++ Array.fill(chroma)(128.toByte)
    }
    header ++ frames
  }

  test("Y4mDecoder: exact dims/frames/fps and closed-form luma from a generated Y4M") {
    val v = y4m(16, 8, "30000:1001", "C420jpeg", Seq(50, 60, 70))
    val got = Multimodal.Y4mDecoder.decode(5L, v)
    assert(got.decoded && got.width == 16 && got.height == 8 &&
      got.nFrames == 3, s"got $got")
    assert(math.abs(got.fps - 30000.0 / 1001.0) < 1e-12, s"fps ${got.fps}")
    assert(math.abs(got.meanLuma - 60.0) < 1e-9, s"luma ${got.meanLuma}")

    // every colorspace's frame stride parses (same luma, same count)
    for (cs <- Seq("C420", "C422", "C444", "Cmono")) {
      val g = Multimodal.Y4mDecoder.decode(1L, y4m(12, 6, "25:1", cs, Seq(100, 200)))
      assert(g.decoded && g.nFrames == 2 && g.fps == 25.0 &&
        math.abs(g.meanLuma - 150.0) < 1e-9, s"$cs -> $g")
    }
  }

  test("Y4mDecoder: truncated trailing frame dropped; junk falls back to the stub") {
    val full = y4m(8, 8, "24:1", "C420", Seq(10, 20, 30))
    val truncated = full.dropRight(20) // cuts into the last frame's planes
    val got = Multimodal.Y4mDecoder.decode(2L, truncated)
    assert(got.decoded && got.nFrames == 2 &&
      math.abs(got.meanLuma - 15.0) < 1e-9, s"got $got")

    Seq("garbage".getBytes, "YUV4MPEG2".getBytes, // magic but no header line
        y4m(8, 8, "24:1", "C420", Nil), // zero frames
        null: Array[Byte])
      .zipWithIndex.foreach { case (b, i) =>
        assert(Multimodal.Y4mDecoder.decode(i.toLong, b) ==
          Multimodal.VideoStub.decode(i.toLong, b), s"payload $i")
      }
  }

  /** Animated GIF via the JDK writer: solid-gray full frames with an
    * explicit GraphicsControlExtension delay per frame. */
  private def gif(w: Int, h: Int, grays: Seq[Int], delayCs: Int): Array[Byte] = {
    import javax.imageio.{IIOImage, ImageIO, ImageTypeSpecifier}
    import javax.imageio.metadata.IIOMetadataNode
    val bos = new java.io.ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    grays.foreach { v =>
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = img.createGraphics()
      g.setColor(new java.awt.Color(v, v, v)); g.fillRect(0, 0, w, h); g.dispose()
      val md = writer.getDefaultImageMetadata(
        ImageTypeSpecifier.createFromRenderedImage(img),
        writer.getDefaultWriteParam)
      val fmt = "javax_imageio_gif_image_1.0"
      val root = new IIOMetadataNode(fmt)
      val gce = new IIOMetadataNode("GraphicControlExtension")
      gce.setAttribute("disposalMethod", "none")
      gce.setAttribute("userInputFlag", "FALSE")
      gce.setAttribute("transparentColorFlag", "FALSE")
      gce.setAttribute("delayTime", delayCs.toString)
      gce.setAttribute("transparentColorIndex", "0")
      root.appendChild(gce)
      md.mergeTree(fmt, root)
      writer.writeToSequence(new IIOImage(img, null, md), null)
    }
    writer.endWriteSequence()
    ios.close()
    bos.toByteArray
  }

  test("GifDecoder: exact frames/fps/dims and closed-form luma from a generated GIF") {
    // solid gray (v,v,v): BT.601 luma == v exactly (coefficients sum to 1)
    val bytes = gif(48, 24, Seq(10, 60, 110, 160), delayCs = 5)
    val f = Multimodal.GifDecoder.decode(9L, bytes)
    assert(f.decoded, "GIF should really decode")
    assert(f.width == 48 && f.height == 24 && f.nFrames == 4)
    // 4 frames x 5 cs = 0.2 s -> 20 fps
    assert(math.abs(f.fps - 20.0) < 1e-9, s"fps ${f.fps}")
    assert(math.abs(f.meanLuma - 85.0) < 1e-6, s"luma ${f.meanLuma}")
    // junk with a GIF header degrades to the stub, not a throw
    val junk = "GIF89a then garbage".getBytes
    assert(Multimodal.GifDecoder.decode(1L, junk) ==
      Multimodal.VideoStub.decode(1L, junk))
  }

  test("strided Y4M decode: closed-form luma over exactly the sampled frames; skipped frames never read") {
    // 7 frames, deliberately non-arithmetic lumas so each stride's mean is distinct
    val lumas = Seq(10, 200, 30, 40, 250, 60, 70)
    val v = y4m(16, 8, "24:1", "C420", lumas)
    def expect(stride: Int): Double = {
      val s = lumas.zipWithIndex.collect { case (l, i) if i % stride == 0 => l }
      s.sum.toDouble / s.size
    }
    for (stride <- Seq(1, 2, 3, 7)) {
      val got = Multimodal.Y4mDecoder.strided(stride).decode(1L, v)
      // nFrames/fps still cover the WHOLE container; luma is the sample's
      assert(got.decoded && got.nFrames == 7 && got.fps == 24.0, s"stride=$stride: $got")
      assert(math.abs(got.meanLuma - expect(stride)) < 1e-9,
        s"stride=$stride: luma ${got.meanLuma} != ${expect(stride)}")
    }
    assert(Multimodal.Y4mDecoder.strided(1).decode(1L, v) ==
      Multimodal.Y4mDecoder.decode(1L, v))
    // a stride is a SEEK on uncompressed frames: corrupting a skipped
    // frame's plane bytes cannot change the strided result
    val header = s"YUV4MPEG2 W16 H8 F24:1 Ip A1:1 C420\n".length
    val frameBytes = "FRAME\n".length + 16 * 8 + 2 * 8 * 4
    val corrupt = v.clone()
    val f1Plane = header + frameBytes + "FRAME\n".length // frame 1's Y plane
    (0 until 16 * 8).foreach(i => corrupt(f1Plane + i) = 0xFF.toByte)
    assert(Multimodal.Y4mDecoder.strided(2).decode(1L, corrupt) ==
      Multimodal.Y4mDecoder.strided(2).decode(1L, v))
  }

  test("strided GIF decode: sampled-frame luma, whole-animation fps") {
    val grays = Seq(10, 60, 110, 160)
    val bytes = gif(48, 24, grays, delayCs = 5)
    val got = Multimodal.GifDecoder.strided(2).decode(3L, bytes)
    assert(got.decoded && got.nFrames == 4 && got.width == 48 && got.height == 24)
    // 4 frames / (4 × 5 cs): the delay sum covers SKIPPED frames too, so
    // strided fps == unstrided fps
    assert(math.abs(got.fps - 20.0) < 1e-9, s"fps ${got.fps}")
    assert(math.abs(got.meanLuma - (10.0 + 110.0) / 2) < 1e-6, s"luma ${got.meanLuma}")
    assert(Multimodal.GifDecoder.strided(1).decode(3L, bytes) ==
      Multimodal.GifDecoder.decode(3L, bytes))
  }

  test("sampleVideoFrames + resizePlanVideo: strided fan-out and geometry over decoded video") {
    val rows = Seq(
      (1L, y4m(16, 8, "24:1", "C420", Seq(10, 20, 30, 40, 50, 60, 70))),
      (2L, y4m(64, 8, "24:1", "C420", Seq(5, 15))))
      .toDF("id", "payload")
    val feats = Multimodal.decodeVideo(rows, "id", "payload",
      Multimodal.Y4mDecoder.strided(3))
    val sampled = Multimodal.sampleVideoFrames(feats, 3)
      .select("id", "frame_idx").as[(Long, Int)].collect().toSet
    // exactly the frames the strided decoder measured: 0, 3, 6 / 0
    assert(sampled == Set((1L, 0), (1L, 3), (1L, 6), (2L, 0)))
    val plan = Multimodal.resizePlanVideo(feats, 32, 32)
      .select("id", "out_w", "out_h").as[(Long, Int, Int)].collect()
      .map { case (id, ow, oh) => id -> ((ow, oh)) }.toMap
    assert(plan(1L) == ((16, 8)))   // fits: scale 1.0
    assert(plan(2L) == ((32, 4)))   // 64x8 into 32x32: scale 0.5
  }

  test("SniffingVideoDecoder routes a mixed corpus by magic bytes") {
    val avi = mjpegAvi(Seq(jpegFrame(10, 10, 0x404040)), 10, 10, scale = 1, rate = 24)
    val yuv = y4m(16, 8, "25:1", "C420", Seq(77))
    val noise = "noise".getBytes
    assert(Multimodal.SniffingVideoDecoder.decode(1L, avi) ==
      Multimodal.AviMjpegDecoder.decode(1L, avi))
    assert(Multimodal.SniffingVideoDecoder.decode(2L, yuv) ==
      Multimodal.Y4mDecoder.decode(2L, yuv))
    assert(Multimodal.SniffingVideoDecoder.decode(3L, noise) ==
      Multimodal.VideoStub.decode(3L, noise))
    val anim = gif(10, 10, Seq(42, 84), delayCs = 4)
    assert(Multimodal.SniffingVideoDecoder.decode(4L, anim) ==
      Multimodal.GifDecoder.decode(4L, anim))
    val out = Multimodal.decodeVideo(
      Seq((1L, avi), (2L, yuv), (3L, noise), (4L, anim)).toDF("id", "payload"),
      "id", "payload", Multimodal.SniffingVideoDecoder).collect()
      .map(f => f.id -> f).toMap
    assert(out(1L).decoded && out(2L).decoded && !out(3L).decoded && out(4L).decoded)
    assert(out(2L).nFrames == 1 && math.abs(out(2L).meanLuma - 77.0) < 1e-9)
    assert(out(4L).nFrames == 2 && math.abs(out(4L).meanLuma - 63.0) < 1e-6)
  }

  test("decodeVideo streams AVIs distributed; mixed corpus degrades per-row") {
    val avi = mjpegAvi(Seq(jpegFrame(10, 10, 0x202020),
      jpegFrame(10, 10, 0xE0E0E0)), 10, 10, scale = 1, rate = 24)
    val df = Seq((1L, avi), (2L, "noise".getBytes), (3L, null: Array[Byte]))
      .toDF("id", "payload").repartition(2)
    val out = Multimodal.decodeVideo(df, "id", "payload").collect()
      .map(f => f.id -> f).toMap
    assert(out(1L) == Multimodal.AviMjpegDecoder.decode(1L, avi))
    assert(out(1L).decoded && out(1L).nFrames == 2 && out(1L).fps == 24.0)
    assert(out(2L) == Multimodal.VideoStub.decode(2L, "noise".getBytes))
    assert(!out(3L).decoded)
  }
}
