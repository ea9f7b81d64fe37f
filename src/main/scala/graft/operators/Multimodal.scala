package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (binary) column plumbing.
  *
  * Media payloads ride as opaque `BinaryType` columns with typed metadata
  * alongside. The decode step is a per-partition batch transform
  * (`mapPartitions` over an iterator — the Scala analogue of mapInPandas
  * batches): partitions stream, nothing collects, and batch size is the
  * Spark partition, so a 100 TB binary corpus decodes embarrassingly
  * parallel. The codec is pluggable behind [[MediaDecoder]]:
  * [[ImageIoDecoder]] really decodes PNG/JPEG via the JDK-bundled
  * `javax.imageio` (no external libs needed); [[DecodeStub]] is the
  * deterministic fake for modalities whose codecs aren't on this classpath
  * (audio/video) and for parquet-only corpora where stable fixtures matter.
  */
object Multimodal {

  /** Metadata extractable without decoding: size, magic-byte sniff, hash.
    * Pure column expressions — map-side, codegen'd. */
  def binaryMeta(df: DataFrame, idCol: String, binCol: String): DataFrame =
    df.select(
      col(idCol),
      length(col(binCol)).as("byte_len"),
      md5(col(binCol)).as("content_hash"),
      hex(substring(col(binCol), 1, 4)).as("magic_hex"),
      when(hex(substring(col(binCol), 1, 3)) === "FFD8FF", "jpeg")
        .when(hex(substring(col(binCol), 1, 4)) === "89504E47", "png")
        .when(substring(col(binCol), 1, 4).cast("string") === "RIFF", "riff")
        .otherwise("unknown").as("sniffed_kind"))

  /** Decoded media features (stub shape). */
  case class MediaFeatures(id: Long, width: Int, height: Int, nFrames: Int,
                           meanLuma: Double)

  /** The codec boundary: runs executor-side inside `mapPartitions`, so an
    * implementation must be serializable and must never throw on a bad
    * payload (at 100 TB some payloads WILL be truncated — degrade, don't
    * kill the stage). */
  trait MediaDecoder extends Serializable {
    def decode(id: Long, bytes: Array[Byte]): MediaFeatures
  }

  /** Deterministic fake: derives "features" from content, not randomness —
    * stable fixtures for modalities whose codecs aren't on the classpath. */
  object DecodeStub extends MediaDecoder {
    def decode(id: Long, bytes: Array[Byte]): MediaFeatures = {
      val n = if (bytes == null) 0 else bytes.length
      val sum = if (n == 0) 0L else bytes.foldLeft(0L)((a, b) => a + (b & 0xff))
      MediaFeatures(id, width = 16 + (n % 64), height = 16 + (sum % 64).toInt,
        nFrames = 1 + (n % 4), meanLuma = if (n == 0) 0.0 else sum.toDouble / n)
    }
  }

  /** Real still-image decoding via the JDK-bundled `javax.imageio` (PNG,
    * JPEG, GIF, BMP — whatever the JVM's registered readers handle): true
    * dimensions and the BT.601 mean luma (0..255, the same scale as the
    * stub's byte average). Payloads no reader accepts — other modalities,
    * truncated files — fall back to [[DecodeStub]] so a mixed corpus
    * processes instead of failing the stage. */
  object ImageIoDecoder extends MediaDecoder {
    def decode(id: Long, bytes: Array[Byte]): MediaFeatures = {
      val img =
        if (bytes == null || bytes.length == 0) null
        else
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
          catch { case _: java.io.IOException => null }
      if (img == null) DecodeStub.decode(id, bytes)
      else {
        val (w, h) = (img.getWidth, img.getHeight)
        MediaFeatures(id, w, h, nFrames = 1,
          meanLuma = lumaSum(img, w, h) / (w.toDouble * h))
      }
    }

    /** BT.601 luma sum via bulk reads — never a per-pixel `getRGB` call.
      * `private[operators]` so [[AviMjpegDecoder]] shares the exact same
      * arithmetic for per-frame luma.
      * Raster bands are read directly only for image types whose samples
      * ARE the sRGB channels `getRGB` would return (no color-space
      * conversion, no premultiplied alpha); anything else goes through the
      * row-bulk `getRGB` overload, which matches per-pixel `getRGB` exactly
      * while amortizing the per-call overhead over a whole row. */
    private[operators] def lumaSum(img: java.awt.image.BufferedImage, w: Int, h: Int): Double = {
      import java.awt.image.BufferedImage.{TYPE_3BYTE_BGR, TYPE_INT_BGR, TYPE_INT_RGB}
      var sum = 0.0
      img.getType match {
        case TYPE_INT_RGB | TYPE_INT_BGR | TYPE_3BYTE_BGR =>
          // raster band order is the color-model component order (0=R,1=G,
          // 2=B) regardless of byte layout, and these types are sRGB with
          // no alpha, so samples == getRGB channels
          val raster = img.getRaster
          val row = new Array[Int](w)
          var band = 0
          while (band < 3) {
            val coef = band match { case 0 => 0.299; case 1 => 0.587; case _ => 0.114 }
            var y = 0
            while (y < h) {
              raster.getSamples(0, y, w, 1, band, row)
              var x = 0
              var s = 0L
              while (x < w) { s += row(x); x += 1 }
              sum += coef * s
              y += 1
            }
            band += 1
          }
        case _ =>
          val row = new Array[Int](w)
          var y = 0
          while (y < h) {
            img.getRGB(0, y, w, 1, row, 0, w)
            var x = 0
            var (sr, sg, sb) = (0L, 0L, 0L)
            while (x < w) {
              val rgb = row(x)
              sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
              x += 1
            }
            sum += 0.299 * sr + 0.587 * sg + 0.114 * sb
            y += 1
          }
      }
      sum
    }
  }

  /** Batched decode over (id, binary) rows: one decoder call per row,
    * streamed per partition. Repartition first if the binary payloads are
    * skewed. */
  def decodeFeatures(df: DataFrame, idCol: String, binCol: String,
                     decoder: MediaDecoder = DecodeStub): Dataset[MediaFeatures] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .mapPartitions { it: Iterator[Row] =>
        it.map { r =>
          decoder.decode(r.getLong(0),
            if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1))
        }
      }
  }

  /** Decoded audio features: the typed columns an audio pipeline needs
    * before any model sees the waveform. `decoded` distinguishes real
    * codec output from the stub fallback. */
  case class AudioFeatures(id: Long, sampleRate: Double, channels: Int,
                           nFrames: Long, durationSec: Double, rms: Double,
                           decoded: Boolean)

  /** The audio codec boundary, mirroring [[MediaDecoder]]: executor-side
    * inside `mapPartitions`, serializable, never throws on a bad payload. */
  trait AudioDecoder extends Serializable {
    def decode(id: Long, bytes: Array[Byte]): AudioFeatures
  }

  /** Deterministic fake for non-WAV modalities (mp3/ogg codecs are not on
    * this classpath) — features derive from content, like [[DecodeStub]]. */
  object AudioStub extends AudioDecoder {
    def decode(id: Long, bytes: Array[Byte]): AudioFeatures = {
      val n = if (bytes == null) 0 else bytes.length
      val sum = if (n == 0) 0L else bytes.foldLeft(0L)((a, b) => a + (b & 0xff))
      val rate = 8000.0 + (n % 3) * 4000.0
      AudioFeatures(id, rate, channels = 1 + (n % 2), nFrames = n.toLong,
        durationSec = n / rate, rms = if (n == 0) 0.0 else (sum % 256) / 255.0,
        decoded = false)
    }
  }

  /** REAL WAV/PCM decoding via the JDK-bundled `javax.sound.sampled` (no
    * external codecs): true sample rate / channel count / frame count,
    * duration, and RMS loudness over all samples pooled across channels,
    * normalized to [-1, 1] (16-bit signed ÷ 32768 with stream endianness,
    * 8-bit unsigned centered ÷ 128). Non-PCM or truncated payloads fall
    * back to [[AudioStub]] so a mixed corpus processes, not fails — the
    * [[ImageIoDecoder]] convention. */
  object WavDecoder extends AudioDecoder {
    def decode(id: Long, bytes: Array[Byte]): AudioFeatures = {
      if (bytes == null || bytes.length == 0) return AudioStub.decode(id, bytes)
      try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try {
          val f = in.getFormat
          import javax.sound.sampled.AudioFormat.Encoding._
          val bits = f.getSampleSizeInBits
          val ok = (f.getEncoding == PCM_SIGNED && bits == 16) ||
            (f.getEncoding == PCM_UNSIGNED && bits == 8)
          val nFrames = in.getFrameLength
          if (!ok || nFrames <= 0) return AudioStub.decode(id, bytes)
          val data = in.readAllBytes()
          val nSamples = nFrames * f.getChannels
          var sumSq = 0.0
          var i = 0
          if (bits == 16) {
            val be = f.isBigEndian
            while (i < nSamples) {
              val (b0, b1) = (data(2 * i) & 0xff, data(2 * i + 1) & 0xff)
              val v = (if (be) (b0 << 8) | b1 else (b1 << 8) | b0).toShort / 32768.0
              sumSq += v * v
              i += 1
            }
          } else {
            while (i < nSamples) {
              val v = ((data(i) & 0xff) - 128) / 128.0
              sumSq += v * v
              i += 1
            }
          }
          AudioFeatures(id, f.getSampleRate.toDouble, f.getChannels, nFrames,
            durationSec = nFrames / f.getSampleRate.toDouble,
            rms = math.sqrt(sumSq / nSamples), decoded = true)
        } finally in.close()
      } catch {
        case _: javax.sound.sampled.UnsupportedAudioFileException |
             _: java.io.IOException | _: IndexOutOfBoundsException =>
          AudioStub.decode(id, bytes)
      }
    }
  }

  /** Decoded video features: container + per-frame signal, the typed
    * columns a frame-sampling pipeline keys on. `decoded` distinguishes
    * real codec output from the stub fallback. */
  case class VideoFeatures(id: Long, width: Int, height: Int, nFrames: Int,
                           fps: Double, meanLuma: Double, decoded: Boolean)

  /** The video codec boundary, mirroring [[MediaDecoder]]: executor-side
    * inside `mapPartitions`, serializable, never throws on a bad payload. */
  trait VideoDecoder extends Serializable {
    def decode(id: Long, bytes: Array[Byte]): VideoFeatures
  }

  /** Deterministic fake for codecs not on this classpath (MP4/H.264 etc.)
    * — features derive from content, like [[DecodeStub]]. */
  object VideoStub extends VideoDecoder {
    def decode(id: Long, bytes: Array[Byte]): VideoFeatures = {
      val n = if (bytes == null) 0 else bytes.length
      val sum = if (n == 0) 0L else bytes.foldLeft(0L)((a, b) => a + (b & 0xff))
      VideoFeatures(id, width = 16 + (n % 64), height = 16 + (sum % 64).toInt,
        nFrames = 1 + (n % 24), fps = 24.0 + (n % 2) * 6.0,
        meanLuma = if (n == 0) 0.0 else sum.toDouble / n, decoded = false)
    }
  }

  /** REAL MJPEG-in-AVI decoding with the JDK alone: AVI is a RIFF
    * container whose `movi` chunks (`##dc`/`##db`) carry one complete
    * JPEG per frame, and `javax.imageio` decodes those — no native codec
    * needed. Emits true frame count (frames that actually decoded),
    * fps from the video stream header (`strh` dwRate/dwScale, falling
    * back to `avih` microseconds-per-frame), dimensions from the first
    * decoded frame, and mean BT.601 luma averaged over all decoded
    * frames (same [[ImageIoDecoder.lumaSum]] arithmetic as stills).
    *
    * Degrade-don't-kill, the [[ImageIoDecoder]] convention: a payload
    * that is not RIFF-AVI, has a truncated chunk tree, or decodes zero
    * frames falls back to [[VideoStub]]; an individually corrupt frame
    * inside an otherwise-good file is skipped, not fatal. */
  object AviMjpegDecoder extends VideoDecoder {
    private def u32(b: Array[Byte], o: Int): Long =
      (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
        ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
    private def fourcc(b: Array[Byte], o: Int): String =
      new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)

    /** One pass over the chunk tree, collecting the header fields and
      * frame-chunk extents. Sizes are little-endian; chunks pad to even. */
    private final class Scan(b: Array[Byte]) {
      var usPerFrame = 0L
      var scale = 0L
      var rate = 0L
      var sawVids = false
      val frames = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]

      def walk(from: Int, to: Int, inMovi: Boolean): Unit = {
        var pos = from
        while (pos + 8 <= to) {
          val id = fourcc(b, pos)
          val size = u32(b, pos + 4)
          val dataStart = pos + 8
          val dataEnd = dataStart + size
          if (size < 0 || dataEnd > to) return // truncated: keep what we have
          if (id == "LIST" && size >= 4) {
            val listType = fourcc(b, dataStart)
            walk(dataStart + 4, dataEnd.toInt,
              inMovi || listType == "movi" || listType == "rec ")
          } else if (id == "avih" && size >= 40) {
            usPerFrame = u32(b, dataStart)
          } else if (id == "strh" && size >= 28) {
            if (fourcc(b, dataStart) == "vids" && !sawVids) {
              sawVids = true
              scale = u32(b, dataStart + 20)
              rate = u32(b, dataStart + 24)
            }
          } else if (inMovi && size > 0 && id.length == 4 &&
                     (id.endsWith("dc") || id.endsWith("db"))) {
            frames += ((dataStart, size.toInt))
          }
          pos = (dataEnd + (size & 1L)).toInt
        }
      }
    }

    def decode(id: Long, bytes: Array[Byte]): VideoFeatures = {
      if (bytes == null || bytes.length < 12 ||
          fourcc(bytes, 0) != "RIFF" || fourcc(bytes, 8) != "AVI ")
        return VideoStub.decode(id, bytes)
      try {
        val scan = new Scan(bytes)
        val riffEnd = math.min(bytes.length.toLong, 8L + u32(bytes, 4)).toInt
        scan.walk(12, riffEnd, inMovi = false)
        var nDecoded = 0
        var w = 0
        var h = 0
        var lumaAcc = 0.0
        scan.frames.foreach { case (off, len) =>
          // ImageIO.read on a corrupt JPEG payload can throw beyond
          // IOException (IllegalArgumentException, CMMException,
          // NegativeArraySizeException from codec internals) — any
          // per-frame failure means "skip the frame", never a task kill.
          val img =
            try javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(bytes, off, len))
            catch { case scala.util.control.NonFatal(_) => null }
          if (img != null) {
            if (nDecoded == 0) { w = img.getWidth; h = img.getHeight }
            lumaAcc += ImageIoDecoder.lumaSum(img, img.getWidth, img.getHeight) /
              (img.getWidth.toDouble * img.getHeight)
            nDecoded += 1
          }
        }
        if (nDecoded == 0) return VideoStub.decode(id, bytes)
        val fps =
          if (scan.scale > 0 && scan.rate > 0) scan.rate.toDouble / scan.scale
          else if (scan.usPerFrame > 0) 1e6 / scan.usPerFrame
          else 0.0
        VideoFeatures(id, w, h, nDecoded, fps, lumaAcc / nDecoded, decoded = true)
      } catch {
        // a malformed container (lying chunk sizes, truncated headers)
        // must degrade to the stub, upholding the VideoDecoder contract
        // that decode() never throws on a bad payload
        case scala.util.control.NonFatal(_) => VideoStub.decode(id, bytes)
      }
    }
  }

  /** REAL uncompressed-video decoding with the JDK alone: Y4M
    * (YUV4MPEG2) is a plain-text header —
    * `YUV4MPEG2 W<w> H<h> F<num>:<den> [C<colorspace>] …\n` — followed
    * by `FRAME…\n` markers each carrying one raw planar YUV picture, so
    * "decoding" is arithmetic, no codec. The Y plane IS luma: per-frame
    * mean luma is the byte average of the first w·h plane bytes, fps is
    * the header's exact rational. Plane sizes per colorspace: C420*
    * w·h·3/2, C422 2·w·h, C444 3·w·h, Cmono w·h.
    *
    * Degrade-don't-kill ([[AviMjpegDecoder]] convention): a payload
    * without the magic, an unparsable header, or zero complete frames
    * falls back to [[VideoStub]]; a truncated trailing frame is dropped,
    * not fatal.
    *
    * FRAME-SAMPLE STRIDE: [[strided]] measures luma on every `stride`-th
    * frame only — and because the container is uncompressed, a skipped
    * frame is a genuine SEEK (`pos += frameSize`, zero plane bytes
    * touched), so the per-frame O(w·h) cost scales with sampled frames
    * while `nFrames`/fps still report the whole container (the marker
    * walk is O(1) per frame). The real 100 TB video pipeline shape:
    * feature-extract at a stride, never decode what you won't use. */
  object Y4mDecoder extends VideoDecoder {
    private val Magic = "YUV4MPEG2".getBytes(java.nio.charset.StandardCharsets.US_ASCII)

    /** Every-`stride`-th-frame decoder (frames 0, stride, 2·stride, …). */
    def strided(stride: Int): VideoDecoder = {
      require(stride >= 1, s"y4m stride=$stride")
      (id: Long, bytes: Array[Byte]) => decodeStrided(id, bytes, stride)
    }

    private def lineEnd(b: Array[Byte], from: Int): Int = {
      var i = from
      while (i < b.length && b(i) != 0x0a) i += 1
      i // index of \n, or b.length when unterminated
    }

    def decode(id: Long, bytes: Array[Byte]): VideoFeatures =
      decodeStrided(id, bytes, 1)

    private def decodeStrided(id: Long, bytes: Array[Byte],
                              stride: Int): VideoFeatures = {
      if (bytes == null || bytes.length < Magic.length ||
          !Magic.indices.forall(i => bytes(i) == Magic(i)))
        return VideoStub.decode(id, bytes)
      try {
        val hEnd = lineEnd(bytes, 0)
        if (hEnd >= bytes.length) return VideoStub.decode(id, bytes)
        val header = new String(bytes, 0, hEnd,
          java.nio.charset.StandardCharsets.US_ASCII)
        var w = 0
        var h = 0
        var fpsNum = 0L
        var fpsDen = 0L
        var colorspace = "C420"
        header.split(' ').drop(1).foreach { tok =>
          if (tok.nonEmpty) tok.charAt(0) match {
            case 'W' => w = tok.substring(1).toInt
            case 'H' => h = tok.substring(1).toInt
            case 'F' =>
              val nd = tok.substring(1).split(':')
              if (nd.length == 2) { fpsNum = nd(0).toLong; fpsDen = nd(1).toLong }
            case 'C' => colorspace = tok
            case _ => // I (interlace), A (aspect), X (extension): irrelevant here
          }
        }
        if (w <= 0 || h <= 0) return VideoStub.decode(id, bytes)
        val ySize = w * h
        val frameSize: Long = colorspace match {
          case c if c.startsWith("C420") => ySize + 2L * ((w / 2) * (h / 2))
          case c if c.startsWith("C422") => ySize + 2L * ((w / 2) * h)
          case c if c.startsWith("C444") => 3L * ySize
          case c if c.startsWith("Cmono") => ySize.toLong
          case _ => return VideoStub.decode(id, bytes)
        }
        var pos = hEnd + 1
        var nFrames = 0
        var nSampled = 0
        var lumaAcc = 0.0
        while (pos + 5 <= bytes.length &&
               new String(bytes, pos, 5,
                 java.nio.charset.StandardCharsets.US_ASCII) == "FRAME") {
          val fEnd = lineEnd(bytes, pos)
          val dataStart = fEnd + 1
          if (fEnd >= bytes.length || dataStart + frameSize > bytes.length) {
            pos = bytes.length // truncated trailing frame: keep what we have
          } else {
            if (nFrames % stride == 0) { // sampled frame: touch its Y plane
              var sum = 0L
              var i = dataStart
              val yEnd = dataStart + ySize
              while (i < yEnd) { sum += bytes(i) & 0xff; i += 1 }
              lumaAcc += sum.toDouble / ySize
              nSampled += 1
            } // else: pure seek — no plane byte read
            nFrames += 1
            pos = (dataStart + frameSize).toInt
          }
        }
        if (nFrames == 0 || nSampled == 0) return VideoStub.decode(id, bytes)
        val fps = if (fpsNum > 0 && fpsDen > 0) fpsNum.toDouble / fpsDen else 0.0
        VideoFeatures(id, w, h, nFrames, fps, lumaAcc / nSampled, decoded = true)
      } catch {
        // malformed header numerals etc. — the VideoDecoder contract says
        // degrade to the stub, never throw on a bad payload
        case scala.util.control.NonFatal(_) => VideoStub.decode(id, bytes)
      }
    }
  }

  /** REAL animated-GIF decoding with the JDK alone: `javax.imageio`'s
    * GIF reader yields every frame, and each frame's
    * GraphicsControlExtension carries its display delay (centiseconds) —
    * fps = frames / Σdelay. Per-frame BT.601 luma rides the shared
    * [[ImageIoDecoder.lumaSum]]. Frames are measured AS DELIVERED by the
    * reader: a GIF whose later frames are sub-rect patches over the
    * previous canvas is not composited here (declared limit — full
    * disposal-method compositing is a renderer concern, not a feature
    * extractor's; generated/screen-capture GIFs are full-frame).
    * Degrade-don't-kill like every decoder: non-GIF magic, zero frames,
    * or a reader error falls back to [[VideoStub]]. */
  object GifDecoder extends VideoDecoder {

    /** Every-`stride`-th-frame decoder: full pixel decode + luma only for
      * frames 0, stride, 2·stride, …; skipped frames pay the (cheap)
      * metadata read alone, so the per-frame delay sum — and with it fps
      * and `nFrames` — still covers the whole animation. */
    def strided(stride: Int): VideoDecoder = {
      require(stride >= 1, s"gif stride=$stride")
      (id: Long, bytes: Array[Byte]) => decodeStrided(id, bytes, stride)
    }

    def decode(id: Long, bytes: Array[Byte]): VideoFeatures =
      decodeStrided(id, bytes, 1)

    private def decodeStrided(id: Long, bytes: Array[Byte],
                              stride: Int): VideoFeatures = {
      if (bytes == null || bytes.length < 6 ||
          !(bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F'))
        return VideoStub.decode(id, bytes)
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) return VideoStub.decode(id, bytes)
        val reader = readers.next()
        try {
          reader.setInput(iis, false, false)
          val n = reader.getNumImages(true)
          if (n <= 0) return VideoStub.decode(id, bytes)
          var w = 0; var h = 0
          var nFrames = 0
          var nSampled = 0
          var lumaAcc = 0.0
          var delayCs = 0L
          var i = 0
          while (i < n) {
            // an individually corrupt frame is skipped, not fatal (the
            // AviMjpegDecoder convention)
            try {
              if (i % stride == 0) {
                val img = reader.read(i)
                // compute BOTH per-frame reads into locals before
                // committing any accumulator — a metadata IOException
                // after a committed luma would otherwise skew avg luma
                // for partially-corrupt GIFs
                val luma = ImageIoDecoder.lumaSum(img, img.getWidth, img.getHeight) /
                  (img.getWidth.toDouble * img.getHeight)
                val delay = frameDelayCs(reader, i)
                if (nSampled == 0) { w = img.getWidth; h = img.getHeight }
                lumaAcc += luma
                nSampled += 1
                delayCs += delay
                nFrames += 1
              } else { // skipped frame: metadata only, still counted for fps
                delayCs += frameDelayCs(reader, i)
                nFrames += 1
              }
            } catch { case _: java.io.IOException => }
            i += 1
          }
          if (nSampled == 0) return VideoStub.decode(id, bytes)
          val fps =
            if (delayCs > 0) nFrames / (delayCs / 100.0) else 0.0
          VideoFeatures(id, w, h, nFrames, fps, lumaAcc / nSampled, decoded = true)
        } finally reader.dispose()
      } catch {
        case scala.util.control.NonFatal(_) => VideoStub.decode(id, bytes)
      } finally iis.close()
    }

    /** The frame's GraphicsControlExtension delay in centiseconds (0 when
      * absent — some writers omit it on single-frame GIFs). */
    private def frameDelayCs(reader: javax.imageio.ImageReader, i: Int): Long = {
      val md = reader.getImageMetadata(i)
      val root = md.getAsTree("javax_imageio_gif_image_1.0")
      val kids = root.getChildNodes
      var k = 0
      while (k < kids.getLength) {
        val node = kids.item(k)
        if (node.getNodeName == "GraphicControlExtension") {
          val attr = node.getAttributes.getNamedItem("delayTime")
          if (attr != null) return attr.getNodeValue.toLong
        }
        k += 1
      }
      0L
    }
  }

  /** Container sniffer: routes each payload to the decoder its magic
    * bytes identify (RIFF-AVI → MJPEG, YUV4MPEG2 → Y4M, GIF8 → GIF,
    * else stub), so a mixed video column decodes in one pass. */
  object SniffingVideoDecoder extends VideoDecoder {
    def decode(id: Long, bytes: Array[Byte]): VideoFeatures =
      if (bytes != null && bytes.length >= 12 &&
          new String(bytes, 0, 4, java.nio.charset.StandardCharsets.US_ASCII) == "RIFF")
        AviMjpegDecoder.decode(id, bytes)
      else if (bytes != null && bytes.length >= 9 &&
          new String(bytes, 0, 9, java.nio.charset.StandardCharsets.US_ASCII) == "YUV4MPEG2")
        Y4mDecoder.decode(id, bytes)
      else if (bytes != null && bytes.length >= 6 &&
          new String(bytes, 0, 4, java.nio.charset.StandardCharsets.US_ASCII) == "GIF8")
        GifDecoder.decode(id, bytes)
      else VideoStub.decode(id, bytes)
  }

  /** Batched video decode over (id, binary) rows — the `mapPartitions`
    * twin of [[decodeFeatures]] for the video seam. */
  def decodeVideo(df: DataFrame, idCol: String, binCol: String,
                  decoder: VideoDecoder = AviMjpegDecoder): Dataset[VideoFeatures] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .mapPartitions { it: Iterator[Row] =>
        it.map { r =>
          decoder.decode(r.getLong(0),
            if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1))
        }
      }
  }

  /** Batched audio decode over (id, binary) rows — the `mapPartitions`
    * twin of [[decodeFeatures]] for the audio seam. */
  def decodeAudio(df: DataFrame, idCol: String, binCol: String,
                  decoder: AudioDecoder = WavDecoder): Dataset[AudioFeatures] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .mapPartitions { it: Iterator[Row] =>
        it.map { r =>
          decoder.decode(r.getLong(0),
            if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1))
        }
      }
  }

  /** Frame-sample plumbing: expand n frames per media row (explode of a
    * generated index — the real implementation would substitute decoded
    * frame tensors for the index). */
  def sampleFrames(features: Dataset[MediaFeatures], everyNth: Int): DataFrame = {
    features.toDF()
      .withColumn("frame_idx",
        explode(sequence(lit(0), col("nFrames") - 1)))
      .where(col("frame_idx") % everyNth === 0)
  }

  /** The video twin of [[sampleFrames]], matched to the strided decoders:
    * one row per SAMPLED frame index (0, n, 2n, … — exactly the frames
    * [[Y4mDecoder.strided]]/[[GifDecoder.strided]] measured), so the
    * per-frame fan-out downstream of a strided decode names the frames
    * the decode actually touched. */
  def sampleVideoFrames(features: Dataset[VideoFeatures], everyNth: Int): DataFrame = {
    require(everyNth >= 1, s"sampleVideoFrames: everyNth=$everyNth")
    features.toDF()
      .withColumn("frame_idx",
        explode(sequence(lit(0), col("nFrames") - 1)))
      .where(col("frame_idx") % everyNth === 0)
  }

  /** Resize plumbing: aspect-preserving fit into a target box — the
    * per-item geometry a real resizer needs, computed map-side from the
    * decoded dims (the real implementation would also carry the resized
    * tensor; the arithmetic and schema are the contract). */
  def resizePlan(features: Dataset[MediaFeatures], maxW: Int, maxH: Int): DataFrame =
    resizePlanOf(features.toDF(), maxW, maxH)

  /** [[resizePlan]] for decoded video: same geometry over
    * [[VideoFeatures]] dims — compose with [[sampleVideoFrames]] for the
    * per-sampled-frame resize plan a training pipeline feeds its (stub)
    * tensor stage. */
  def resizePlanVideo(features: Dataset[VideoFeatures], maxW: Int, maxH: Int): DataFrame =
    resizePlanOf(features.toDF(), maxW, maxH)

  private def resizePlanOf(df: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    val scale = least(lit(maxW).cast("double") / col("width"),
                      lit(maxH).cast("double") / col("height"), lit(1.0))
    df.withColumn("scale", scale)
      .withColumn("out_w", greatest(floor(col("width") * col("scale")), lit(1)).cast("int"))
      .withColumn("out_h", greatest(floor(col("height") * col("scale")), lit(1)).cast("int"))
  }

  /** The encoder boundary, mirroring [[MediaDecoder]]: a real vision/audio
    * encoder (ONNX runtime, a JNI tower — none on this classpath) plugs in
    * here; it runs executor-side inside `mapPartitions`, so implementations
    * must be serializable, must emit exactly `dim` floats, and must never
    * throw on a bad payload. */
  trait Embedder extends Serializable {
    def dim: Int
    def embed(id: Long, bytes: Array[Byte]): Array[Float]
  }

  /** Deterministic fake encoder: the md5-tiled pseudo-embedding of
    * [[embedStub]], row-at-a-time — stable across runs and engines, so
    * fixtures survive re-generation. */
  final case class EmbedStub(dim: Int) extends Embedder {
    require(dim >= 1 && dim <= 1024, s"dim=$dim out of [1,1024]")
    def embed(id: Long, bytes: Array[Byte]): Array[Float] = {
      val out = new Array[Float](dim)
      val digests = (0 to (dim - 1) / 16).map { tile =>
        val md = java.security.MessageDigest.getInstance("MD5")
        md.update(s"$tile:".getBytes("UTF-8"))
        md.digest(if (bytes == null) Array.emptyByteArray else bytes)
      }
      var i = 0
      while (i < dim) {
        out(i) = (((digests(i / 16)(i % 16) & 0xff) - 128) / 128.0).toFloat
        i += 1
      }
      out
    }
  }

  /** Batched binary → embedding over (id, binary) rows, streamed per
    * partition through the pluggable [[Embedder]] — the output column plugs
    * straight into the similarity operators ([[Similarity.bruteForceTopK]],
    * [[Ivf.topK]]), which is the point: the binary → embedding → ANN
    * pipeline is runnable end-to-end with only the encoder swapped. */
  def embedFeatures(df: DataFrame, idCol: String, binCol: String,
                    embedder: Embedder): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .mapPartitions { it: Iterator[Row] =>
        it.map { r =>
          (r.getLong(0), embedder.embed(r.getLong(0),
            if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)))
        }
      }
      .toDF(idCol, "embedding")
  }

  /** Feature-extract stub: a deterministic pseudo-embedding per payload —
    * the `array<float>` a vision/audio encoder would emit, derived from
    * md5(content) bytes so it is stable across runs and engines. Pure
    * column expressions (codegen'd); [[EmbedStub]] computes the SAME values
    * through the [[Embedder]] seam. */
  def embedStub(df: DataFrame, idCol: String, binCol: String, dim: Int): DataFrame = {
    require(dim >= 1 && dim <= 1024, s"dim=$dim out of [1,1024]")
    // md5 gives 16 bytes; tile it across `dim` with a per-tile salt,
    // mapping each hex pair to a float in [-1, 1). NULL payloads embed as
    // empty payloads (coalesce) — matching EmbedStub, which digests the
    // salt over zero content bytes, so the two paths stay value-identical
    // on every input.
    val hexes = (0 until dim).map { i =>
      val h = md5(concat(lit(i / 16 + ":"),
        coalesce(col(binCol), lit(Array.emptyByteArray))))
      val pair = substring(h, (i % 16) * 2 + 1, 2)
      ((conv(pair, 16, 10).cast("int") - lit(128)) / lit(128.0)).cast("float")
    }
    df.select(col(idCol), array(hexes: _*).as("embedding"))
  }
}
