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
        var sum = 0.0
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            sum += 0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
              0.114 * (rgb & 0xff)
            x += 1
          }
          y += 1
        }
        MediaFeatures(id, w, h, nFrames = 1, meanLuma = sum / (w.toDouble * h))
      }
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

  /** Frame-sample plumbing: expand n frames per media row (explode of a
    * generated index — the real implementation would substitute decoded
    * frame tensors for the index). */
  def sampleFrames(features: Dataset[MediaFeatures], everyNth: Int): DataFrame = {
    features.toDF()
      .withColumn("frame_idx",
        explode(sequence(lit(0), col("nFrames") - 1)))
      .where(col("frame_idx") % everyNth === 0)
  }

  /** Resize plumbing: aspect-preserving fit into a target box — the
    * per-item geometry a real resizer needs, computed map-side from the
    * decoded dims (the real implementation would also carry the resized
    * tensor; the arithmetic and schema are the contract). */
  def resizePlan(features: Dataset[MediaFeatures], maxW: Int, maxH: Int): DataFrame = {
    val scale = least(lit(maxW).cast("double") / col("width"),
                      lit(maxH).cast("double") / col("height"), lit(1.0))
    features.toDF()
      .withColumn("scale", scale)
      .withColumn("out_w", greatest(floor(col("width") * col("scale")), lit(1)).cast("int"))
      .withColumn("out_h", greatest(floor(col("height") * col("scale")), lit(1)).cast("int"))
  }

  /** Feature-extract stub: a deterministic pseudo-embedding per payload —
    * the `array<float>` a vision/audio encoder would emit, derived from
    * md5(content) bytes so it is stable across runs and engines. Plugs
    * straight into the similarity operators ([[Similarity.bruteForceTopK]],
    * [[Ivf.topK]]), which is the point: the binary → embedding → ANN
    * pipeline is runnable end-to-end with only the encoder stubbed. */
  def embedStub(df: DataFrame, idCol: String, binCol: String, dim: Int): DataFrame = {
    require(dim >= 1 && dim <= 1024, s"dim=$dim out of [1,1024]")
    // md5 gives 16 bytes; tile it across `dim` with a per-tile salt,
    // mapping each hex pair to a float in [-1, 1)
    val hexes = (0 until dim).map { i =>
      val h = md5(concat(lit(i / 16 + ":"), col(binCol)))
      val pair = substring(h, (i % 16) * 2 + 1, 2)
      ((conv(pair, 16, 10).cast("int") - lit(128)) / lit(128.0)).cast("float")
    }
    df.select(col(idCol), array(hexes: _*).as("embedding"))
  }
}
