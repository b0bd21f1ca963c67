package graft.operators

import graft.queries.MultimodalOps.DecodeStub
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column operators: opaque binary payloads + typed metadata.
  * IMAGE payloads decode for real through [[ImageDecode]] (JDK-native
  * `javax.imageio`, header-only — no pixel decode); WAV audio and MP4
  * video decode for real through the dependency-free container-header
  * parsers in [[AvDecode]]. Payloads that are none of these fall back to
  * the clearly-marked deterministic [[DecodeStub]] (sample/pixel DATA is
  * never decoded — this container has no av codecs, and a metadata pass
  * doesn't need them). Everything around the kernels — binary columns,
  * partition-wise batch iteration, stable schemas, frame-index explosion —
  * is the real Spark plumbing any codec drops into.
  */
object Multimodal {

  private val decodeSchema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("mime", StringType, nullable = false),
    StructField("width", LongType, nullable = false),
    StructField("height", LongType, nullable = false),
    StructField("n_frames", LongType, nullable = false)))

  /** Partition-wise batch decode of (id, payload binary) rows: real
    * header-only decode where the payload IS a recognized container —
    * images via strict magic sniff + `javax.imageio` ([[ImageDecode]]),
    * WAV audio and MP4 video via the dependency-free header parsers in
    * [[AvDecode]] — deterministic stub for everything else. Corrupt bytes
    * with a valid magic (truncated header) fall through to the stub instead
    * of failing the task — at 100 TB some payloads WILL be truncated, and a
    * poison row must not kill the pipeline.
    */
  def decodeAssets(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val src = df.select(col(idCol).cast("long"), col(payloadCol))
    src.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](1)
        val (m, w, h, f) = ImageDecode.dimensions(payload) match {
          case Some((_, iw, ih)) => ("image", iw.toLong, ih.toLong, 1L)
          case None => AvDecode.wavInfo(payload) match {
            case Some(_) => ("audio", 0L, 0L, 0L)
            case None => AvDecode.mp4Info(payload) match {
              case Some(v) => ("video", v.width.toLong, v.height.toLong, v.nSamples)
              case None    => DecodeStub.decode(payload)
            }
          }
        }
        Row(r.getLong(0), m, w, h, f)
      }
    }(Encoders.row(decodeSchema))
  }

  private val avMetaSchema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("mime", StringType, nullable = false),
    StructField("duration_ms", LongType, nullable = false),
    StructField("channels", LongType, nullable = false),
    StructField("sample_rate", LongType, nullable = false),
    StructField("width", LongType, nullable = false),
    StructField("height", LongType, nullable = false),
    StructField("n_frames", LongType, nullable = false)))

  /** Full audio/video metadata decode (header-only, corrupt-safe): WAV →
    * duration/channels/sample-rate, MP4 → duration/dimensions/frame-count,
    * image → dimensions, anything unrecognized (including corrupt
    * magic-matching bytes) → mime `unknown` with zeroed fields. Narrow
    * per-partition work, no shuffle — the 100 TB metadata-pass shape.
    */
  def decodeAvMeta(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val src = df.select(col(idCol).cast("long"), col(payloadCol))
    src.mapPartitions { rows =>
      rows.map { r =>
        val p = r.getAs[Array[Byte]](1)
        val out = AvDecode.wavInfo(p) match {
          case Some(a) => ("audio", a.durationMs, a.channels.toLong, a.sampleRate.toLong, 0L, 0L, 0L)
          case None => AvDecode.mp4Info(p) match {
            case Some(v) => ("video", v.durationMs, 0L, 0L, v.width.toLong, v.height.toLong, v.nSamples)
            case None => ImageDecode.dimensions(p) match {
              case Some((_, iw, ih)) => ("image", 0L, 0L, 0L, iw.toLong, ih.toLong, 1L)
              case None              => ("unknown", 0L, 0L, 0L, 0L, 0L, 0L)
            }
          }
        }
        Row(r.getLong(0), out._1, out._2, out._3, out._4, out._5, out._6, out._7)
      }
    }(Encoders.row(avMetaSchema))
  }

  /** Sample up to `maxFrames` evenly spaced frame indices per video asset:
    * (id, frame_idx). Images contribute frame 0; audio contributes nothing.
    * The explode is the real fan-out shape of a frame-extraction pipeline.
    */
  def sampleFrames(decoded: DataFrame, maxFrames: Int = 3): DataFrame = {
    val n = col("n_frames")
    val idxs = when(col("mime") === "image", array(lit(0L)))
      .when(col("mime") === "video" && n > 0,
        array_distinct(transform(sequence(lit(0), lit(maxFrames - 1)),
          i => (i * greatest(n, lit(1L)) / lit(maxFrames)).cast("long"))))
      .otherwise(array().cast("array<bigint>"))
    decoded.select(col("id"), col("mime"), explode(idxs).as("frame_idx"))
  }

  /** Feature extraction stub: a deterministic dim-`dim` embedding derived
    * from the payload via the portable hash (component d =
    * (hash60(utf8(payload) ++ ":" ++ d) mod 1000) / 1000). A real model
    * (CLIP, wav2vec, …) drops into the same (binary → array<double>) shape;
    * the output feeds [[Similarity]] unchanged.
    */
  def extractFeatures(df: DataFrame, idCol: String, payloadCol: String, dim: Int = 8): DataFrame = {
    import graft.functions.GraftFunctions.graftHash
    val text = decode(col(payloadCol), "UTF-8")
    val vec = transform(sequence(lit(0), lit(dim - 1)),
      d => (graftHash(concat(text, lit(":"), d.cast("string"))) % 1000).cast("double") / 1000.0)
    df.select(col(idCol), vec.as("features"))
  }

  /** Deterministic "resize" metadata: scale width/height to fit a bounding
    * box, preserving aspect ratio (integer math, portable to the oracle).
    */
  def resizeMeta(decoded: DataFrame, maxDim: Long): DataFrame = {
    val longest = greatest(col("width"), col("height"), lit(1L))
    val scaleNum = least(lit(maxDim), longest)
    decoded.select(col("id"), col("mime"),
      (col("width") * scaleNum / longest).cast("long").as("out_w"),
      (col("height") * scaleNum / longest).cast("long").as("out_h"))
  }
}

/** Real image decode, JDK-native (`javax.imageio`) and header-only: the
  * registered reader for the payload's format reads width/height from the
  * container header without decoding pixels — O(bytes-sniffed), not
  * O(pixels), which is what a 100 TB metadata pass needs. Restricted by a
  * STRICT magic-number sniff to PNG/JPEG/GIF: ImageIO's own reader probing
  * is permissive (WBMP accepts many byte strings, BMP keys on ASCII "BM"),
  * and a text payload mis-sniffed as an image would silently change every
  * non-image decode result.
  */
object ImageDecode {
  javax.imageio.ImageIO.setUseCache(false) // no tmp-file cache on executors

  private def looksLikeImage(p: Array[Byte]): Boolean =
    p != null && p.length >= 4 && (
      (p(0) == 0x89.toByte && p(1) == 'P'.toByte && p(2) == 'N'.toByte && p(3) == 'G'.toByte) ||
      (p(0) == 0xFF.toByte && p(1) == 0xD8.toByte) || // JPEG SOI
      (p(0) == 'G'.toByte && p(1) == 'I'.toByte && p(2) == 'F'.toByte && p(3) == '8'.toByte))

  /** `(format, width, height)` for real image payloads; None for
    * non-images AND for corrupt image bytes (robustness contract).
    */
  def dimensions(payload: Array[Byte]): Option[(String, Int, Int)] = {
    if (!looksLikeImage(payload)) return None
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(payload))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) return None
      val reader = readers.next()
      try {
        reader.setInput(iis, true, true)
        Some((reader.getFormatName.toLowerCase, reader.getWidth(0), reader.getHeight(0)))
      } catch {
        case scala.util.control.NonFatal(_) => None // truncated/corrupt header
      } finally reader.dispose()
    } finally iis.close()
  }

  /** Deterministic PNG/JPEG fixture bytes (for specs and the oracle
    * entry): a real encoded image of the given size.
    */
  def fixtureBytes(width: Int, height: Int, format: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { img.setRGB(x, y, (x * 31 + y * 17) & 0xFFFFFF); x += 1 }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(img, format, out), s"no $format writer")
    out.toByteArray
  }
}
