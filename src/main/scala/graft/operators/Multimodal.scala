package graft.operators

import graft.queries.MultimodalOps.DecodeStub
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column operators: opaque binary payloads + typed metadata.
  * The decode kernel is the clearly-marked deterministic [[DecodeStub]]
  * (this container has no codecs); everything around it — binary columns,
  * partition-wise batch iteration, stable schemas, frame-index explosion —
  * is the real Spark plumbing a codec would drop into.
  */
object Multimodal {

  private val decodeSchema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("mime", StringType, nullable = false),
    StructField("width", LongType, nullable = false),
    StructField("height", LongType, nullable = false),
    StructField("n_frames", LongType, nullable = false)))

  /** Partition-wise batch decode of (id, payload binary) rows. */
  def decodeAssets(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val src = df.select(col(idCol).cast("long"), col(payloadCol))
    src.mapPartitions { rows =>
      rows.map { r =>
        val (m, w, h, f) = DecodeStub.decode(r.getAs[Array[Byte]](1))
        Row(r.getLong(0), m, w, h, f)
      }
    }(Encoders.row(decodeSchema))
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
