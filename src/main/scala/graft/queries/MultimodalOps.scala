package graft.queries

import graft.QueryDef
import graft.functions.GraftFunctions._
import graft.functions.GraftHash
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: opaque binary payloads + typed metadata.
  *
  * The container has no image/audio codecs, so decoding is a clearly-marked
  * deterministic STUB (`DecodeStub`): the Spark-side shape — binary column,
  * partition-wise batch iteration via mapPartitions on a typed schema, stable
  * output schema — is real and tested; only the pixel/sample math is fake.
  * At 100 TB the binary column rides in parquet alongside metadata; decode is
  * narrow per-partition work with no shuffle.
  */
object MultimodalOps {
  import RelationalSupport.t

  /** Deterministic fake "decode" of a binary asset: all fields are pure
    * functions of the md5-derived hash60 of the payload, so results are
    * reproducible in the oracle. A real deployment swaps this for a codec
    * (e.g. JNI/ffmpeg) without touching the Spark plumbing around it.
    */
  object DecodeStub {
    def mime(h: Long): String = (h % 3) match {
      case 0 => "image"
      case 1 => "audio"
      case _ => "video"
    }
    def decode(payload: Array[Byte]): (String, Long, Long, Long) = {
      val h = GraftHash.hash60(payload)
      val m = mime(h)
      val frames = m match {
        case "image" => 1L
        case "audio" => 0L
        case _       => h % 240
      }
      (m, h % 1280, h % 720, frames)
    }
  }

  private val decodeSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("mime", StringType, nullable = false),
    StructField("width", LongType, nullable = false),
    StructField("height", LongType, nullable = false),
    StructField("n_frames", LongType, nullable = false)))

  val defs: Seq[QueryDef] = Seq(
    // binary-column metadata aggregation (expression-only path).
    QueryDef("q24_mm_bytes", (s, dir) => {
      val h = graftHash(col("text"))
      t(s, dir, "documents")
        .select(col("source"), encode(col("text"), "UTF-8").as("payload"), h.as("h"))
        .groupBy("source")
        .agg(
          count(lit(1)).as("n_assets"),
          sum(length(col("payload")).cast("long")).as("total_bytes"),
          r4(avg(col("h") % 1280)).as("avg_width"))
        .orderBy("source")
    }, Some(
      """SELECT source, count(*) AS n_assets,
        |  CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
        |  round(avg(CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT) % 1280), 4) AS avg_width
        |FROM documents GROUP BY source ORDER BY source""".stripMargin)),

    // partition-wise batch decode through the stub (mapPartitions plumbing).
    QueryDef("q46_mm_decode", (s, dir) => {
      val src = t(s, dir, "documents")
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      graft.operators.Multimodal.decodeAssets(src, "doc_id", "payload")
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    }, Some(
      """WITH h AS (SELECT doc_id, CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT) AS h FROM documents)
        |SELECT doc_id,
        |  CASE h % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS mime,
        |  h % 1280 AS width, h % 720 AS height,
        |  CASE h % 3 WHEN 0 THEN 1 WHEN 1 THEN 0 ELSE h % 240 END AS n_frames
        |FROM h ORDER BY doc_id""".stripMargin)),

    // frame sampling: up to 3 evenly spaced frame indices per asset, the
    // fan-out shape of a frame-extraction pipeline (explode over indices).
    QueryDef("q66_mm_frames", (s, dir) => {
      val src = t(s, dir, "documents")
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      val decoded = graft.operators.Multimodal.decodeAssets(src, "doc_id", "payload")
      graft.operators.Multimodal.sampleFrames(decoded, maxFrames = 3)
        .groupBy("mime")
        .agg(count(lit(1)).as("n_sampled"), sum("frame_idx").as("idx_sum"))
        .orderBy("mime")
    }, Some(
      """WITH h AS (SELECT doc_id, CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT) AS h FROM documents),
        |d AS (SELECT doc_id,
        |  CASE h % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS mime,
        |  CASE h % 3 WHEN 0 THEN 1 WHEN 1 THEN 0 ELSE h % 240 END AS nf FROM h),
        |fr AS (SELECT doc_id, mime, unnest(
        |    CASE WHEN mime = 'image' THEN [CAST(0 AS BIGINT)]
        |         WHEN mime = 'video' AND nf > 0 THEN
        |           list_distinct(list_transform(generate_series(0, 2), i -> (i * greatest(nf, 1)) // 3))
        |         ELSE [] END) AS frame_idx FROM d)
        |SELECT mime, count(*) AS n_sampled, CAST(sum(frame_idx) AS BIGINT) AS idx_sum
        |FROM fr GROUP BY mime ORDER BY mime""".stripMargin)),

    // feature-extract -> similarity pipeline: stub embeddings from binary
    // payloads feed the same top-k search as real model features would.
    QueryDef("q69_mm_embed_knn", (s, dir) => {
      val src = t(s, dir, "documents")
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      val emb = graft.operators.Multimodal.extractFeatures(src, "doc_id", "payload", dim = 8)
      val q = emb.filter(col("doc_id") < 3)
        .select(col("doc_id").as("query_id"), col("features").as("qv"))
      graft.operators.Similarity.cosineTopK(emb, q, "doc_id", "features", k = 5)
        .orderBy("query_id", "rk")
    }, Some {
      val feat = """list_transform(generate_series(0, 7), d ->
        |    (CAST(('0x' || substr(md5(text || ':' || CAST(d AS VARCHAR)), 1, 15)) AS BIGINT) % 1000) / 1000.0)""".stripMargin
      s"""WITH f AS (SELECT doc_id, CAST($feat AS DOUBLE[]) v FROM documents),
         |q AS (SELECT doc_id AS query_id, v AS qv FROM f WHERE doc_id < 3),
         |s AS (SELECT query_id, doc_id, ${SimilarityOps.duckCos("qv", "v")} AS sim
         |  FROM q, f WHERE doc_id != query_id),
         |r AS (SELECT query_id, doc_id, sim,
         |  row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, doc_id) rn FROM s)
         |SELECT query_id, CAST(rn AS INTEGER) AS rk, doc_id AS neighbor_id, sim
         |FROM r WHERE rn <= 5 ORDER BY query_id, rk""".stripMargin
    }),

    // deterministic resize-to-bounding-box metadata (aspect preserved)
    QueryDef("q67_mm_resize", (s, dir) => {
      val src = t(s, dir, "documents")
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      val decoded = graft.operators.Multimodal.decodeAssets(src, "doc_id", "payload")
      graft.operators.Multimodal.resizeMeta(decoded, maxDim = 256)
        .groupBy("mime")
        .agg(count(lit(1)).as("n"), r4(avg("out_w")).as("avg_w"), r4(avg("out_h")).as("avg_h"))
        .orderBy("mime")
    }, Some(
      """WITH h AS (SELECT doc_id, CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT) AS h FROM documents),
        |d AS (SELECT doc_id,
        |  CASE h % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS mime,
        |  h % 1280 AS w, h % 720 AS ht FROM h),
        |r AS (SELECT doc_id, mime,
        |  (w * least(256, greatest(w, ht, 1))) // greatest(w, ht, 1) AS out_w,
        |  (ht * least(256, greatest(w, ht, 1))) // greatest(w, ht, 1) AS out_h FROM d)
        |SELECT mime, count(*) AS n, round(avg(out_w), 4) AS avg_w, round(avg(out_h), 4) AS avg_h
        |FROM r GROUP BY mime ORDER BY mime""".stripMargin)),

    // REAL image decode: deterministic PNG/JPEG fixture bytes (known
    // dimensions, generated driver-side) decoded distributed through
    // javax.imageio header reads — the oracle is the fixture spec itself.
    // Corrupt/non-image payload handling is spec-covered (OperatorsSpec);
    // here every payload is a genuine encoded image.
    QueryDef("q131_mm_real_decode", (s, dir) => {
      import s.implicits._
      val rows = (0 until 24).map { i =>
        val fmt = if (i % 2 == 0) "png" else "jpeg"
        (i.toLong, graft.operators.ImageDecode.fixtureBytes(16 + i, 8 + i, fmt))
      }
      val df = rows.toDF("doc_id", "payload").repartition(4)
      graft.operators.Multimodal.decodeAssets(df, "doc_id", "payload")
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    }, Some {
      val vals = (0 until 24).map(i => s"($i, 'image', ${16 + i}, ${8 + i}, 1)").mkString(", ")
      s"""SELECT CAST(doc_id AS BIGINT) AS doc_id, mime,
         |  CAST(width AS BIGINT) AS width, CAST(height AS BIGINT) AS height,
         |  CAST(n_frames AS BIGINT) AS n_frames
         |FROM (VALUES $vals) AS t(doc_id, mime, width, height, n_frames)
         |ORDER BY doc_id""".stripMargin
    }),

    // REAL audio/video header decode: genuine WAV (RIFF/fmt/data) and MP4
    // (ftyp/moov/mvhd/tkhd/stsz) container bytes with known parameters,
    // decoded distributed through the dependency-free header parsers
    // (operators.AvDecode) — plus deliberately-corrupt variants (truncated
    // after the magic) asserting the corrupt-safe fallback INSIDE the
    // oracle, not just in a spec. Oracle is the fixture spec itself.
    QueryDef("q143_mm_av_decode", (s, dir) => {
      import s.implicits._
      import graft.operators.AvDecode
      val rows: Seq[(Long, Array[Byte])] = (0 until 8).map { i =>
        (i.toLong, AvDecode.wavFixture(1 + i % 2, 8000 * (1 + i % 3), 4000 * (i + 1)))
      } ++ (8 until 16).map { i =>
        (i.toLong, AvDecode.mp4Fixture(1000L * (i - 7), 600, 320 + 16 * i, 240 + 8 * i, 24L * (i - 7)))
      } ++ Seq(
        (16L, graft.operators.ImageDecode.fixtureBytes(64, 32, "png")),
        // corrupt: valid magics, truncated bodies — must decode as unknown
        (17L, AvDecode.wavFixture(2, 44100, 1000).take(20)),
        (18L, AvDecode.mp4Fixture(5000, 600, 640, 480, 120).take(24)),
        (19L, "not media at all".getBytes("UTF-8")))
      val df = rows.toDF("doc_id", "payload").repartition(4)
      graft.operators.Multimodal.decodeAvMeta(df, "doc_id", "payload")
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    }, Some {
      val wavVals = (0 until 8).map { i =>
        val ch = 1 + i % 2; val sr = 8000 * (1 + i % 3); val n = 4000 * (i + 1)
        val durMs = n.toLong * 1000 / sr // dataSize*1000/byteRate = nSamples*1000/sampleRate
        s"($i, 'audio', $durMs, $ch, $sr, 0, 0, 0)"
      }
      val mp4Vals = (8 until 16).map { i =>
        s"($i, 'video', ${1000L * (i - 7)}, 0, 0, ${320 + 16 * i}, ${240 + 8 * i}, ${24L * (i - 7)})"
      }
      val rest = Seq(
        "(16, 'image', 0, 0, 0, 64, 32, 1)",
        "(17, 'unknown', 0, 0, 0, 0, 0, 0)",
        "(18, 'unknown', 0, 0, 0, 0, 0, 0)",
        "(19, 'unknown', 0, 0, 0, 0, 0, 0)")
      val vals = (wavVals ++ mp4Vals ++ rest).mkString(", ")
      s"""SELECT CAST(doc_id AS BIGINT) AS doc_id, mime,
         |  CAST(duration_ms AS BIGINT) AS duration_ms,
         |  CAST(channels AS BIGINT) AS channels,
         |  CAST(sample_rate AS BIGINT) AS sample_rate,
         |  CAST(width AS BIGINT) AS width, CAST(height AS BIGINT) AS height,
         |  CAST(n_frames AS BIGINT) AS n_frames
         |FROM (VALUES $vals) AS t(doc_id, mime, duration_ms, channels, sample_rate, width, height, n_frames)
         |ORDER BY doc_id""".stripMargin
    })
  )
}
