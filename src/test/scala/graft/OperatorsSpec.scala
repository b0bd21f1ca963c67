package graft

import graft.operators.{Similarity, Skew, SnapshotDiff}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Specs for the scale-path operators: salting must be result-identical to
  * the plain shapes; SRP-LSH must hit a useful recall against brute force.
  */
class OperatorsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("removeDuplicatedSpans cuts planted boilerplate, keeps unique text in order") {
    import spark.implicits._
    val boiler = "all rights reserved contact the site administrator"  // 7 tokens
    val docs = (0 until 20).map { i =>
      val unique = s"doc$i alpha$i bravo$i charlie$i delta$i echo$i"
      (i.toLong, if (i == 19) boiler else s"$unique $boiler tail$i omega$i")
    }.toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis
      .removeDuplicatedSpans(docs, "doc_id", "text", n = 5, maxDocs = 1)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3))).toMap

    // boilerplate-only doc empties but stays a row
    assert(out(19L) == (("", 7L, 7L)))
    for (i <- 0 until 19) {
      val (clean, nTok, nRem) = out(i.toLong)
      assert(nTok == 15L && nRem == 7L, s"doc $i: $nTok/$nRem")
      assert(clean == s"doc$i alpha$i bravo$i charlie$i delta$i echo$i tail$i omega$i",
        s"doc $i kept: $clean")
      assert(!clean.contains("rights"), s"doc $i still has boilerplate")
    }
  }

  test("salted join equals plain join") {
    val ev = Tables.load(spark, dir, "events").select("event_id", "user_id")
    val cust = Tables.load(spark, dir, "customer")
      .select(col("c_custkey").as("user_id"), col("c_name"))
    val plain = ev.join(cust, Seq("user_id"))
      .select("event_id", "user_id", "c_name")
    val salted = Skew.saltedJoin(ev, cust, "user_id")
      .select("event_id", "user_id", "c_name")
    assert(plain.exceptAll(salted).count() == 0)
    assert(salted.exceptAll(plain).count() == 0)
  }

  test("snapshot diff: inserts, deletes, updates, null-safe keys and values") {
    import spark.implicits._
    val before = Seq(
      (Some(1L), Some("a")), (Some(2L), Some("b")), (Some(3L), None: Option[String]),
      (None: Option[Long], Some("nullkey")))
      .toDF("id", "v")
    val after = Seq(
      (Some(1L), Some("a")),   // unchanged -> dropped
      (Some(2L), Some("B")),   // update
      (Some(3L), Some("c")),   // update from null value (null-safe compare)
      (None: Option[Long], Some("nullkey")), // null keys match null-safely -> unchanged
      (Some(9L), Some("new"))) // insert
      .toDF("id", "v")
    val got = SnapshotDiff.diff(before, after, Seq("id"))
      .collect().map(r => (Option(r.get(0)), Option(r.get(1)), r.getString(2))).toSet
    assert(got == Set(
      (Some(2L), Some("B"), "update"),
      (Some(3L), Some("c"), "update"),
      (Some(9L), Some("new"), "insert")))

    // delete shows the before-image
    val del = SnapshotDiff.diff(after, before, Seq("id"))
      .filter(col("change_type") === "delete")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(del == Set((9L, "new")))

    // value columns colliding with the internal presence markers must not
    // break the diff — "present0" exercises the fresh-name search loop,
    // not just the renamed base
    val bp = Seq((1L, true, "x")).toDF("id", "present0", "present1")
    val ap = Seq((1L, false, "x")).toDF("id", "present0", "present1")
    assert(SnapshotDiff.diff(bp, ap, Seq("id"))
      .collect().map(_.getString(3)).toSeq == Seq("update"))
  }

  test("change feed: successive generations emit their diffs") {
    import spark.implicits._
    val feed = new SnapshotDiff.ChangeFeed(Seq("id"))
    val g1 = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val g2 = Seq((1L, "a"), (2L, "B"), (3L, "c")).toDF("id", "v")
    val g3 = Seq((2L, "B"), (3L, "c")).toDF("id", "v")
    val d1 = feed.next(g1).collect().map(r => (r.getLong(0), r.getString(2))).toSet
    assert(d1 == Set((1L, "insert"), (2L, "insert")), "first generation is all inserts")
    val d2 = feed.next(g2).collect().map(r => (r.getLong(0), r.getString(2))).toSet
    assert(d2 == Set((2L, "update"), (3L, "insert")))
    val d3 = feed.next(g3).collect().map(r => (r.getLong(0), r.getString(2))).toSet
    assert(d3 == Set((1L, "delete")))
  }

  test("bloom-pruned join equals plain join and filters the fact side pre-join") {
    import graft.operators.BloomJoin
    val fact = Tables.load(spark, dir, "lineitem").select("l_orderkey", "l_extendedprice")
    val sel = Tables.load(spark, dir, "orders").filter(col("o_totalprice") > 400000)
      .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))
    val plain = fact.join(sel, Seq("l_orderkey"))
    val bloomed = BloomJoin.prunedJoin(fact, sel, "l_orderkey", expectedItems = 10000L)
    assert(plain.exceptAll(bloomed).count() == 0)
    assert(bloomed.exceptAll(plain).count() == 0)
    // the reduction is real: the might_contain filter sits below the join
    // and drops most fact rows before any shuffle
    val planStr = bloomed.queryExecution.executedPlan.toString()
    assert(planStr.contains("might_contain"), s"expected a bloom filter in the plan:\n$planStr")
    val factRows = fact.count()
    val survivors = fact.filter(org.apache.spark.sql.graft.ColumnBridge.column(
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        org.apache.spark.sql.catalyst.expressions.Literal(
          sel.select(org.apache.spark.sql.graft.ColumnBridge.column(
            new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
              org.apache.spark.sql.graft.ColumnBridge.expression(xxhash64(col("l_orderkey"))),
              10000L).toAggregateExpression())).head.getAs[Array[Byte]](0),
          org.apache.spark.sql.types.BinaryType),
        org.apache.spark.sql.graft.ColumnBridge.expression(xxhash64(col("l_orderkey")))))).count()
    assert(survivors < factRows / 2,
      s"bloom should prune most fact rows here, kept $survivors of $factRows")
  }

  test("salted aggregation equals plain aggregation") {
    val ev = Tables.load(spark, dir, "events")
    val plain = ev.groupBy("user_id")
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
    val salted = Skew.saltedCountSum(ev, "user_id", "value")
    val joined = plain.as("p").join(salted.as("s"), Seq("user_id"))
    assert(joined.count() == plain.count())
    // counts identical; double sums within fp tolerance of reordering
    assert(joined.filter(col("p.n") =!= col("s.n")).count() == 0)
    assert(joined.filter(abs(col("p.sum_value") - col("s.sum_value")) > 1e-6).count() == 0)
  }

  test("top-k heap aggregator equals the window-rank formulation exactly") {
    val e = Tables.load(spark, dir, "embeddings")
    val q = e.filter(col("vec_id") < 7)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val viaAgg = Similarity.cosineTopK(e, q, "vec_id", "embedding", k = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    val viaWindow = Similarity.cosineTopKWindow(e, q, "vec_id", "embedding", k = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    assert(viaAgg == viaWindow)
    assert(viaAgg.size == 70)
  }


  test("profiler is Expand-free and approx distincts track exact ones") {
    val cust = Tables.load(spark, dir, "customer")
    val cols = Seq("c_custkey", "c_name", "c_nationkey", "c_mktsegment")
    val exact = operators.Profiling.profile(cust, cols)
    // the scale hazard the rewrite removes: N countDistincts in one agg
    // Expand-multiply every input row N times
    val plan = exact.queryExecution.executedPlan.toString()
    assert(!plan.contains("Expand"), s"profiler plan must not Expand:\n$plan")
    val byCol = exact.collect().map(r => r.getString(0) -> r).toMap
    assert(byCol("c_custkey").getLong(3) == cust.count())
    assert(byCol("c_mktsegment").getLong(3) == 5)
    assert(byCol.values.forall(_.getLong(2) == 0L))
    val approx = operators.Profiling.profileApprox(cust, cols, rsd = 0.05)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    cols.foreach { c =>
      val e = byCol(c).getLong(3).toDouble
      assert(math.abs(approx(c) - e) / e <= 0.15,
        s"approx distinct for $c drifted: ${approx(c)} vs $e")
    }
  }

  test("near-dup clustering is a valid partition refining the pair graph") {
    import graft.operators.Dedup
    val docs = Tables.load(spark, dir, "documents")
    val clusters = Dedup.clusterNearDups(docs, "doc_id", "text", threshold = 0.5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clusters.size == docs.count()) // every doc labeled
    // each pair's endpoints share a cluster (transitivity of components)
    val pairs = Dedup.minHashLsh(docs, "doc_id", "text", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) =>
      assert(clusters(a) == clusters(b), s"pair ($a,$b) split across clusters")
    }
    // cluster label is the minimum member id
    clusters.groupBy(_._2).foreach { case (label, members) =>
      assert(members.keys.min == label)
    }
  }

  test("bounded bucket pairs equal the naive bucket join under forced blocking") {
    import spark.implicits._
    import graft.operators.Dedup
    // random multi-bucket membership with deliberate hot keys; cap=3
    // forces block-splitting on most buckets
    val rnd = new scala.util.Random(7)
    val rows = (0 until 400).flatMap { id =>
      (0 until (1 + rnd.nextInt(3))).map(_ => (id.toLong, rnd.nextInt(12).toLong))
    }.distinct
    val buckets = rows.toDF("id", "bk")
    val naive = {
      val a = buckets.select(col("id").as("a_id"), col("bk"))
      val b = buckets.select(col("id").as("b_id"), col("bk"))
      a.join(b, Seq("bk")).filter(col("a_id") < col("b_id"))
        .select("a_id", "b_id").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    val bounded = Dedup.boundedSelfPairs(buckets, cap = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bounded == naive,
      s"missing ${(naive -- bounded).take(5)} / extra ${(bounded -- naive).take(5)}")

    // cross-set: batch x corpus pairs, hot on both sides
    val left = rows.map { case (id, bk) => (id, bk % 6) }.distinct.toDF("lid", "bk")
    val right = rows.map { case (id, bk) => (id + 1000L, bk % 6) }.distinct.toDF("rid", "bk")
    val naiveX = left.join(right, Seq("bk")).select("lid", "rid").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val boundedX = Dedup.boundedCrossPairs(left, "lid", right, "rid", cap = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(boundedX == naiveX)
  }

  test("a 10k-member hot bucket completes with fanout spread over many join keys") {
    import spark.implicits._
    import graft.operators.Dedup
    // the templated-boilerplate shape: every doc lands in the SAME band
    // bucket — the naive join forms all ~50M pairs under ONE join key (one
    // straggler task); blocking must spread them across G(G+1)/2 keys
    val n = 10000
    val buckets = (0 until n).map(i => (i.toLong, 42L)).toDF("id", "bk")
    val pairs = Dedup.boundedSelfPairs(buckets, cap = 500)
    // distribution proof is structural: the candidate join must key on
    // (bk, __gl, __gh), so the G(G+1)/2 = 210 group-pairs of this bucket
    // hash across the shuffle partitions instead of one key -> one task
    val p = pairs.queryExecution.executedPlan.toString()
    assert(p.contains("__gl") && p.contains("__gh"),
      s"expected group-blocked join keys in plan:\n$p")
    assert(pairs.count() == n.toLong * (n - 1) / 2, "exact pair set preserved")
  }

  test("real image decode: PNG/JPEG header dims; corrupt bytes fall back to the stub") {
    import graft.operators.{ImageDecode, Multimodal}
    import graft.queries.MultimodalOps.DecodeStub
    import spark.implicits._
    assert(ImageDecode.dimensions(ImageDecode.fixtureBytes(33, 21, "png"))
      .contains(("png", 33, 21)))
    assert(ImageDecode.dimensions(ImageDecode.fixtureBytes(64, 2, "jpeg"))
      .map(t => (t._2, t._3)).contains((64, 2)))
    assert(ImageDecode.dimensions("not an image".getBytes("UTF-8")).isEmpty)
    // valid PNG magic, truncated header: must return None, never throw
    val corrupt = Array[Byte](0x89.toByte, 'P', 'N', 'G', 13, 10, 26, 10, 0, 0)
    assert(ImageDecode.dimensions(corrupt).isEmpty)
    // through the operator: real images decode for real, everything else
    // (including corrupt image bytes) takes the deterministic stub path
    val rows = Seq(
      (1L, ImageDecode.fixtureBytes(40, 30, "png")),
      (2L, corrupt),
      (3L, "hello world".getBytes("UTF-8")))
    val out = Multimodal.decodeAssets(rows.toDF("id", "payload"), "id", "payload")
      .collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(out(1L) == (("image", 40L, 30L, 1L)))
    assert(out(2L) == DecodeStub.decode(corrupt), "corrupt image bytes -> stub, not failure")
    assert(out(3L) == DecodeStub.decode("hello world".getBytes("UTF-8")))
  }

  test("real WAV/MP4 header decode: fixture params round-trip; corrupt bytes -> None") {
    import graft.operators.AvDecode
    // WAV: channels/sample-rate/bits read from fmt, duration from data size
    val wav = AvDecode.wavFixture(channels = 2, sampleRate = 44100, nSamples = 44100)
    val wi = AvDecode.wavInfo(wav)
    assert(wi.map(w => (w.channels, w.sampleRate, w.bitsPerSample, w.durationMs))
      .contains((2, 44100, 16, 1000L)))
    // MP4: duration from mvhd, display dims from tkhd 16.16, frames from stsz
    val mp4 = AvDecode.mp4Fixture(durationMs = 2500, timescale = 1000, width = 640, height = 360, nFrames = 75)
    val vi = AvDecode.mp4Info(mp4)
    assert(vi.map(v => (v.durationMs, v.width, v.height, v.nSamples))
      .contains((2500L, 640, 360, 75L)))
    // corrupt-safe contract: valid magic + truncated body returns None
    assert(AvDecode.wavInfo(wav.take(20)).isEmpty)
    assert(AvDecode.mp4Info(mp4.take(24)).isEmpty)
    assert(AvDecode.wavInfo("RIFFxxxx".getBytes("UTF-8")).isEmpty)
    assert(AvDecode.wavInfo(null).isEmpty && AvDecode.mp4Info(null).isEmpty)
    // non-matching magic never reaches the parsers
    assert(AvDecode.wavInfo(mp4).isEmpty && AvDecode.mp4Info(wav).isEmpty)
    // through the operator: real containers decode for real, text -> unknown
    import spark.implicits._
    val rows = Seq((1L, wav), (2L, mp4), (3L, "plain text".getBytes("UTF-8")))
    val out = graft.operators.Multimodal
      .decodeAvMeta(rows.toDF("id", "payload"), "id", "payload")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "audio", 2L -> "video", 3L -> "unknown"))
  }

  test("mp4Info parses version-1 (64-bit) mvhd/tkhd boxes") {
    import graft.operators.AvDecode
    def box(typ: String, body: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + body.length)
      bb.putInt(8 + body.length).put(typ.getBytes("US-ASCII")).put(body)
      bb.array()
    }
    val ftyp = box("ftyp", {
      val bb = java.nio.ByteBuffer.allocate(8)
      bb.put("isom".getBytes("US-ASCII")).putInt(512); bb.array()
    })
    // v1 mvhd: ver+flags(4), ctime(8), mtime(8), timescale(4), duration(8)
    val mvhd = box("mvhd", {
      val bb = java.nio.ByteBuffer.allocate(112)
      bb.putInt(0x01000000) // version 1
        .putLong(0L).putLong(0L).putInt(90000).putLong(90000L * 7)
      bb.array()
    })
    // v1 tkhd: ver+flags(4), ctime(8), mtime(8), track(4), res(4), dur(8),
    // then res(8), layer/alt/vol/res(8), matrix(36), width/height (16.16)
    val tkhd = box("tkhd", {
      val bb = java.nio.ByteBuffer.allocate(96)
      bb.putInt(0x01000000)
        .putLong(0L).putLong(0L).putInt(1).putInt(0).putLong(90000L * 7)
        .put(new Array[Byte](8 + 8 + 36))
        .putInt(1920 << 16).putInt(1080 << 16)
      bb.array()
    })
    val mp4v1 = ftyp ++ box("moov", mvhd ++ box("trak", tkhd))
    val vi = AvDecode.mp4Info(mp4v1)
    assert(vi.map(v => (v.durationMs, v.width, v.height, v.nSamples))
      .contains((7000L, 1920, 1080, 0L)), s"got $vi")
  }

  test("LSH near-dup pairs equal the exact all-pairs join on the planted corpus") {
    // the q16 shape: recall of the bucketed SRP-LSH join must be exactly 1
    // against the O(n^2) baseline it replaces (which stays quarantined here)
    val corpus = queries.SimilarityOps.plantedNearDupCorpus(spark, dir)
    val lsh = Similarity.nearDupPairsLsh(
      corpus, "vec_id", "v", queries.SimilarityOps.NearDupSim, dim = Some(64))
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Similarity.nearDupPairsExact(
      corpus, "vec_id", "v", queries.SimilarityOps.NearDupSim)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "planted corpus must contain near-dup pairs")
    assert(lsh == exact, s"LSH missed ${(exact -- lsh).take(5)} / extra ${(lsh -- exact).take(5)}")
  }

  test("connected components converge on a 200-deep chain within the default budget") {
    // a path graph has diameter = n-1: plain min-label propagation needs n-1
    // rounds (>> the 20-round default), pointer-jumping needs ~log2(n)
    import spark.implicits._
    import graft.operators.Dedup
    val n = 200
    val ids = (0L until n).toDF("id")
    val edges = (0L until n - 1).map(i => (i, i + 1)).toDF("u", "v")
    val labels = Dedup.connectedComponents(ids, edges) // default maxIterations = 20
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.size == n && labels.values.forall(_ == 0L),
      "every chain node must label to the minimum id 0")
  }

  test("DSIR scores separate the target domain and are partitioning-stable") {
    import graft.operators.Curation
    val docs = Tables.load(spark, dir, "documents")
    val scored = Curation.dsirScores(docs, "doc_id", "text", col("lang") === "en")
      .join(docs.select("doc_id", "lang"), "doc_id")
    val byLang = scored
      .groupBy("lang").agg(avg(col("dsir_ppm") / col("n_tok")).as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // the target slice must score strictly above every non-target slice
    val others = byLang.filterNot(_._1 == "en")
    assert(others.nonEmpty && others.values.forall(_ < byLang("en")),
      s"target must outscore non-targets: $byLang")
    // byte-stability across partition layouts (the census + the integer
    // micro-nat sum must make the score a pure function of corpus content)
    val re = Curation.dsirScores(docs.repartition(17), "doc_id", "text",
      col("lang") === "en")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val base = Curation.dsirScores(docs, "doc_id", "text", col("lang") === "en")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(re == base)
  }

  test("SQ8-ADC with re-ranking reaches >=90% recall@10; malformed rows drop") {
    import graft.operators.Sq
    val e = Tables.load(spark, dir, "embeddings")
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val exact = Similarity.cosineTopK(e, q, "vec_id", "embedding", k = 10)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val params = Sq.train(e, "embedding")
    assert(params.dim == 64 && params.lo.indices.forall(i => params.lo(i) <= params.hi(i)))
    // int8 keeps far more per-dimension fidelity than PQ's 8 codes: the
    // recall bar is correspondingly higher at a SMALLER refine window
    val approx = Sq.adcTopK(e, q, params, "vec_id", "embedding", k = 10, refine = 4)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    info(s"SQ8 recall@10 = $recall")
    assert(recall >= 0.9, s"recall $recall too low")
    // codes: one byte per dim; null / wrong-dim vectors encode to null
    import spark.implicits._
    val edge = Seq(
      (1L, Array.tabulate(64)(_.toDouble)),
      (2L, null.asInstanceOf[Array[Double]]),
      (3L, Array(1.0, 2.0))).toDF("vec_id", "embedding")
    val enc = Sq.encode(edge, params, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(enc(1L).exists(_.asInstanceOf[Array[Byte]].length == 64))
    assert(enc(2L).isEmpty && enc(3L).isEmpty)
    // degenerate dimension (hi == lo) encodes to 0, never divides by zero
    val flatP = Sq.SqParams(Array(1.0, 0.0), Array(1.0, 1.0))
    val flat = Sq.encode(Seq((1L, Array(1.0, 0.5))).toDF("vec_id", "embedding"),
      flatP, "vec_id", "embedding").collect().head.get(1).asInstanceOf[Array[Byte]]
    assert(flat.toSeq == Seq(0.toByte, 128.toByte))
    // malformed QUERY vectors drop instead of failing the corpus scan: the
    // null and wrong-dim queries vanish, the valid one still ranks
    val queries = Seq(
      (0L, e.filter(col("vec_id") === 7).select("embedding")
        .as[Array[Float]].head().map(_.toDouble)),
      (1L, null.asInstanceOf[Array[Double]]),
      (2L, Array(1.0, 2.0, 3.0))).toDF("query_id", "qv")
    val got = Sq.adcTopK(e, queries, params, "vec_id", "embedding", k = 3, refine = 4)
      .select("query_id").distinct().collect().map(_.getLong(0)).toSet
    assert(got == Set(0L), s"only the well-formed query may produce rows: $got")
  }

  test("PQ-ADC with re-ranking reaches >=60% recall@10 vs brute force") {
    import graft.operators.Pq
    val e = Tables.load(spark, dir, "embeddings")
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val exact = Similarity.cosineTopK(e, q, "vec_id", "embedding", k = 10)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cb = Pq.train(e, "vec_id", "embedding", m = 8, ksub = 32)
    // 64 floats -> 8 codes: the memory win is the point
    assert(cb.m * cb.dsub == 64 && cb.cents.forall(_.length <= 32))
    val approx = Pq.topK(e, q, cb, "vec_id", "embedding", k = 10, refine = 8)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    info(s"PQ recall@10 = $recall")
    assert(recall >= 0.6, s"recall $recall too low")
    // determinism: same codebooks, same result
    val cb2 = Pq.train(e, "vec_id", "embedding", m = 8, ksub = 32)
    assert(cb.cents.flatten.flatten.toSeq == cb2.cents.flatten.flatten.toSeq)

    // IVF-PQ composition: coarse cells + codes + re-rank still find a
    // useful fraction of the true neighbors while touching full vectors
    // only at the re-rank
    val cents = Similarity.trainKMeans(e, "vec_id", "embedding", k = 8)
    val ivfpq = Pq.ivfPqTopK(e, q, cents, cb, "vec_id", "embedding",
      k = 10, nProbe = 4, refine = 8)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivfpqRecall = (exact & ivfpq).size.toDouble / exact.size
    info(s"IVF-PQ recall@10 = $ivfpqRecall")
    assert(ivfpqRecall >= 0.5, s"IVF-PQ recall $ivfpqRecall too low")
  }

  test("trainKMeansPortable: byte-stable across partitionings; codebook dedup composes") {
    val e = Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val c1 = Similarity.trainKMeansPortable(e, "vec_id", "v", k = 8, iterations = 2)
      .orderBy("cid").collect().map(r => (r.getLong(0), r.getSeq[Double](1).toSeq)).toSeq
    val c2 = Similarity.trainKMeansPortable(e.repartition(13), "vec_id", "v", k = 8, iterations = 2)
      .orderBy("cid").collect().map(r => (r.getLong(0), r.getSeq[Double](1).toSeq)).toSeq
    assert(c1 == c2, "integer-quantized means must be bit-identical under any partitioning")
    assert(c1.nonEmpty && c1.size <= 8)
    // clusterDedupWith over the SEED codebook equals plain clusterDedup at
    // the same k (the refactor preserves the seeded form exactly)
    val seeds = e.orderBy(col("vec_id")).limit(8)
      .select(col("vec_id").cast("long").as("cid"), col("v").as("cv"))
    val a = Similarity.clusterDedup(e, "vec_id", "v", 0.95, kSeeds = 8)
      .select("vec_id").collect().map(_.getLong(0)).sorted.toSeq
    val b = Similarity.clusterDedupWith(e, "vec_id", "v", 0.95, seeds)
      .select("vec_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(a == b)
  }

  test("nearDupAgainstEmbed: planted batch dups all found, nothing else, tiny caps safe") {
    val corpus = Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val planted = corpus.filter(col("vec_id") < 40)
      .select((col("vec_id") + 5000L).as("vec_id"),
        concat(array(element_at(col("v"), 1) + lit(0.05)),
          slice(col("v"), lit(2), size(col("v")) - 1)).as("v"))
    val got = Similarity
      .nearDupAgainstEmbed(corpus, planted, "vec_id", "v", 0.95, dim = Some(64))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == (0L until 40L).map(i => (i + 5000L, i)).toSet,
      s"each planted copy matches exactly its source: $got")
    // a hot-bucket cap far below the bucket sizes must not lose recall
    // (block-splitting preserves every cross pair)
    val capped = Similarity
      .nearDupAgainstEmbed(corpus, planted, "vec_id", "v", 0.95, dim = Some(64), bucketCap = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == got, "bucket block-splitting must be recall-preserving")
  }

  test("assignCellsHierarchical: valid cells, deterministic, mostly agrees with flat") {
    val e = Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val cents = Similarity.trainKMeansPortable(e, "vec_id", "v", k = 25, iterations = 2)
    val validCells = cents.select("cid").collect().map(_.getLong(0)).toSet
    val hier = Similarity.assignCellsHierarchical(e, cents, "vec_id", "v")
      .select("vec_id", "cell").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hier.values.forall(validCells), "every assignment lands on a real centroid")
    assert(hier.values.forall(_ != -1L))
    val again = Similarity.assignCellsHierarchical(e.repartition(7), cents, "vec_id", "v")
      .select("vec_id", "cell").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hier == again, "two-level argmax must be deterministic under any partitioning")
    val flat = Similarity.assignCells(e, cents, "vec_id", "v")
      .select("vec_id", "cell").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val agree = hier.count { case (id, c) => flat(id) == c }.toDouble / hier.size
    info(f"hierarchical/flat agreement = $agree%.3f")
    assert(agree >= 0.5, s"two-level assignment should mostly match flat, got $agree")
  }

  test("clusterDedupWith auto default: flat at small k, hierarchical past the threshold") {
    val e = Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    def survivors(df: org.apache.spark.sql.DataFrame) =
      df.select("vec_id").collect().map(_.getLong(0)).sorted.toSeq
    // small codebook (8 ≤ threshold): auto must take the flat path
    val small = e.orderBy(col("vec_id")).limit(8)
      .select(col("vec_id").cast("long").as("cid"), col("v").as("cv"))
    assert(
      survivors(Similarity.clusterDedupWith(e, "vec_id", "v", 0.95, small)) ==
      survivors(Similarity.clusterDedupWith(e, "vec_id", "v", 0.95, small, Some(false))),
      "auto with a small codebook must equal the pinned flat form")
    // corpus-scaled codebook (300 > HierarchicalKThreshold): auto must take
    // the two-level path — the default is scale-safe without the caller
    // opting in
    assert(Similarity.HierarchicalKThreshold == 256)
    val big = e.orderBy(col("vec_id")).limit(300)
      .select(col("vec_id").cast("long").as("cid"), col("v").as("cv"))
    assert(
      survivors(Similarity.clusterDedupWith(e, "vec_id", "v", 0.95, big)) ==
      survivors(Similarity.clusterDedupWith(e, "vec_id", "v", 0.95, big, Some(true))),
      "auto with a corpus-scaled codebook must equal the pinned hierarchical form")
  }

  test("trainKMeansPortable auto default: flat at small k, hierarchical past the threshold") {
    val e = Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    def cents(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("cid").collect().map(r => (r.getLong(0), r.getSeq[Double](1).toSeq)).toSeq
    // small k: auto must train with flat Lloyd assignment
    assert(
      cents(Similarity.trainKMeansPortable(e, "vec_id", "v", k = 8, iterations = 2)) ==
      cents(Similarity.trainKMeansPortable(e, "vec_id", "v", k = 8, iterations = 2,
        hierarchicalAssign = Some(false))),
      "auto at small k must equal pinned flat training")
    // corpus-scaled k (300 > threshold): auto must train hierarchically —
    // the Lloyd passes are the O(n·k) term the 100× check caught
    val auto = cents(Similarity.trainKMeansPortable(e, "vec_id", "v", k = 300, iterations = 2))
    assert(auto ==
      cents(Similarity.trainKMeansPortable(e, "vec_id", "v", k = 300, iterations = 2,
        hierarchicalAssign = Some(true))),
      "auto at corpus-scaled k must equal pinned hierarchical training")
    // and hierarchical training genuinely differs from flat (it is an
    // approximation, not a re-derivation) while staying deterministic
    val flat = cents(Similarity.trainKMeansPortable(e, "vec_id", "v", k = 300, iterations = 2,
      hierarchicalAssign = Some(false)))
    assert(auto != flat, "the two training paths are distinct constructions")
    val again = cents(Similarity.trainKMeansPortable(
      e.repartition(11), "vec_id", "v", k = 300, iterations = 2,
      hierarchicalAssign = Some(true)))
    assert(auto == again, "hierarchical training must be byte-stable under any partitioning")
  }

  test("SRP-LSH reaches >=60% recall@10 vs brute force and is far smaller than all-pairs") {
    val e = Tables.load(spark, dir, "embeddings")
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val exact = Similarity.cosineTopK(e, q, "vec_id", "embedding", k = 10)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.srpTopK(e, q, "vec_id", "embedding", k = 10)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    info(s"SRP recall@10 = $recall")
    assert(recall >= 0.6, s"recall $recall too low")
  }

  test("heavy hitters: two-pass Misra-Gries equals the naive top-k, ties included") {
    import spark.implicits._
    // adversarial shape: a Zipf-ish head, a tied pair at the k boundary,
    // and a long singleton tail that must never survive to the shuffle
    val rows =
      (1 to 1000).map(_ => "alpha") ++ (1 to 400).map(_ => "beta") ++
      (1 to 400).map(_ => "gamma") ++ (1 to 37).map(_ => "delta") ++
      (1 to 37).map(_ => "epsilon") ++ (1 to 20000).map(i => s"tail_$i")
    val df = spark.sparkContext.parallelize(rows, 8).toDF("w")
    def naive(k: Int) = df.groupBy("w").agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), asc("w")).limit(k)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    def mg(k: Int, cap: Int) = graft.operators.Frequency.heavyHitters(df, "w", k, cap)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // n ≈ 21874, capacity 1024 → threshold ≈ 21: every true top-5 count
    // (1000, 400, 400, 37, 37) clears it, so the result is provably exact
    assert(mg(5, 1024) == naive(5))
    // capacity ≥ distinct count degenerates to fully exact for any k
    assert(mg(8, 30000).take(5) == naive(5))
    // nulls are ignored, not counted
    val withNulls = spark.sparkContext
      .parallelize(Seq[String]("x", null, "x", null, "y"), 2).toDF("w")
    assert(graft.operators.Frequency.heavyHitters(withNulls, "w", 2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("x", 2L), ("y", 1L)))
  }

  test("per-group heavy hitters equal the naive per-group top-k") {
    import spark.implicits._
    val rows = (for {
      g <- Seq("a", "b", "c")
      (w, n) <- Seq(("x", 200), ("y", 90), ("z", 90), ("w", 7))
      _ <- 1 to (if (g == "b") n / 2 + 1 else n)
    } yield (g, w + g)) ++ (1 to 5000).map(i => ("a", s"tail$i")) ++
      Seq((null, "ignored"), ("a", null))
    val df = spark.sparkContext.parallelize(rows, 6).toDF("g", "w")
    def naive(k: Int) = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("g").orderBy(desc("cnt"), asc("w"))
      df.filter(col("g").isNotNull && col("w").isNotNull)
        .groupBy("g", "w").agg(count(lit(1)).as("cnt"))
        .withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
        .select("g", "w", "cnt").collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2))).sorted.toSeq
    }
    val got = graft.operators.Frequency.heavyHittersByGroup(df, "g", "w", k = 3, capacity = 512)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).sorted.toSeq
    assert(got == naive(3))
  }

  test("auto-salted join equals the plain join on skewed data") {
    import spark.implicits._
    // one key carries ~90% of the fact side; nulls on both sides; a dim
    // key with no fact rows and a fact key with no dim row
    val fact = ((1 to 9000).map(_ => (Some(1L), "hot")) ++
      (1 to 500).map(i => (Some(i.toLong % 40 + 2), s"cold$i")) ++
      Seq((None: Option[Long], "nullkey"), (Some(999L), "nodim")))
      .map { case (k, v) => (k.map(Long.box).orNull, v) }.toDF("k", "v")
    val dim = ((1L to 45L).map(k => (Long.box(k), s"d$k")) :+
      ((null: java.lang.Long), "dnull")).toDF("k", "name")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("k", "v", "name").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2))).sorted.toSeq
    val plain = canon(fact.join(dim, Seq("k")))
    val auto = canon(graft.operators.Skew.autoSaltedJoin(fact, dim, "k",
      saltFactor = 4, hotShare = 0.01))
    assert(auto == plain && plain.size == 9500)
  }

  test("containment pairs: a quoted subset scores c_ab = 1 while Jaccard stays low") {
    import spark.implicits._
    val small = "alpha beta gamma delta epsilon zeta"
    val filler = (1 to 40).map(i => s"filler$i").mkString(" ")
    val df = Seq(
      (1L, small),
      (2L, s"$small $filler"), // contains doc 1 verbatim as a prefix
      (3L, "completely unrelated words appear in this one")).toDF("doc_id", "text")
    val got = graft.operators.Dedup.containmentPairs(df, "doc_id", "text", threshold = 0.9, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(got.toSeq == Seq((1L, 2L, 1.0, got.head._4)))
    // every shingle of the small doc appears in the big one; the reverse
    // direction is diluted by the filler — the Jaccard a symmetric gate
    // would see is below 0.1
    assert(got.head._4 < 0.15)
  }

  test("incremental aggregate maintenance equals recompute under random churn") {
    import spark.implicits._
    import graft.operators.{IncrementalAgg, SnapshotDiff}
    val rnd = new scala.util.Random(42)
    // groups include null; measure includes nulls; updates move rows
    // between groups and flip measures to/from null
    def grp(i: Int): java.lang.Integer = if (i % 13 == 0) null else Int.box(i % 5)
    def mea(i: Int): java.lang.Long = if (i % 7 == 0) null else Long.box(i.toLong * 3)
    val before = (0 until 2000).map(i => (i.toLong, grp(i), mea(i)))
      .toDF("id", "g", "m")
    val afterRows = (0 until 2000).flatMap { i =>
      rnd.nextInt(10) match {
        case 0 => Nil // delete ~10%
        case 1 | 2 => Seq((i.toLong, grp(i + 1), mea(i + 2))) // group/measure moves
        case 3 => Seq((i.toLong, grp(i), null: java.lang.Long)) // measure drained
        case _ => Seq((i.toLong, grp(i), mea(i)))
      }
    } ++ (5000 until 5200).map(i => (i.toLong, grp(i), mea(i))) // inserts
    val after = afterRows.toDF("id", "g", "m")

    val maintained = IncrementalAgg.maintain(
      IncrementalAgg.aggregate(before, Seq("g"), Seq("m")),
      SnapshotDiff.diffImages(before, after, Seq("id")),
      Seq("g"), Seq("m"))
    val recomputed = IncrementalAgg.aggregate(after, Seq("g"), Seq("m"))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (Option(r.get(0)).map(_.toString).getOrElse("∅"),
        if (r.isNullAt(1)) None else Some(r.getLong(1)), r.getLong(2), r.getLong(3)))
        .sortBy(_._1).toSeq
    assert(canon(maintained) == canon(recomputed))

    // drained group: all non-null measures deleted but rows remain → sum
    // NULL, cnt intact; emptied group disappears entirely
    val b2 = Seq((1L, 1, Some(5L)), (2L, 1, None), (3L, 2, Some(9L))).map {
      case (id, g, m) => (id, g, m.map(Long.box).orNull)
    }.toDF("id", "g", "m")
    val a2 = Seq((2L, 1, null: java.lang.Long)).toDF("id", "g", "m") // 1 & 3 deleted
    val m2 = IncrementalAgg.maintain(
      IncrementalAgg.aggregate(b2, Seq("g"), Seq("m")),
      SnapshotDiff.diffImages(b2, a2, Seq("id")), Seq("g"), Seq("m"))
      .collect().map(r => (r.getInt(0), r.isNullAt(1), r.getLong(3))).toSeq
    assert(m2 == Seq((1, true, 1L)), s"got $m2")
  }

  test("packShards two-level prefix sum equals the global running sum exactly") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (0L until 2000L).map(i => (i, 1L + rnd.nextInt(400).toLong))
    val df = rows.toDF("id", "w").repartition(16) // arbitrary incoming layout
    val got = graft.operators.Curation.packShards(df, "id", "w", budget = 1000L, numParts = 7)
      .collect().map(r => (r.getLong(0), r.getInt(2))).toMap
    var acc = 0L
    rows.foreach { case (id, w) =>
      assert(got(id) == (acc / 1000L).toInt, s"doc $id: got ${got(id)}, want ${acc / 1000}")
      acc += w
    }
    // shards are contiguous id ranges by construction
    val byShard = rows.map { case (id, _) => (got(id), id) }.groupBy(_._1)
    byShard.foreach { case (sh, ids) =>
      val sorted = ids.map(_._2).sorted
      assert(sorted.last - sorted.head + 1 == sorted.size, s"shard $sh not contiguous")
    }
  }

  test("packShardsAuto: corpus-scaled budget saturates shard count, floor respected") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val rows = (0L until 3000L).map(i => (i, 1L + rnd.nextInt(400).toLong))
    val total = rows.map(_._2).sum
    val df = rows.toDF("id", "w").repartition(16)
    // big corpus: budget = ceil(total/targetShards), shard count ≈ target
    val target = 16
    val budget = math.max(10L, (total + target - 1) / target)
    val got = graft.operators.Curation
      .packShardsAuto(df, "id", "w", targetShards = target, minBudget = 10L)
      .collect().map(r => (r.getLong(0), r.getInt(2))).toMap
    var acc = 0L
    rows.foreach { case (id, w) =>
      assert(got(id) == (acc / budget).toInt, s"doc $id: got ${got(id)}")
      acc += w
    }
    assert(got.values.max == target - 1, s"shard count saturates at target: ${got.values.max}")
    // small corpus: the minBudget floor wins (same result as fixed packShards)
    val small = rows.take(20).toDF("id", "w")
    val auto = graft.operators.Curation
      .packShardsAuto(small, "id", "w", targetShards = 16, minBudget = 100000L)
      .collect().map(r => (r.getLong(0), r.getInt(2))).toSeq.sorted
    val fixed = graft.operators.Curation.packShards(small, "id", "w", budget = 100000L)
      .collect().map(r => (r.getLong(0), r.getInt(2))).toSeq.sorted
    assert(auto == fixed && auto.forall(_._2 == 0))
  }

  test("packSequences: fixed windows cross doc boundaries, order exact, layout-stable") {
    import spark.implicits._
    // global stream [1..9] with an empty doc in the middle; L=4 →
    // examples 0:[1,2,3,4] 1:[5,6,7,8] 2:[9] (the short tail)
    val docs = Seq(
      (1L, Seq(1, 2, 3)), (2L, Seq(4, 5)), (3L, Seq.empty[Int]), (4L, Seq(6, 7, 8, 9)))
      .toDF("doc_id", "token_ids")
    def run(df: org.apache.spark.sql.DataFrame) =
      graft.operators.Curation.packSequences(df, "doc_id", "token_ids", seqLen = 4)
        .collect().map(r => (r.getLong(0), r.getSeq[Int](1).toSeq, r.getInt(2)))
        .sortBy(_._1).toSeq
    val got = run(docs)
    assert(got == Seq(
      (0L, Seq(1, 2, 3, 4), 4),
      (1L, Seq(5, 6, 7, 8), 4),
      (2L, Seq(9), 1)), got.toString)
    // deterministic under any incoming layout (the two-level prefix sum
    // bakes range boundaries as data, not partitioner state)
    assert(run(docs.repartition(7)) == got)
    // a larger randomized stream equals the serial concatenation exactly
    val rnd = new scala.util.Random(11)
    val big = (0L until 300L).map(i => (i, Seq.fill(rnd.nextInt(20))(rnd.nextInt(1000))))
    val serial = big.sortBy(_._1).flatMap(_._2)
    val packed = run(big.toDF("doc_id", "token_ids"))
    assert(packed.flatMap(_._2) == serial, "concatenation order must be exact")
    assert(packed.init.forall(_._3 == 4) &&
      packed.map(_._1) == packed.indices.map(_.toLong),
      "every example except the tail is exactly seqLen; ids are dense")
  }

  test("packSequencesSpans: segment starts = offset 0 + every doc's first token") {
    import spark.implicits._
    // stream: d1=[1,2,3] d2=[4,5] d3=[] d4=[6,7,8,9]; L=4 →
    // ex0 [1,2,3,4]: starts 0 (d1) and 3 (d2); ex1 [5,6,7,8]: starts 0
    // (d2 continues) and 1 (d4); ex2 [9]: start 0 only (d4 continues).
    // d3 is empty (absent from the explode — no start anywhere).
    val docs = Seq(
      (1L, Seq(1, 2, 3)), (2L, Seq(4, 5)), (3L, Seq.empty[Int]), (4L, Seq(6, 7, 8, 9)))
      .toDF("doc_id", "token_ids")
    val got = graft.operators.Curation
      .packSequencesSpans(docs, "doc_id", "token_ids", seqLen = 4)
      .select("example_id", "token_ids", "doc_spans", "n_tok")
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Int](1).toSeq, r.getSeq[Int](2).toSeq, r.getInt(3)))
      .sortBy(_._1).toSeq
    assert(got == Seq(
      (0L, Seq(1, 2, 3, 4), Seq(0, 3), 4),
      (1L, Seq(5, 6, 7, 8), Seq(0, 1), 4),
      (2L, Seq(9), Seq(0), 1)), got.toString)
    // a doc starting exactly on an example boundary dedupes with the
    // always-present offset 0 (EOS convention: one id appended per doc)
    val aligned = Seq((1L, Seq(1, 2, 3, 9)), (2L, Seq(4, 5, 6, 9)))
      .toDF("doc_id", "token_ids")
    val g2 = graft.operators.Curation
      .packSequencesSpans(aligned, "doc_id", "token_ids", seqLen = 4)
      .select("example_id", "doc_spans")
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1).toSeq)).sortBy(_._1).toSeq
    assert(g2 == Seq((0L, Seq(0)), (1L, Seq(0))), g2.toString)
    // token_ids must be identical to the spanless form
    val plain = graft.operators.Curation
      .packSequences(docs, "doc_id", "token_ids", seqLen = 4)
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1).toSeq)).sortBy(_._1).toSeq
    assert(got.map(g => (g._1, g._2)) == plain)
  }

  test("prefix-sum operators fail loudly on null arrays and duplicate ids") {
    import spark.implicits._
    // null token_ids: size(NULL) = -1 would silently shift every later
    // offset — must raise, not corrupt
    val withNull = Seq((1L, Seq(1, 2)), (2L, null: Seq[Int]), (3L, Seq(3)))
      .toDF("doc_id", "token_ids")
    val e1 = intercept[Exception] {
      graft.operators.Curation.packSequences(withNull, "doc_id", "token_ids", seqLen = 4)
        .collect()
    }
    assert(e1.getMessage != null && e1.getMessage.contains("null token_ids"),
      s"wrong error: ${e1.getMessage}")
    // duplicate order keys: overlapping offsets — rejected by the
    // shuffle-free lag-equality guard inside the existing window pass
    // (equal keys co-locate and sort adjacently)
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    val dup = Seq((1L, 5L), (2L, 5L), (2L, 5L), (3L, 5L)).toDF("id", "w")
    val e2 = intercept[Exception] {
      graft.operators.Curation.packShards(dup, "id", "w", budget = 100L).collect()
    }
    assert(msgs(e2).exists(_.contains("must be unique")), s"wrong error: ${msgs(e2)}")
    // a null id has no defined position — same guard, its own message
    val withNullId = Seq(Some(1L), None, Some(3L)).map(id => (id.map(Long.box).orNull, 5L))
      .toDF("id", "w")
    val e3 = intercept[Exception] {
      graft.operators.Curation.packShards(withNullId, "id", "w", budget = 100L).collect()
    }
    assert(msgs(e3).exists(_.contains("must be non-null")), s"wrong error: ${msgs(e3)}")
  }

  test("assignSplits is exhaustive, proportional, and stable under corpus growth") {
    import spark.implicits._
    val small = (0L until 2000L).map(i => (i, s"d$i")).toDF("id", "s")
    val splits = Seq(("train", 90), ("val", 5), ("test", 5))
    val a = graft.operators.Curation.assignSplits(small, "id", splits)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(a.size == 2000, "every row gets a label")
    val frac = a.values.groupBy(identity).view.mapValues(_.size / 2000.0).toMap
    assert(math.abs(frac("train") - 0.90) < 0.03 && frac("val") > 0.02 && frac("test") > 0.02,
      s"proportions off: $frac")
    // growth stability: the same ids keep their labels in a larger corpus
    val grown = (0L until 4000L).map(i => (i, s"d$i")).toDF("id", "s")
    val b = graft.operators.Curation.assignSplits(grown, "id", splits)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert((0L until 2000L).forall(i => a(i) == b(i)),
      "membership must be a pure function of the id")
  }

  test("mixCorpus hits domain targets, clamps under-supplied domains, stays byte-stable") {
    import spark.implicits._
    // domain a: 10k docs × 10 tokens = 100k available; domain b: 30 docs
    // × 10 = 300 available; domain c present in the corpus but untargeted
    val rows = (0L until 10000L).map(i => (i, "a", 10L)) ++
      (10000L until 10030L).map(i => (i, "b", 10L)) ++
      (20000L until 20010L).map(i => (i, "c", 10L))
    val df = rows.toDF("id", "dom", "nt")
    // budget 20k, half each: a wants 10k of 100k (10% sample), b wants
    // 10k of 300 (clamp: keep everything)
    val got = graft.operators.Curation.mixCorpus(
      df, "id", "dom", "nt", Map("a" -> 0.5, "b" -> 0.5), budgetTokens = 20000L)
    val byDom = got.collect().map(r => (r.getString(1), r.getLong(0), r.getLong(3)))
      .groupBy(_._1)
    assert(!byDom.contains("c"), "untargeted domains drop")
    assert(byDom("b").length == 30, "under-supplied domain keeps everything")
    assert(byDom("b").forall(_._3 == 1000000L), "clamped rate is exactly 1")
    val aTok = byDom("a").length * 10L
    assert(aTok > 8000 && aTok < 12000,
      s"domain a should sample ~10% of its 100k tokens, kept $aTok")
    // byte-stable: a different incoming partitioning yields the same rows
    val again = graft.operators.Curation.mixCorpus(
      df.repartition(13), "id", "dom", "nt",
      Map("a" -> 0.5, "b" -> 0.5), budgetTokens = 20000L)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(again == got.collect().map(_.getLong(0)).sorted.toSeq)
  }

  test("mixCorpus refuses reserved-name input columns instead of clobbering them") {
    import spark.implicits._
    val df = Seq((1L, "a", 10L, 7L)).toDF("id", "dom", "nt", "rate_ppm")
    val e = intercept[IllegalArgumentException] {
      graft.operators.Curation.mixCorpus(
        df, "id", "dom", "nt", Map("a" -> 1.0), budgetTokens = 100L)
    }
    assert(e.getMessage.contains("rate_ppm"), s"names the clash: ${e.getMessage}")
    // `epoch` is reserved only in upsample mode (it is not written otherwise)
    val withEpoch = Seq((1L, "a", 10L, 3L)).toDF("id", "dom", "nt", "epoch")
    assert(graft.operators.Curation.mixCorpus(
      withEpoch, "id", "dom", "nt", Map("a" -> 1.0), budgetTokens = 100L)
      .columns.count(_ == "epoch") == 1, "downsample mode leaves input epoch alone")
    val e2 = intercept[IllegalArgumentException] {
      graft.operators.Curation.mixCorpus(
        withEpoch, "id", "dom", "nt", Map("a" -> 1.0), budgetTokens = 100L,
        upsample = true)
    }
    assert(e2.getMessage.contains("epoch"))
  }

  test("temperatureMix flattens toward uniform as alpha drops; byte-stable") {
    import spark.implicits._
    // big domain 100k tokens, small domain 1k: natural share 100:1.
    // alpha=0.5 weights sqrt(100k):sqrt(1k) ≈ 10:1 — the small domain's
    // SAMPLING RATE must come out ~10× the big one's (same budget slice
    // spread over 100× less mass ⇒ flattening), and under alpha=1
    // (natural) the rates are equal by construction
    val rows = (0L until 10000L).map(i => (i, "big", 10L)) ++
      (100000L until 100100L).map(i => (i, "small", 10L))
    val df = rows.toDF("id", "dom", "nt")
    val mixed = graft.operators.Curation.temperatureMix(
      df, "id", "dom", "nt", alpha = 0.5, budgetTokens = 5000L)
    val rates = mixed.select("dom", "rate_ppm").distinct().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rates.contains("big") && rates.contains("small"), rates.toString)
    val ratio = rates("small").toDouble / rates("big")
    assert(ratio > 8 && ratio < 12.5,
      s"alpha=0.5 over 100:1 mass must give ~10x the rate to the small domain, got $ratio")
    // alpha = 1 keeps natural proportions: every domain samples at the
    // same rate (weights ∝ mass cancel against mass)
    val nat = graft.operators.Curation.temperatureMix(
      df, "id", "dom", "nt", alpha = 1.0, budgetTokens = 5000L)
      .select("dom", "rate_ppm").distinct().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(nat("small") - nat("big")) <= 1000L, // ppm quantization
      s"alpha=1 must keep natural proportions, got $nat")
    // byte-stable across partitionings
    val again = graft.operators.Curation.temperatureMix(
      df.repartition(7), "id", "dom", "nt", alpha = 0.5, budgetTokens = 5000L)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(again == mixed.collect().map(_.getLong(0)).sorted.toSeq)
  }

  test("gopherRules: each rule trips on its designed violation") {
    import spark.implicits._
    val fifty = (1 to 50).map(i => s"the be to of and that have with word$i")
      .mkString(" ") // 450 tokens, letters, stop words, no symbols
    val docs = Seq(
      (1L, fifty),                                     // passes everything
      (2L, "short doc the be"),                        // fails r_wordcount
      (3L, (1 to 60).map(_ => "1 2 3").mkString(" ")), // all digits: fails r_alpha (+meanlen)
      (4L, fifty + "\n" + (1 to 9).map(_ => "- bullet line").mkString("\n")), // fails r_bullet (9/10 lines)
      (5L, fifty + " " + (1 to 80).map(_ => "#").mkString(" "))               // fails r_symbol
    ).toDF("doc_id", "text")
    val got = graft.operators.TextAnalysis.gopherRules(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(1), r.getBoolean(2), r.getBoolean(3), r.getBoolean(4),
          r.getBoolean(5), r.getBoolean(6), r.getBoolean(7), r.getBoolean(8))).toMap
    // (r_wordcount, r_meanlen, r_alpha, r_stop, r_symbol, r_bullet, r_ellipsis, pass)
    assert(got(1L)._8, s"doc 1 must pass: ${got(1L)}")
    assert(!got(2L)._1 && !got(2L)._8, "doc 2 fails word count")
    assert(!got(3L)._3 && !got(3L)._8, "doc 3 fails alpha share")
    assert(!got(4L)._6 && !got(4L)._8, "doc 4 fails bullet lines")
    assert(!got(5L)._5 && !got(5L)._8, "doc 5 fails symbol ratio")
  }

  test("mixCorpus upsample: rates above 1e6 ppm replicate rows with epoch markers") {
    import spark.implicits._
    // one domain, 4 rows of weight 1 → have = 4; target weight 1, budget 10
    // → rate = 10/4 = 2.5e6 ppm: every row lands epochs {0, 1} plus a
    // hash-admitted half gets epoch 2
    val df = (1L to 4L).map(i => (i, "a", 1L)).toDF("id", "dom", "w")
    val got = graft.operators.Curation.mixCorpus(
      df, "id", "dom", "w", Map("a" -> 1.0), budgetTokens = 10L, upsample = true)
      .select("id", "epoch").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val byId = got.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    assert(byId.keySet == Set(1L, 2L, 3L, 4L))
    byId.foreach { case (id, epochs) =>
      assert(epochs.startsWith(Seq(0L, 1L)), s"id $id must land 2 full epochs: $epochs")
      assert(epochs.size <= 3 && epochs == (0L until epochs.size).toSeq,
        s"id $id epochs must be dense from 0: $epochs")
    }
    // determinism: the exact multiset reproduces
    val again = graft.operators.Curation.mixCorpus(
      df, "id", "dom", "w", Map("a" -> 1.0), budgetTokens = 10L, upsample = true)
      .select("id", "epoch").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got.sorted == again.sorted)
    // without upsample the same call clamps at one epoch and no column
    val down = graft.operators.Curation.mixCorpus(
      df, "id", "dom", "w", Map("a" -> 1.0), budgetTokens = 10L)
    assert(!down.columns.contains("epoch") && down.count() == 4)
  }

  test("bpeTrain learns the reference greedy-left merges with deterministic ties") {
    import spark.implicits._
    // corpus: "aaab" ×3, "ab" ×2 → census {aaab:3, ab:2}
    // round 1 pairs: (a,a):6 [two per aaab], (a,b):5 → merge (a,a)→aa
    //   (greedy-left: "a a a b" → "aa a b", NOT "a aa b")
    // round 2: aaab="aa a b": (aa,a):3, (a,b):3+2=5 → merge (a,b)→ab
    // round 3: aaab="aa ab", ab="ab": (aa,ab):3 → merge (aa,ab)
    val docs = Seq((1L, "aaab aaab"), (2L, "aaab ab"), (3L, "ab")).toDF("doc_id", "text")
    val got = graft.operators.TextAnalysis.bpeTrain(docs, "text", nMerges = 3)
      .orderBy("rank")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq
    assert(got == Seq(
      (1, "a", "a", "aa", 6L),
      (2, "a", "b", "ab", 5L),
      (3, "aa", "ab", "aaab", 3L)), got.toString)
  }

  test("bpeEncodeIds: sequences follow vocab convention, order, and bpeEncode counts") {
    import spark.implicits._
    // same corpus as the bpeTrain test; merges: aa, ab, aaab
    val docs = Seq((1L, "aaab aaab"), (2L, "aaab ab"), (3L, "ab")).toDF("doc_id", "text")
    val merges = graft.operators.TextAnalysis.bpeTrain(docs, "text", nMerges = 3)
      .orderBy("rank").collect().map(r => (r.getString(1), r.getString(2))).toSeq
    val got = graft.operators.TextAnalysis
      .bpeEncodeIds(docs, "doc_id", "text", merges)
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1).toSeq, r.getLong(2))).toSeq
      .sortBy(_._1)
    // vocab: base chars a=0, b=1; merges aa=2, ab=3, aaab=4
    assert(got == Seq(
      (1L, Seq(4, 4), 2L),   // "aaab aaab" -> [aaab][aaab]
      (2L, Seq(4, 3), 2L),   // "aaab ab"   -> [aaab][ab]
      (3L, Seq(3), 1L)),     // "ab"        -> [ab]
      got.toString)
    // counts agree with bpeEncode on a messier corpus (multi-word docs,
    // unmerged leftovers, ordering via the pos-sorted reassembly)
    val docs2 = Seq((1L, "banana bandana"), (2L, "an apple a day"), (3L, "nab ban"))
      .toDF("doc_id", "text")
    val m2 = graft.operators.TextAnalysis.bpeTrain(docs2, "text", nMerges = 4)
      .orderBy("rank").collect().map(r => (r.getString(1), r.getString(2))).toSeq
    val viaIds = graft.operators.TextAnalysis.bpeEncodeIds(docs2, "doc_id", "text", m2)
      .select(col("doc_id"), col("n_bpe")).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaCounts = graft.operators.TextAnalysis.bpeEncode(docs2, "doc_id", "text", m2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaIds == viaCounts, s"id-sequence lengths must equal bpeEncode counts: $viaIds vs $viaCounts")
  }

  test("bpeTrainBytes/bpeEncodeIdsBytes: UTF-8 byte symbols, GPT-2 id convention, non-ASCII") {
    import spark.implicits._
    // pre-tokens keep case and the leading space; é is the two UTF-8 bytes
    // c3 a9, space is 20, a is 61.
    //   doc1 "aaa aaa" -> ["aaa", " aaa"]; doc2 "aaa é" -> ["aaa", " é"];
    //   doc3 "é é"     -> ["é", " é"]
    // round 1: (61,61) cnt 6 -> "6161"; round 2: tie (6161,61)=3 vs
    // (c3,a9)=3 breaks on pair ASC -> "616161" cnt 3; round 3: (c3,a9)
    // cnt 3 -> "c3a9"
    val docs = Seq((1L, "aaa aaa"), (2L, "aaa é"), (3L, "é é")).toDF("doc_id", "text")
    val got = graft.operators.TextAnalysis.bpeTrainBytes(docs, "text", nMerges = 3)
      .orderBy("rank")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq
    assert(got == Seq(
      (1, "61", "61", "6161", 6L),
      (2, "6161", "61", "616161", 3L),
      (3, "c3", "a9", "c3a9", 3L)), got.toString)
    // ids: base = the byte value (space=32), merges at 256/257/258
    val merges = got.map(m => (m._2, m._3))
    val ids = graft.operators.TextAnalysis
      .bpeEncodeIdsBytes(docs, "doc_id", "text", merges)
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1).toSeq, r.getLong(2))).toSeq
      .sortBy(_._1)
    assert(ids == Seq(
      (1L, Seq(257, 32, 257), 3L),
      (2L, Seq(257, 32, 258), 3L),
      (3L, Seq(258, 32, 258), 3L)), ids.toString)
  }

  test("in-memory BPE trainer and seq-replay encoder are bit-identical to the distributed forms") {
    import spark.implicits._
    // a corpus rich enough for 60+ merges with overlap/tie/collision
    // structure: repeated runs (overlapping pairs), shared prefixes,
    // non-ASCII multi-byte, per-doc pseudo-words forcing deep tie-breaks
    val docs = (0L until 120L).map { i =>
      val noise = s"q${('a' + (i % 17).toInt).toChar}${('a' + (i % 23).toInt).toChar}x"
      (i, s"aaa bbb the cat $noise sat ${if (i % 3 == 0) "café" else "mat"} aaaa $noise$noise")
    }.toDF("doc_id", "text")
    val n = 64
    val dist = graft.operators.TextAnalysis.bpeTrainBytes(docs, "text", nMerges = n)
      .orderBy("rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4))).toSeq
    val mem = graft.operators.TextAnalysis.bpeTrainBytesInMemory(docs, "text", nMerges = n)
      .orderBy("rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4))).toSeq
    assert(mem == dist, s"first divergence: ${mem.zip(dist).find(p => p._1 != p._2)}")
    // char-level sibling (round-20 optimization: the tokenize/pack entries'
    // vocabulary prep): bpeTrainInMemory must equal bpeTrain rank-by-rank,
    // including early exhaustion when the char census can't sustain n merges
    val distC = graft.operators.TextAnalysis.bpeTrain(docs, "text", nMerges = n)
      .orderBy("rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4))).toSeq
    val memC = graft.operators.TextAnalysis.bpeTrainInMemory(docs, "text", nMerges = n)
      .orderBy("rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4))).toSeq
    assert(memC == distC, s"first divergence: ${memC.zip(distC).find(p => p._1 != p._2)}")
    // encode: the sequential-replay UDF must equal the chained-replace form
    val merges = dist.map(m => (m._2, m._3))
    def seqOf(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getSeq[Int](1).toSeq)).sortBy(_._1).toSeq
    val chained = seqOf(graft.operators.TextAnalysis
      .bpeEncodeIdsBytes(docs, "doc_id", "text", merges))
    val replay = seqOf(graft.operators.TextAnalysis
      .bpeEncodeIdsBytesSeq(docs, "doc_id", "text", merges))
    assert(replay == chained,
      s"first divergence: ${replay.zip(chained).find(p => p._1 != p._2)}")
    // early exhaustion: asking for far more merges than the census can
    // sustain stops at the same point on both paths
    val tiny = Seq((1L, "ab ab ba")).toDF("doc_id", "text")
    val dTiny = graft.operators.TextAnalysis.bpeTrainBytes(tiny, "text", nMerges = 500)
      .collect().map(_.toSeq).toSeq
    val mTiny = graft.operators.TextAnalysis.bpeTrainBytesInMemory(tiny, "text", nMerges = 500)
      .collect().map(_.toSeq).toSeq
    assert(mTiny == dTiny && mTiny.nonEmpty && mTiny.size < 500, s"got ${mTiny.size} merges")
    // the census driver bound fails loudly
    val e = intercept[IllegalArgumentException] {
      graft.operators.TextAnalysis.bpeTrainBytesInMemory(docs, "text", 4, maxCensusWords = 2)
    }
    assert(e.getMessage.contains("minFrequency"), e.getMessage)
  }

  test("byte-level decode inverts encode byte-exactly; char-level decode detokenizes") {
    import spark.implicits._
    // every hard case at once: multi-byte UTF-8 (2/3/4-byte), contractions,
    // digit runs, tabs/newlines/vertical tab, symbol runs, leading spaces
    val docs = Seq(
      (1L, "The cat's mat — don't!  café №42\tnaïve\nend"),
      (2L, "aaa aaaa aaaaa 𝄞 music 😀 emoji,,, ;; x"),
      (3L, "   leading spaces and trailing   "),
      (4L, "1234 5678 90 mixed123alpha")).toDF("doc_id", "text")
    val merges = graft.operators.TextAnalysis
      .bpeTrainBytesInMemory(docs, "text", nMerges = 80)
      .orderBy("rank").collect().map(r => (r.getString(1), r.getString(2))).toSeq
    assert(merges.nonEmpty)
    def roundTrip(ms: Seq[(String, String)]): Map[Long, String] = {
      val enc = graft.operators.TextAnalysis.bpeEncodeIdsBytesSeq(docs, "doc_id", "text", ms)
      graft.operators.TextAnalysis.bpeDecodeIdsBytes(enc, "token_ids", ms)
        .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("decoded")).toMap
    }
    val expected = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(roundTrip(merges) == expected, "decode(encode(t)) must equal t under trained merges")
    assert(roundTrip(Nil) == expected, "the merge-free (pure byte) path must round-trip too")
    // an id outside the vocabulary fails loudly, never silently drops
    val bad = Seq((9L, Array(65, 66, 256 + merges.size + 7))).toDF("doc_id", "token_ids")
    val e = intercept[org.apache.spark.SparkException] {
      graft.operators.TextAnalysis.bpeDecodeIdsBytes(bad, "token_ids", merges).collect()
    }
    assert(e.getMessage.contains("vocabulary") ||
      e.getCause != null && e.getCause.getMessage.contains("vocabulary"), e.getMessage)

    // char-level: decode is detokenization — concatenated lowercase token
    // surfaces (plus mapped extras), against a hand-checkable vocabulary
    val cdocs = Seq((1L, "ab ab ba!"), (2L, "b a ab")).toDF("doc_id", "text")
    val cmerges = graft.operators.TextAnalysis.bpeTrain(cdocs, "text", nMerges = 2)
      .orderBy("rank").collect().map(r => (r.getString(1), r.getString(2))).toSeq
    val baseChars = Seq("a", "b")
    val eos = baseChars.size + cmerges.size
    val cenc = graft.operators.TextAnalysis.bpeEncodeIds(cdocs, "doc_id", "text", cmerges)
      .withColumn("token_ids", concat(col("token_ids"), array(lit(eos))))
    val cdec = graft.operators.TextAnalysis
      .bpeDecodeIdsChars(cenc, "token_ids", cmerges, baseChars, extra = Map(eos -> "|"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("decoded")).toMap
    assert(cdec == Map(1L -> "ababba|", 2L -> "baab|"), cdec.toString)
    // unknown id raises
    val cbad = Seq((7L, Array(0, 99))).toDF("doc_id", "token_ids")
    val ce = intercept[Exception] {
      graft.operators.TextAnalysis
        .bpeDecodeIdsChars(cbad, "token_ids", cmerges, baseChars).collect()
    }
    assert(ce.getMessage.contains("vocabulary") ||
      ce.getCause != null && ce.getCause.getMessage.contains("vocabulary"), ce.getMessage)
  }

  test("seq-replay encode: the plan does not grow with the merge count") {
    import spark.implicits._
    val docs = Seq((1L, "aaa bbb ccc ddd")).toDF("doc_id", "text")
    // synthetic merge lists: hex-pair symbols, mostly never-applicable —
    // exactly the shape of a large trained vocabulary at encode time
    def merges(n: Int): Seq[(String, String)] =
      (0 until n).map(i => (f"${i % 256}%02x", f"${(i * 7 + 1) % 256}%02x"))
    def planLen(n: Int): Int =
      graft.operators.TextAnalysis
        .bpeEncodeIdsBytesSeq(docs, "doc_id", "text", merges(n))
        .queryExecution.executedPlan.toString.length
    val small = planLen(8)
    val large = planLen(8192)
    assert(large <= small + 64,
      s"plan must stay O(1) in merges: $small chars at 8 vs $large at 8192")
    // (the chained-replace contrast is not measurable here: plan toString
    // truncates long expression trees, so its linear growth hides — the
    // analyzed plan of the fold form carries one replace per merge by
    // construction, which is exactly why the seq form exists)
    // and an 8192-merge encode actually RUNS in bounded time
    val ids = graft.operators.TextAnalysis
      .bpeEncodeIdsBytesSeq(docs, "doc_id", "text", merges(8192))
      .collect()
    assert(ids.nonEmpty)
  }

  test("gopherRules: a column name needing backtick quoting works (no raw SQL interpolation)") {
    import spark.implicits._
    val fifty = (1 to 50).map(i => s"the be to of and that have with word$i").mkString(" ")
    val docs = Seq((1L, fifty), (2L, fifty + " " + (1 to 80).map(_ => "#").mkString(" ")))
      .toDF("doc id", "the text") // spaces: expr(s"replace($textCol, ...)") choked here
    val got = graft.operators.TextAnalysis.gopherRules(docs, "doc id", "the text")
      .collect().map(r => r.getLong(0) -> r.getBoolean(8)).toMap
    assert(got(1L) && !got(2L), s"same verdicts through the quoted-name path: $got")
  }

  test("lmPerplexity: in-distribution text scores lower perplexity than gibberish") {
    import spark.implicits._
    val common = (1 to 40).map(i => (i.toLong, "the cat sat on the mat and the dog ran"))
    val probe = Seq((100L, "the cat sat on the mat"), (101L, "zq xv qqj wpk zzv nnq"))
    val df = (common ++ probe).toDF("doc_id", "text")
    val ppl = graft.operators.TextAnalysis.lmPerplexity(df, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toMap
    assert(ppl(100L) < ppl(101L),
      s"common-bigram doc must beat gibberish: ${ppl(100L)} vs ${ppl(101L)}")
    assert(ppl(100L) > 1.0, "perplexity is bounded below by 1")
  }

  test("chunkDocuments: overlap continuity, exact token windows, short-doc identity") {
    import spark.implicits._
    val words = (1 to 100).map(i => s"w$i")
    val df = Seq(
      (1L, words.mkString(" ")),       // 100 tokens -> 2 chunks at 64/16
      (2L, "one two three"),           // short doc -> single chunk, identity
      (3L, words.take(64).mkString(" "))) // exactly maxTokens -> single chunk
      .toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis
      .chunkDocuments(df, "doc_id", "text", maxTokens = 64, overlap = 16)
      .collect()
      .groupBy(_.getLong(0)).view
      .mapValues(_.sortBy(_.getLong(1)).map(r => (r.getString(2), r.getLong(3))).toSeq)
      .toMap
    // doc 1: chunk 0 = tokens 1..64, chunk 1 = tokens 49..100 (16 overlap)
    assert(out(1L).map(_._2) == Seq(64L, 52L))
    assert(out(1L)(0)._1 == words.take(64).mkString(" "))
    assert(out(1L)(1)._1 == words.slice(48, 100).mkString(" "))
    // consecutive chunks share exactly `overlap` tokens
    val tail0 = out(1L)(0)._1.split(" ").takeRight(16).toSeq
    val head1 = out(1L)(1)._1.split(" ").take(16).toSeq
    assert(tail0 == head1, "overlap tokens must carry between chunks")
    // short docs come back whole, once
    assert(out(2L) == Seq(("one two three", 3L)))
    assert(out(3L) == Seq((words.take(64).mkString(" "), 64L)))
  }

  test("redactPii scrubs emails/phones/IPs to typed tokens and counts on the original") {
    import spark.implicits._
    val df = Seq(
      (1L, "mail a.b+c@ex-ample.org and b@x.io, call +1 555-123-4567, ip 10.0.0.255 ok"),
      (2L, "(415) 555-0199 twice (415) 555-0199"),
      (3L, "nothing sensitive here")).toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis.redactPii(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out(1L)._1 == "mail [EMAIL] and [EMAIL], call [PHONE], ip [IP] ok")
    assert((out(1L)._2, out(1L)._3, out(1L)._4) == ((2L, 1L, 1L)))
    assert(out(2L)._1 == "[PHONE] twice [PHONE]" && out(2L)._3 == 2L)
    assert(out(3L) == (("nothing sensitive here", 0L, 0L, 0L)))
  }

  test("MisraGriesAggregator: sketch survivors cover true heavy hitters across partitions") {
    import spark.implicits._
    // Zipf-ish stream: item i appears 1000/i times, plus 5000 singletons,
    // scattered across 16 partitions — the merge path is exercised hard
    val rows = (1 to 50).flatMap(i => Seq.fill(1000 / i)(s"hot$i")) ++
      (1 to 5000).map(i => s"rare$i")
    val ds = spark.createDataset(scala.util.Random.shuffle(rows)).repartition(16).as[String]
    val agg = new graft.operators.MisraGriesAggregator(256).toColumn.name("survivors")
    val survivors = ds.select(agg).collect().head.toSet
    // capacity 256 on ~13.5k items -> every item with count > N/256 (~53)
    // must survive; hot1..hot18 have counts 1000..55
    (1 to 18).foreach(i => assert(survivors.contains(s"hot$i"), s"lost hot$i"))
    assert(survivors.size <= 256, "sketch must respect its capacity bound")
    // deterministic direct-merge trim check: the union sketch subtracts the
    // overflow order statistic, never evicting a dominant key
    val m = new graft.operators.MisraGriesAggregator(2)
    // sum = {a:150, b:2, c:1}, overflow 1 -> delta = smallest count (1):
    // c drops out, the others keep count - 1
    val merged = m.merge(Map("a" -> 100L, "b" -> 2L), Map("c" -> 1L, "a" -> 50L))
    assert(merged == Map("a" -> 149L, "b" -> 1L), s"got $merged")
  }
}
