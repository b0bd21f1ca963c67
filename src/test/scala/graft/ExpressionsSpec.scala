package graft

import graft.functions.{GraftHash, HashFunctions, VectorFunctions}
import graft.functions.GraftFunctions._
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the portable-hash contract (values must equal DuckDB's
  * `CAST(('0x'||substr(md5(s),1,15)) AS BIGINT)`) and the kernel expressions.
  */
class ExpressionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("hash60 equals the DuckDB oracle constant") {
    // SELECT CAST(('0x' || substr(md5('hello'),1,15)) AS BIGINT) = 419982666956583591
    assert(GraftHash.hash60("hello") == 419982666956583591L)
    // column-level helper agrees with the JVM-side implementation
    val got = Seq("hello", "", "spark graft", "日本語").toDF("s")
      .select(col("s"), graftHash(col("s")).as("h"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((s, h) <- got) assert(h == GraftHash.hash60(s), s"mismatch for '$s'")
  }

  test("cosine expression: exact values, nulls, length mismatch") {
    val df = Seq(
      (Array(1.0f, 0.0f), Array(1.0f, 0.0f)),
      (Array(1.0f, 0.0f), Array(0.0f, 1.0f)),
      (Array(1.0f, 2.0f), Array(2.0f, 1.0f))
    ).toDF("a", "b").select(VectorFunctions.cosineSim(col("a"), col("b")).as("c"))
    val got = df.collect().map(_.getDouble(0))
    assert(got(0) == 1.0)
    assert(got(1) == 0.0)
    assert(math.abs(got(2) - 0.8) < 1e-12)

    val mismatch = Seq((Array(1.0f), Array(1.0f, 2.0f))).toDF("a", "b")
      .select(VectorFunctions.cosineSim(col("a"), col("b")).as("c"))
    assert(mismatch.collect()(0).isNullAt(0))
  }

  test("cosine expression matches the HOF fallback bit-for-bit") {
    val e = Tables.load(spark, "/root/testdata/sf0.001", "embeddings").limit(50)
    val both = e.select(
      VectorFunctions.cosineSim(col("embedding"), col("embedding")).as("expr"),
      cosine(col("embedding"), col("embedding")).as("hof"))
    assert(both.filter(col("expr") =!= col("hof")).count() == 0)
  }

  test("simhash60 is deterministic and respects multiset weights") {
    val df = Seq(
      (1L, Seq("a", "b", "a")),
      (2L, Seq("a", "b", "a")), // identical multiset -> identical simhash
      (3L, Seq("a", "b"))       // different multiset -> may differ
    ).toDF("id", "toks").select(col("id"), HashFunctions.simhash60(col("toks")).as("sh"))
    val m = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(1L) == m(2L))
    assert(m(1L) >= 0L && m(1L) < (1L << 60))
  }

  test("minhash signature equals the universal-hash formula") {
    val toks = Seq("x", "y", "z", "w") // 3-shingles: "x y z", "y z w"
    val sh = Seq("x y z", "y z w")
    val df = Seq(Tuple1(toks)).toDF("toks")
      .select(HashFunctions.minhashSig(col("toks"), 3, 8).as("sig"))
    val sig = df.collect()(0).getSeq[Long](0)
    val expected = (0 until 8).map { p =>
      sh.map(s => GraftHash.perm(p, GraftHash.hash60(s))).min
    }
    assert(sig == expected)
    // shingle hashes: distinct, order-preserving, matches hash60 directly
    val hs = Seq(Tuple1(toks)).toDF("toks")
      .select(HashFunctions.shingleHashes(col("toks"), 3).as("hs"))
      .collect()(0).getSeq[Long](0)
    assert(hs == sh.map(GraftHash.hash60))
    // fewer than k tokens -> null signature, empty shingle set
    val empty = Seq(Tuple1(Seq("a", "b"))).toDF("toks")
      .select(HashFunctions.minhashSig(col("toks"), 3, 8).as("sig"),
        HashFunctions.shingleHashes(col("toks"), 3).as("hs"))
    val r = empty.collect()(0)
    assert(r.isNullAt(0))
    assert(r.getSeq[Long](1).isEmpty)
  }

  test("MinHash-LSH finds exactly the exact-Jaccard pairs at J>=0.7 (sf0.001)") {
    val dir = "/root/testdata/sf0.001"
    val lsh = Catalog.byName("q17_minhash_lsh").fn(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Catalog.byName("q43_ngram_jaccard").fn(spark, dir)
      .filter(col("j") >= 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh == exact, "LSH with 64 bands x 2 rows must have full recall at J>=0.7 here")
    assert(exact.nonEmpty, "test data should contain near-duplicate documents")
  }

  test("k-means training improves the IVF codebook objective") {
    import graft.operators.Similarity
    val e = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val naive = e.filter(col("vec_id") < 8)
      .select(col("vec_id").cast("long").as("cid"), col("embedding").cast("array<double>").as("cv"))
    val trained = Similarity.trainKMeans(e, "vec_id", "embedding", k = 8, iterations = 3)
    assert(trained.count() <= 8)
    val before = Similarity.assignmentObjective(e, naive, "embedding")
    val after = Similarity.assignmentObjective(e, trained, "embedding")
    assert(after >= before, s"objective should not regress: $before -> $after")
    // trained centroids also serve ivfTopK
    val q = e.filter(col("vec_id") < 3).select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val res = Similarity.ivfTopK(e, q, trained, "vec_id", "embedding", k = 5, nProbe = 3)
    assert(res.groupBy("query_id").count().collect().forall(_.getLong(1) == 5))
  }

  test("approx_count_distinct is within 5% of exact") {
    val dir = "/root/testdata/sf0.001"
    val lineitem = Tables.load(spark, dir, "lineitem")
    val approx = lineitem.select(approx_count_distinct("l_partkey")).first().getLong(0)
    val exact = lineitem.select(countDistinct("l_partkey")).first().getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.05)
    // the catalog entry outputs the (looser, 3-sigma) bound as a boolean the
    // cross-engine oracle can reproduce
    assert(Catalog.byName("q35_approx_distinct").fn(spark, dir).first().getBoolean(0))
  }

  test("token_stats fuses count/distinct/top-count into one pass") {
    import spark.implicits._
    import graft.functions.TextFunctions.tokenStats
    val df = Seq(
      (1L, Some(Seq("a", "b", "a", "a"))),
      (2L, Some(Seq.empty[String])),
      (3L, Some(Seq("x"))),
      (4L, None)).toDF("id", "toks")
    val got = df.select(col("id"), tokenStats(col("toks")).as("s"))
      .select(col("id"), col("s.n_tok"), col("s.n_distinct"), col("s.top_cnt"), col("s").isNull.as("isnull"))
      .collect().map(r => r.getLong(0) ->
        (if (r.getBoolean(4)) None else Some((r.getInt(1), r.getInt(2), r.getInt(3))))).toMap
    assert(got(1L).contains((4, 2, 3)))
    assert(got(2L).contains((0, 0, 0)))
    assert(got(3L).contains((1, 1, 1)))
    assert(got(4L).isEmpty, "null token array must yield a null struct")
  }

  test("GraftExtensions injects the kernel functions at session build time") {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.functions.GraftExtensions().apply(ext)
    val reg = org.apache.spark.sql.graft.ExtensionsBridge.applyFunctions(
      ext, new org.apache.spark.sql.catalyst.analysis.SimpleFunctionRegistry)
    val names = graft.functions.Registry.builders.map(_._1)
    names.foreach { n =>
      assert(reg.functionExists(FunctionIdentifier(n)), s"$n not injected")
    }
    // the injected builder constructs the real kernel expression
    val lit = org.apache.spark.sql.catalyst.expressions.Literal.create(
      Seq("a", "b"), org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType))
    val e = reg.lookupFunction(FunctionIdentifier("graft_simhash60"), Seq(lit))
    assert(e.isInstanceOf[graft.functions.SimHash60])
  }

  test("KLL sketch aggregate: quantiles within rank tolerance, nulls skipped") {
    import graft.functions.KllFunctions._
    // 1..10000 shuffled deterministically; exact p-quantile is ~p*10000
    val df = (1 to 10000).map(i => ((i * 7919) % 10000).toDouble)
      .toDF("v").union(Seq.empty[Double].toDF("v"))
    val sk = df.agg(kllSketchAgg(col("v")).as("sk"))
      .select(
        kllQuantile(col("sk"), 0.5).as("p50"),
        kllQuantile(col("sk"), 0.9).as("p90"))
      .collect().head
    // k=200 rank error ≈1.65%; allow ±3% rank → ±300 in value on uniform data
    assert(math.abs(sk.getDouble(0) - 5000.0) <= 300.0, s"p50=${sk.getDouble(0)}")
    assert(math.abs(sk.getDouble(1) - 9000.0) <= 300.0, s"p90=${sk.getDouble(1)}")
    // nulls skipped: only nulls → empty sketch → null quantile
    val nullRow = Seq[Option[Double]](None, None).toDF("v")
      .agg(kllSketchAgg(col("v")).as("sk"))
      .select(kllQuantile(col("sk"), 0.5).as("q")).collect().head
    assert(nullRow.isNullAt(0))
  }

  test("KLL merge: union of per-group sketches estimates the full data") {
    import graft.functions.KllFunctions._
    val df = (1 to 8000).map(i => (i % 4, ((i * 104729) % 8000).toDouble)).toDF("g", "v")
    val merged = df.groupBy("g").agg(kllSketchAgg(col("v")).as("sk"))
      .agg(kllMergeAgg(col("sk")).as("sk"))
      .select(kllQuantile(col("sk"), 0.5).as("p50")).collect().head.getDouble(0)
    assert(math.abs(merged - 4000.0) <= 300.0, s"merged p50=$merged")
  }

  test("KLL pairwise merge equals sketching the union") {
    import graft.functions.KllFunctions._
    val a = (1 to 5000).map(_.toDouble).toDF("v").agg(kllSketchAgg(col("v")).as("sk"))
    val b = (5001 to 10000).map(_.toDouble).toDF("v").agg(kllSketchAgg(col("v")).as("sk"))
    val merged = a.crossJoin(b.withColumnRenamed("sk", "sk2"))
      .select(kllQuantile(kllMerge(col("sk"), col("sk2")), 0.5).as("p50"))
      .collect().head.getDouble(0)
    assert(math.abs(merged - 5000.0) <= 300.0, s"pairwise-merged p50=$merged")
  }

  test("KLL functions are SQL-registered (graft_kll_*)") {
    graft.functions.Registry.registerAll(spark)
    val got = spark.sql(
      """SELECT graft_kll_quantile(sk, CAST(0.5 AS DOUBLE)) AS p50 FROM (
        |  SELECT graft_kll_merge_agg(sk, 200) AS sk FROM (
        |    SELECT graft_kll_sketch_agg(CAST(id AS DOUBLE), 200) AS sk
        |    FROM range(1, 10001) GROUP BY id % 8))""".stripMargin)
      .collect().head.getDouble(0)
    assert(math.abs(got - 5000.0) <= 300.0, s"sql p50=$got")
  }
}
