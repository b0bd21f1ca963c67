package graft

import java.nio.file.Files

import graft.operators.{IvfIndex, Similarity}
import graft.functions.VectorFunctions.{packVector, unpackVector}
import graft.sources.reftable.{RefTableOptions, SnapshotFiles}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.scalatest.funsuite.AnyFunSuite

import scala.jdk.CollectionConverters._

/** The IVF index as a table layout: probing the published cell-partitioned
  * reftable must (a) return exactly what the per-run [[Similarity.ivfTopK]]
  * computes, and (b) PLAN only the probed cells' files — the point of
  * persisting the assignment is that listing pruning serves the probe.
  */
class IvfIndexSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def tmpDir(name: String): String =
    Files.createTempDirectory(s"graft_ivfidx_$name").toString

  // deterministic unit-ish vectors, 8 dims, clustered around 4 axes so
  // k-means-free fixed centroids (the 4 axis vectors) separate them
  private def corpus(n: Int) = {
    import spark.implicits._
    (0 until n).map { i =>
      val axis = i % 4
      val v = Array.tabulate(8)(d =>
        (if (d == axis * 2) 1.0 else 0.0) + (i % 7) * 0.01 * ((d + i) % 3))
      (i.toLong, v)
    }.toDF("vec_id", "embedding")
  }

  private def centroids = {
    import spark.implicits._
    (0 until 4).map { a =>
      (a.toLong, Array.tabulate(8)(d => if (d == a * 2) 1.0 else 0.0))
    }.toDF("cid", "cv")
  }

  test("pack/unpack vector is value-identity for double and float arrays") {
    import spark.implicits._
    val d = Seq((1L, Array(1.5, -2.25, 0.0, Double.MinPositiveValue))).toDF("id", "v")
    val back = d.select(unpackVector(packVector(col("v"))).as("v"))
      .as[Array[Double]].head()
    assert(back.toSeq == Seq(1.5, -2.25, 0.0, Double.MinPositiveValue))
    val f = Seq((1L, Array(1.5f, -2.25f, 3.0f))).toDF("id", "v")
    val backF = f.select(unpackVector(packVector(col("v"))).as("v"))
      .as[Array[Double]].head()
    assert(backF.toSeq == Seq(1.5, -2.25, 3.0), "float widens losslessly")
    // empty vector round-trips; null stays null
    val e = Seq((1L, Array.empty[Double])).toDF("id", "v")
    assert(e.select(unpackVector(packVector(col("v"))).as("v"))
      .as[Array[Double]].head().isEmpty)
  }

  test("indexed probe == per-run ivfTopK, bit-identically") {
    val c = corpus(400)
    val q = c.filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val root = tmpDir("eq")
    IvfIndex.build(c, centroids, "vec_id", "embedding", root)
    val indexed = IvfIndex.topK(spark, root, q, k = 5, nProbe = 2)
      .orderBy("query_id", "rk").collect().toSeq
    val direct = Similarity.ivfTopK(c, q, centroids, "vec_id", "embedding", k = 5, nProbe = 2)
      .orderBy("query_id", "rk").collect().toSeq
    assert(indexed.nonEmpty && indexed == direct)
  }

  test("probe plans only the probed cells' files (listing pruning serves the index)") {
    val root = tmpDir("prune")
    IvfIndex.build(corpus(400), centroids, "vec_id", "embedding", root)
    val o = RefTableOptions.from(new CaseInsensitiveStringMap(Map(
      "path" -> root, "schema" -> "id BIGINT, cell BIGINT, vec BINARY",
      "partitionColumns" -> "cell").asJava))
    val all = SnapshotFiles.pruned(o, Nil)
    val cells = all.map(_.partitionValues("cell")).toSet
    assert(cells == Set("0", "1", "2", "3"), s"expected 4 cell partitions, got $cells")
    // the internal pruning API keeps exactly the probed cells' files
    val probed = SnapshotFiles.pruned(o,
      Seq(org.apache.spark.sql.sources.In("cell", Array[Any](1L, 3L))))
    assert(probed.nonEmpty &&
      probed.map(_.partitionValues("cell")).toSet == Set("1", "3"))
    // and the DataFrame path really plans the pruned listing
    val df = IvfIndex.readCells(spark, root, Seq(1L, 3L))
    val scans = df.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => s
    }
    assert(scans.nonEmpty && scans.head.partitions.size == probed.size,
      s"probe must plan only probed cells' files: ${scans.map(_.partitions.size)} vs ${probed.size}")
    // value check: only cells 1 and 3 rows come back
    val got = df.select("cell").distinct().collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 3L))
  }

  test("SQ8 over the layout: codes-only probe scan, pruned files, exact limit, recall") {
    import graft.operators.Sq
    val c = corpus(400)
    val q = c.filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val params = Sq.train(c, "embedding")
    val root = tmpDir("sq")
    IvfIndex.buildSq(c, centroids, params, "vec_id", "embedding", root)
    // exact limit: every cell probed, refine past the corpus — must equal
    // the brute-force top-k (plumbing: encode, pruned ADC scan, re-rank)
    val exact = Similarity.cosineTopK(c, q, "vec_id", "embedding", k = 5)
      .orderBy("query_id", "rk").collect().toSeq
    val limit = IvfIndex.sqTopK(spark, root, q, params, k = 5, nProbe = 4, refine = 100)
      .orderBy("query_id", "rk").collect().toSeq
    assert(limit.nonEmpty && limit == exact,
      "all-cells + unbounded refine must degenerate to brute force")
    // production settings: recall@5 within the probed scope stays high at
    // fixed refine (SQ8 fidelity), and both scans (codes + re-rank
    // vectors) plan only the probed cells' files
    val res = IvfIndex.sqTopK(spark, root, q, params, k = 5, nProbe = 2, refine = 4)
    val got = res.select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivfExact = Similarity.ivfTopK(c, q, centroids, "vec_id", "embedding", k = 5, nProbe = 2)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (got & ivfExact).size.toDouble / ivfExact.size
    info(s"SQ8-over-IVF recall@5 (same probe scope) = $recall")
    assert(recall >= 0.9, s"SQ8 ADC recall $recall too low at refine=4")
    // plan: the probed subset's file count for each scan; the codes scan's
    // schema must not contain the packed vector column
    val o = RefTableOptions.from(new CaseInsensitiveStringMap(Map(
      "path" -> root, "schema" -> "id BIGINT, cell BIGINT, vec BINARY, sq BINARY",
      "partitionColumns" -> "cell").asJava))
    val cells = IvfIndex.probedCells(spark, root, q, nProbe = 2)
    val prunedFiles = SnapshotFiles.pruned(o,
      Seq(org.apache.spark.sql.sources.In("cell", cells.map(_.asInstanceOf[Any]).toArray))).size
    val codesDf = IvfIndex.readCellCodes(spark, root, cells)
    val codeScans = codesDf.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => s
    }
    assert(codeScans.nonEmpty && codeScans.forall(_.partitions.size == prunedFiles),
      s"codes scan must plan only probed cells' files")
    assert(codeScans.forall(!_.scan.readSchema().fieldNames.contains("vec")),
      "the ADC scan must not read the packed vector column")
  }

  test("filtered SQ8 probe: predicate inside the probed-cell codes scan; exact limit; recall") {
    import graft.operators.Sq
    val c = corpus(400).withColumn("label", (col("vec_id") % 3).cast("int"))
    val q = c.filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val params = Sq.train(c, "embedding")
    val root = tmpDir("sqfilt")
    IvfIndex.buildSq(c, centroids, params, "vec_id", "embedding", root,
      metaCols = Seq("label"))
    // exact limit: all cells + refine past the corpus must equal the
    // label-filtered brute force (the q240 oracle shape)
    val exact = Similarity.cosineTopK(
      c.filter(col("label") === 1), q, "vec_id", "embedding", k = 5)
      .orderBy("query_id", "rk").collect().toSeq
    val limit = IvfIndex.sqTopKFiltered(spark, root, q, params,
      col("label") === 1, k = 5, nProbe = 4, refine = 200)
      .orderBy("query_id", "rk").collect().toSeq
    assert(limit.nonEmpty && limit == exact,
      "all-cells + unbounded refine must degenerate to the filtered brute force")
    // production probe settings: refine is k·refine over the FILTERED
    // candidates, so recall within the probed scope holds without
    // over-fetch — compare against the exact filtered rank inside the
    // same probed cells
    val cells = IvfIndex.probedCells(spark, root, q, nProbe = 2)
    val scoped = IvfIndex.readCells(spark, root, cells)
      .select(col("id").as("vec_id"),
        graft.functions.VectorFunctions.unpackVector(col("vec")).as("embedding"))
      .join(c.select(col("vec_id"), col("label")), "vec_id")
      .filter(col("label") === 1)
    val scopedExact = Similarity.cosineTopK(scoped, q, "vec_id", "embedding", k = 5)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = IvfIndex.sqTopKFiltered(spark, root, q, params,
      col("label") === 1, k = 5, nProbe = 2, refine = 4)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (got & scopedExact).size.toDouble / scopedExact.size
    info(s"filtered SQ8-over-IVF recall@5 (same probe scope) = $recall")
    assert(recall >= 0.9, s"filtered ADC recall $recall too low at refine=4")
    // plan: the predicate is PUSHED into the codes scan (row-group/page
    // skipping + residual), the scan plans only the probed cells' files,
    // and it still never reads the packed vector column
    val codesDf = IvfIndex.readCellCodes(spark, root, cells, "label INT")
      .filter(col("label") === 1)
    val planStr = codesDf.queryExecution.executedPlan.toString
    assert(planStr.contains("PushedFilters: [") && planStr.contains("EqualTo(label,1)"),
      s"label predicate must push into the reftable scan:\n$planStr")
    val o = RefTableOptions.from(new CaseInsensitiveStringMap(Map(
      "path" -> root, "schema" -> "id BIGINT, cell BIGINT, label INT, vec BINARY, sq BINARY",
      "partitionColumns" -> "cell").asJava))
    val prunedFiles = SnapshotFiles.pruned(o,
      Seq(org.apache.spark.sql.sources.In("cell", cells.map(_.asInstanceOf[Any]).toArray))).size
    val codeScans = codesDf.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => s
    }
    assert(codeScans.nonEmpty && codeScans.forall(_.partitions.size == prunedFiles),
      "filtered codes scan must plan only probed cells' files")
    assert(codeScans.forall(!_.scan.readSchema().fieldNames.contains("vec")),
      "the filtered ADC scan must not read the packed vector column")
  }

  test("metaCols layout: maintenance carries meta, missing meta fails loudly, sidecar drives the probe") {
    import spark.implicits._
    import graft.operators.Sq
    val c = corpus(200).withColumn("label", (col("vec_id") % 3).cast("int"))
    val params = Sq.train(c, "embedding")
    val root = tmpDir("sqmetamaint")
    IvfIndex.buildSq(c, centroids, params, "vec_id", "embedding", root,
      metaCols = Seq("label"))
    assert(IvfIndex.readMetaSchema(spark, root) == Seq(("label", "INT")),
      "buildSq must persist the meta schema next to the layout")
    def bi(rows: Seq[(Long, Option[Array[Double]], Option[Array[Double]], String)]) =
      rows.toDF("id", "vb", "va", "change_type")
        .select(col("id"), packVector(col("vb")).as("vec_before"),
          packVector(col("va")).as("vec_after"), col("change_type"))
    val insVec = (i: Int) => Array.tabulate(8)(d => if (d == 0) 1.0 else 0.001 * d)
    val w = Seq((5000L, None: Option[Array[Double]], Some(insVec(1)), "insert"),
      (7L, Some(c.filter(col("vec_id") === 7L).select("embedding")
        .as[Array[Double]].head()), None: Option[Array[Double]], "delete"))
    // a change batch WITHOUT the layout's meta column is rejected up front
    val noMeta = intercept[IllegalArgumentException] {
      IvfIndex.updateFromChangesSq(spark, root, bi(w))
    }
    assert(noMeta.getMessage.contains("metadata column"), noMeta.getMessage)
    // with after-image meta the wave merges, and the maintained layout is
    // bit-equal to a from-scratch meta build over the churned corpus
    IvfIndex.updateFromChangesSq(spark, root, bi(w).withColumn("label", lit(2)))
    val finalC = c.filter(col("vec_id") =!= 7L)
      .unionAll(Seq((5000L, insVec(1), 2)).toDF("vec_id", "embedding", "label"))
    val rebuildRoot = tmpDir("sqmetamaint_rb")
    IvfIndex.buildSq(finalC, centroids, params, "vec_id", "embedding", rebuildRoot,
      metaCols = Seq("label"))
    def dump(r: String) = spark.read.format("reftable")
      .option("path", r)
      .option("schema", "id BIGINT, cell BIGINT, label INT, vec BINARY, sq BINARY")
      .option("partitionColumns", "cell").load()
      .select(col("id"), col("cell"), col("label"),
        lower(hex(col("vec"))).as("v"), lower(hex(col("sq"))).as("sq"))
      .orderBy("id").collect().toSeq
    val maintained = dump(root)
    assert(maintained.nonEmpty && maintained == dump(rebuildRoot),
      s"first divergence: ${maintained.zip(dump(rebuildRoot)).find(p => p._1 != p._2)}")
    // the filtered probe derives its meta DDL from the sidecar — the
    // maintained row is findable by its metadata
    val q = c.filter(col("vec_id") < 2)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    assert(IvfIndex.sqTopKFiltered(spark, root, q, params, col("label") === 2,
      k = 3, nProbe = 4, refine = 100).count() > 0)
    // and a plain (no-meta) layout refuses a filtered probe loudly
    val plainRoot = tmpDir("sqnometa")
    IvfIndex.buildSq(corpus(50), centroids, params, "vec_id", "embedding", plainRoot)
    val noLayoutMeta = intercept[IllegalArgumentException] {
      IvfIndex.sqTopKFiltered(spark, plainRoot, q, params, col("label") === 2, k = 3)
    }
    assert(noLayoutMeta.getMessage.contains("without metaCols"))
  }

  test("SQ8 encode path is codegen'd: no ScalaUDF node, expression == kernel") {
    import graft.operators.Sq
    // repartition keeps Catalyst from folding the local relation away —
    // the projection must show up as a real codegen'd stage
    val c = corpus(60).repartition(2)
    val params = Sq.train(c, "embedding")
    val enc = Sq.encode(c, params, "vec_id", "embedding")
    enc.collect() // finalize AQE so the executed plan shows codegen stages
    val analyzed = enc.queryExecution.analyzed.toString
    val physical = enc.queryExecution.executedPlan.toString
    assert(!analyzed.contains("UDF(") && !physical.contains("BatchEvalPython"),
      s"encode must not plan a UDF:\n$analyzed")
    // the `*(n)` prefix is the whole-stage-codegen marker in AQE's final
    // plan rendering; the sqencode projection must carry it
    assert(physical.split("\n").exists(l => l.contains("sqencode") &&
      l.trim.matches("""(\+- )?\*\(\d+\) Project.*""")),
      s"encode projection must stay inside whole-stage codegen:\n$physical")
    // interpreted (nullSafeEval) and codegen paths agree, and a
    // dimension-mismatched vector yields NULL codes on the bare path
    import spark.implicits._
    val rows = Seq(
      (1L, Array(0.5, 0.1, 0.0, 1.0, 0.3, 0.2, 0.9, 0.7)),
      (2L, Array(1.0, 0.0))).toDF("vec_id", "embedding")
    val got = Sq.encode(rows, params, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(got(2L).isEmpty, "dim mismatch must yield null codes on the bare encode")
    assert(got(1L).nonEmpty && got(1L).get.asInstanceOf[Array[Byte]].length == params.dim)
    // ranges ride as Seq params, so two SqEncode nodes built from DISTINCT
    // but value-equal range arrays canonicalize together (array-typed
    // params would compare by reference and defeat CSE / exchange reuse).
    // Compared post-analysis: both projections share one resolved child,
    // leaving the range params as the only equality axis.
    val two = c.select(
      graft.functions.VectorFunctions
        .sqEncode(col("embedding"), params.lo.clone(), params.hi.clone()).as("a"),
      graft.functions.VectorFunctions
        .sqEncode(col("embedding"), params.lo, params.hi).as("b"))
    val nodes = two.queryExecution.analyzed.expressions
      .flatMap(_.collect { case s: graft.functions.SqEncode => s })
    assert(nodes.size == 2 && nodes(0).semanticEquals(nodes(1)),
      "value-equal SQ ranges must produce semantically equal expressions")
  }

  test("buildSq rejects unencodable vectors instead of writing null codes") {
    import spark.implicits._
    import graft.operators.Sq
    val c = corpus(50)
    val params = Sq.train(c, "embedding")
    // one truncated vector: codesUdf would yield null codes — the row would
    // show up in topK but silently vanish from sqTopK's ADC path
    val bad = c.union(Seq((9999L, Array(1.0, 0.0))).toDF("vec_id", "embedding"))
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    val e = intercept[Exception] {
      IvfIndex.buildSq(bad, centroids, params, "vec_id", "embedding", tmpDir("sqbad"))
    }
    assert(msgs(e).exists(_.contains("null SQ codes")), s"wrong error: ${msgs(e)}")
    // a correct-dimension vector with a NULL ELEMENT slot is just as
    // unencodable (the getter would read an undefined/zero value): bare
    // encode yields NULL, and the layout build rejects it loudly
    val nullElem = spark.range(1).select(lit(9998L).as("vec_id"),
      array((0 until 8).map(i =>
        if (i == 3) lit(null).cast("double") else lit(i.toDouble)): _*).as("embedding"))
    val bare = nullElem.select(graft.functions.VectorFunctions
      .sqEncode(col("embedding"), params.lo, params.hi).as("sq")).head()
    assert(bare.isNullAt(0), "null-element vector must encode to NULL, not zero-coded bytes")
    val e2 = intercept[Exception] {
      IvfIndex.buildSq(c.unionAll(nullElem), centroids, params,
        "vec_id", "embedding", tmpDir("sqbadnull"))
    }
    assert(msgs(e2).exists(_.contains("null SQ codes")), s"wrong error: ${msgs(e2)}")
  }

  test("admission gate plans only probed cells' files and matches the direct join") {
    import spark.implicits._
    val c = corpus(400)
    val root = tmpDir("admit")
    IvfIndex.build(c, centroids, "vec_id", "embedding", root)
    // a batch hugging axis 0: every probe (nProbe=1) lands in cell 0
    val batch = (0 until 5).map { i =>
      (10000L + i, Array.tabulate(8)(d => (if (d == 0) 1.0 else 0.0) + i * 0.001))
    }.toDF("vec_id", "embedding")
    val adm = IvfIndex.admitAgainst(spark, root, batch, "vec_id", "embedding",
      threshold = 0.9, nProbe = 1)
    // plan check: only cell 0's files are planned (descend through AQE)
    def scansOf(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.datasources.v2.BatchScanExec] =
      p.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => Seq(b)
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          scansOf(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          scansOf(q.plan)
      }.flatten
    adm.collect()
    val scans = scansOf(adm.queryExecution.executedPlan)
    val o = RefTableOptions.from(new CaseInsensitiveStringMap(Map(
      "path" -> root, "schema" -> "id BIGINT, cell BIGINT, vec BINARY",
      "partitionColumns" -> "cell").asJava))
    val cell0Files = SnapshotFiles.pruned(o,
      Seq(org.apache.spark.sql.sources.In("cell", Array[Any](0L)))).size
    val allFiles = SnapshotFiles.pruned(o, Nil).size
    assert(cell0Files < allFiles, "test needs >1 cell to prove pruning")
    assert(scans.nonEmpty && scans.exists(_.partitions.size == cell0Files),
      s"admission must plan only probed cells' files: ${scans.map(_.partitions.size)} " +
        s"vs $cell0Files; plan:\n${adm.queryExecution.executedPlan.treeString}")
    // value check: equals the direct cell-scoped cross join
    val assigned = Similarity.assignCells(c, centroids, "vec_id", "embedding")
      .filter(col("cell") === 0L)
      .select(col("vec_id").as("corpus_id"), col("embedding").as("cv"))
    val direct = batch.crossJoin(assigned)
      .withColumn("sim", graft.functions.GraftFunctions.r6(
        graft.functions.VectorFunctions.cosineSim(
          col("embedding").cast("array<double>"), col("cv").cast("array<double>"))))
      .filter(col("sim") >= 0.9)
      .select(col("vec_id").as("batch_id"), col("corpus_id"), col("sim"))
      .orderBy("batch_id", "corpus_id").collect().toSeq
    val got = adm.orderBy("batch_id", "corpus_id").collect().toSeq
    assert(got.nonEmpty && got == direct)
  }

  test("changefeed maintenance equals rebuild and stages only affected cells") {
    import spark.implicits._
    val c = corpus(400)
    val root = tmpDir("maint")
    IvfIndex.build(c, centroids, "vec_id", "embedding", root)

    // inserts: 10 fresh axis-0 vectors (all land in cell 0);
    // deletes: three existing cell-1 members (ids ≡1 mod 4). Both-images
    // shape (VersionedTable.changesImages): before NULL for inserts,
    // after NULL for deletes.
    val insVec = (i: Int) => Array.tabulate(8)(d => if (d == 0) 1.0 else 0.001 * d)
    val ins = (1000 until 1010).map(i =>
      (i.toLong, None: Option[Array[Double]], Some(insVec(i)), "insert"))
    val delIds = Seq(1L, 5L, 9L)
    val oldVecs = c.filter(col("vec_id").isin(delIds: _*))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val del = delIds.map(id => (id, Some(oldVecs(id)), None: Option[Array[Double]], "delete"))
    val changes = (ins ++ del).toDF("id", "vb", "va", "change_type")
      .select(col("id"), packVector(col("vb")).as("vec_before"),
        packVector(col("va")).as("vec_after"), col("change_type"))
    IvfIndex.updateFromChanges(spark, root, changes)

    // result == full reassignment of the post-change corpus
    val expected = Similarity.assignCells(
        c.filter(!col("vec_id").isin(delIds: _*))
          .unionAll((1000 until 1010).map(i => (i.toLong, insVec(i))).toDF("vec_id", "embedding")),
        centroids, "vec_id", "embedding")
      .select(col("vec_id").as("id"), col("cell"))
      .orderBy("id").collect().toSeq
    val got = IvfIndex.readCells(spark, root, Seq(0L, 1L, 2L, 3L))
      .select("id", "cell").orderBy("id").collect().toSeq
    assert(got == expected)

    // O(affected files): the maintenance version physically stages data
    // only under the touched cells (0: inserts, 1: deletes) — cells 2/3
    // ride the manifest by reference
    val cur = graft.sources.reftable.VersionedTable
      .resolve(root, new org.apache.hadoop.conf.Configuration()).get
    val staged = SnapshotFiles.listPhysical(cur, Seq("cell"))
    val stagedCells = staged.map(_.partitionValues("cell")).toSet
    assert(stagedCells.subsetOf(Set("0", "1")),
      s"maintenance must not rewrite unaffected cells; staged: $stagedCells")
  }

  test("SQ8 changefeed maintenance: maintained codes == full rebuild after two waves") {
    import spark.implicits._
    import graft.operators.Sq
    val c = corpus(400)
    val params = Sq.train(c, "embedding") // trained ONCE, pinned by the layout
    val root = tmpDir("sqmaint")
    IvfIndex.buildSq(c, centroids, params, "vec_id", "embedding", root)
    assert(IvfIndex.readSqParams(spark, root).lo.toSeq == params.lo.toSeq,
      "buildSq must persist the trained ranges next to the layout")

    def bi(rows: Seq[(Long, Option[Array[Double]], Option[Array[Double]], String)]) =
      rows.toDF("id", "vb", "va", "change_type")
        .select(col("id"), packVector(col("vb")).as("vec_before"),
          packVector(col("va")).as("vec_after"), col("change_type"))
    val vecOf = c.collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    // wave 1: insert 10 axis-0 vectors, delete ids 1/5/9
    val insVec = (i: Int) => Array.tabulate(8)(d => if (d == 0) 1.0 else 0.001 * d)
    val w1 = (1000 until 1010).map(i =>
      (i.toLong, None: Option[Array[Double]], Some(insVec(i)), "insert")) ++
      Seq(1L, 5L, 9L).map(id => (id, Some(vecOf(id)), None: Option[Array[Double]], "delete"))
    IvfIndex.updateFromChangesSq(spark, root, bi(w1))
    // wave 2: update ids 2/6 (perturbed vectors — cell moves possible),
    // delete one wave-1 insert, insert one more
    val pert = (id: Long) => vecOf(id).zipWithIndex.map { case (x, d) => if (d == 1) x + 0.2 else x }
    val w2 = Seq(2L, 6L).map(id => (id, Some(vecOf(id)), Some(pert(id)), "update")) ++
      Seq((1003L, Some(insVec(1003)), None: Option[Array[Double]], "delete"),
        (2000L, None: Option[Array[Double]], Some(insVec(2000)), "insert"))
    IvfIndex.updateFromChangesSq(spark, root, bi(w2))

    // final corpus after both waves
    val finalC = c.filter(!col("vec_id").isin(1L, 5L, 9L, 2L, 6L))
      .unionAll(Seq(2L -> pert(2L), 6L -> pert(6L)).toDF("vec_id", "embedding"))
      .unionAll(((1000 until 1010).filter(_ != 1003).map(i => i.toLong -> insVec(i))
        :+ (2000L -> insVec(2000))).toDF("vec_id", "embedding"))
    // bit-equality: maintained table == a from-scratch buildSq over finalC
    val rebuildRoot = tmpDir("sqmaint_rebuild")
    IvfIndex.buildSq(finalC, centroids, params, "vec_id", "embedding", rebuildRoot)
    def dump(r: String) = spark.read.format("reftable")
      .option("path", r).option("schema", "id BIGINT, cell BIGINT, vec BINARY, sq BINARY")
      .option("partitionColumns", "cell").load()
      .select(col("id"), col("cell"), lower(hex(col("vec"))).as("v"),
        lower(hex(col("sq"))).as("sq"))
      .orderBy("id").collect().toSeq
    val maintained = dump(root)
    val rebuilt = dump(rebuildRoot)
    assert(maintained.nonEmpty && maintained == rebuilt,
      s"first divergence: ${maintained.zip(rebuilt).find(p => p._1 != p._2)}")

    // the probe over the maintained layout still plans only probed cells'
    // files, and its ADC scan still prunes the packed-vector column
    val q = finalC.filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val res = IvfIndex.sqTopK(spark, root, q, params, k = 5, nProbe = 2, refine = 4)
    assert(res.count() > 0)
    val cells = IvfIndex.probedCells(spark, root, q, nProbe = 2)
    val o = RefTableOptions.from(new CaseInsensitiveStringMap(Map(
      "path" -> root, "schema" -> "id BIGINT, cell BIGINT, vec BINARY, sq BINARY",
      "partitionColumns" -> "cell").asJava))
    val prunedFiles = SnapshotFiles.pruned(o,
      Seq(org.apache.spark.sql.sources.In("cell", cells.map(_.asInstanceOf[Any]).toArray))).size
    val allFiles = SnapshotFiles.pruned(o, Nil).size
    assert(prunedFiles < allFiles, "test needs unprobed cells to prove pruning")
    val codeScans = IvfIndex.readCellCodes(spark, root, cells)
      .queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => s
      }
    assert(codeScans.nonEmpty && codeScans.forall(_.partitions.size == prunedFiles),
      "maintained-layout probe must plan only probed cells' files")
    assert(codeScans.forall(!_.scan.readSchema().fieldNames.contains("vec")))
  }

  test("codebook reference path == literal fold, edge rows included") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("embedding", ArrayType(DoubleType, containsNull = false), nullable = true)))
    val rows = (0 until 200).map { i =>
      Row(i.toLong, Array.tabulate(8)(d => math.cos(i * 0.53 + d)).toSeq)
    } ++ Seq(
      Row(900L, null),                              // null vector
      Row(901L, Seq.empty[Double]),                 // empty vector
      Row(902L, Array.fill(8)(0.0).toSeq),          // zero norm -> NaN cosine
      Row(903L, Seq(1.0, 2.0, 3.0)))                // length mismatch vs dim-8 codebook
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4), schema)
    val cents = {
      import spark.implicits._
      (0 until 16).map(i =>
        (i.toLong, Array.tabulate(8)(d => math.sin(i * 0.37 + d)))).toDF("cid", "cv")
    }
    def cells(literal: Boolean) =
      Similarity.assignCellsVia(df, cents, "vec_id", "embedding", literal)
        .select("vec_id", "cell").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val lit = cells(literal = true)
    val ref = cells(literal = false)
    assert(lit.size == 204 && lit == ref)
    // the no-winner rows take the lowest cid on both paths
    assert(Seq(900L, 901L, 903L).forall(id => ref(id) == 0L))
  }

  test("k=16384 codebook: plan stays O(1), argmax correct") {
    import spark.implicits._
    val k = 16384
    val dim = 8
    val cb = (0 until k).map(i =>
      (i.toLong, Array.tabulate(dim)(d => math.sin(i * 0.37 + d))))
    val corpus = (0 until 64).map(i =>
      (i.toLong, Array.tabulate(dim)(d => math.cos(i * 0.53 + d))))
    val assigned = Similarity.assignCells(
      corpus.toDF("vec_id", "embedding"), cb.toDF("cid", "cv"), "vec_id", "embedding")
    // the literal fold at this k would put ~k*dim literals in the plan; the
    // reference-object path must keep the plan text effectively constant
    val planStr = assigned.queryExecution.executedPlan.toString
    assert(planStr.length < 20000, s"plan grew with k: ${planStr.length} chars")
    val got = assigned.select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // driver-side argmax under the exact expression rules (round6 HALF_UP,
    // strict > in cid order)
    def r6d(x: Double) = java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    def cos(a: Array[Double], b: Array[Double]) = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      r6d(dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum)))
    }
    val expected = corpus.map { case (id, v) =>
      id -> cb.foldLeft((-1L, -2.0)) { case ((bc, bs), (cid, cv)) =>
        val s = cos(v, cv)
        if (s > bs) (cid, s) else (bc, bs)
      }._1
    }.toMap
    assert(got == expected)
  }
}
