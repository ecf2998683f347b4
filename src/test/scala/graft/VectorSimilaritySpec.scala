package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions
import graft.operators.Similarity

class VectorSimilaritySpec extends SparkSpec {
  import spark.implicits._

  override def beforeAll(): Unit = { super.beforeAll(); VectorFunctions.register(spark) }

  private def vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(0.0f, 1.0f, 0.0f)),     // orthogonal to 0
    (2L, Array(2.0f, 0.0f, 0.0f)),     // colinear with 0
    (3L, Array(-1.0f, 0.0f, 0.0f)),    // opposite of 0
    (4L, Array(0.0f, 0.0f, 0.0f))      // zero vector
  ).toDF("vec_id", "embedding")

  test("cosine: known geometry, zero-norm guard") {
    val c = vecs.as("a").crossJoin(vecs.as("b"))
      .select($"a.vec_id".as("i"), $"b.vec_id".as("j"),
              VectorFunctions.cosineSim($"a.embedding", $"b.embedding").as("c"))
      .as[(Long, Long, Double)].collect()
      .map { case (i, j, c) => (i, j) -> c }.toMap
    assert(c((0L, 2L)) == 1.0)
    assert(c((0L, 1L)) == 0.0)
    assert(c((0L, 3L)) == -1.0)
    assert(c((0L, 4L)) == 0.0, "zero vector → 0.0, not NaN")
  }

  test("dot product matches manual sum; interpreted == codegen") {
    val df = vecs.select(VectorFunctions.dotProduct($"embedding", $"embedding").as("d"))
    assert(df.as[Double].collect().toSeq == Seq(1.0, 1.0, 4.0, 1.0, 0.0))
    // force the interpreted path too (codegen off) and compare
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try assert(df.as[Double].collect().toSeq == Seq(1.0, 1.0, 4.0, 1.0, 0.0))
    finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("GraftExtensions injects functions into fresh sessions (no register call)") {
    val fresh = spark.newSession() // temp functions do NOT carry over; extensions do
    val d = fresh.sql("SELECT dot_product_f(array(CAST(1.5 AS FLOAT), CAST(2.0 AS FLOAT)), " +
                      "array(CAST(2.0 AS FLOAT), CAST(3.0 AS FLOAT)))")
      .collect()(0).getDouble(0)
    assert(d == 9.0)
    val sh = fresh.sql("SELECT simhash16(array('ant', 'bee'))").collect()(0).getInt(0)
    assert(sh >= 0 && sh < (1 << 16))
    val mh = fresh.sql("SELECT minhash_sigs(array('a b c', 'b c d'), 4)")
      .collect()(0).getSeq[Long](0)
    assert(mh.length == 4 && mh.forall(_ >= 0L))
  }

  test("SQL registration: cosine_sim usable from spark.sql") {
    vecs.createOrReplaceTempView("v")
    val r = spark.sql(
      "SELECT cosine_sim(a.embedding, b.embedding) FROM v a JOIN v b " +
      "ON a.vec_id = 0 AND b.vec_id = 2").as[Double].head()
    assert(r == 1.0)
  }

  test("brute-force top-k ranks colinear first, excludes self") {
    val topk = Similarity.bruteForceTopK(vecs, "vec_id", "embedding",
                                         col("vec_id") === 0, 2)
      .select($"neighbor_id", $"rank").as[(Long, Int)].collect().toSeq
    assert(topk.head == ((2L, 1)))         // cos=1 colinear
    assert(topk.map(_._1).forall(_ != 0L)) // self excluded
  }

  test("LSH planes are deterministic and bucket agreement implies candidates") {
    val p1 = Similarity.planeSigns(8, 64)
    val p2 = Similarity.planeSigns(8, 64)
    assert(p1.map(_.toSeq).toSeq == p2.map(_.toSeq).toSeq)
    assert(p1.forall(_.forall(v => v == 1.0f || v == -1.0f)))
    // colinear vectors land in the same bucket → candidate must appear
    val planes = Similarity.planeSigns(4, 3)
    val b = vecs.select($"vec_id",
      Similarity.lshBucket($"embedding", planes).as("bucket"))
      .as[(Long, Int)].collect().toMap
    assert(b(0L) == b(2L), "colinear vectors share all sign bits")
  }

  test("lshTopK at non-fixture dims: schema-inferred == explicit (dims=3)") {
    // the fixture corpus is 64-wide; this 3-wide corpus would silently
    // bucketize on garbage if dims were still hard-coded
    val explicit = Similarity.lshTopK(vecs, "vec_id", "embedding",
                                      col("vec_id") === 0, 2, nPlanes = 4,
                                      dims = 3)
    val inferred = Similarity.lshTopK(vecs, "vec_id", "embedding",
                                      col("vec_id") === 0, 2, nPlanes = 4)
    val e = explicit.select($"neighbor_id", $"rank").as[(Long, Int)].collect().toSeq
    val i = inferred.select($"neighbor_id", $"rank").as[(Long, Int)].collect().toSeq
    assert(e == i)
    assert(e.head._1 == 2L, "colinear neighbor shares the bucket and ranks first")
    val pairs = Similarity.lshNearDupPairs(vecs, "vec_id", "embedding", 0.9,
                                           nPlanes = 4, dims = 3)
      .select($"vec_a", $"vec_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 2L)))
    assert(Similarity.embeddingDims(vecs, "embedding") == 3)
  }

  test("kmeansCells: deterministic, partition-invariant, groups colinear vectors") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val a = Similarity.kmeansCells(emb, "vec_id", "embedding", 8, 2)
      .select($"vec_id", $"cell").as[(Long, Int)].collect().toMap
    val b = Similarity.kmeansCells(emb.repartition(7), "vec_id", "embedding", 8, 2)
      .select($"vec_id", $"cell").as[(Long, Int)].collect().toMap
    assert(a == b, "assignment must not depend on input partitioning")
    assert(a.size == emb.count(), "every vector assigned exactly one cell")
    assert(a.values.toSet.subsetOf((1 to 8).toSet))
    assert(a.values.toSet.size > 1, "training must produce multiple live cells")
    // geometry sanity on the toy corpus: colinear vectors co-assign
    val toy = Similarity.kmeansCells(
      vecs.filter($"vec_id" =!= 4), "vec_id", "embedding", 2, 2)
      .select($"vec_id", $"cell").as[(Long, Int)].collect().toMap
    assert(toy(0L) == toy(2L), "cos=1 pair must share a trained cell")
    graft.operators.PlanCache.releaseAll()
  }

  test("semanticDedup: cell-blocked near-dups, local-minimum keep rule") {
    // cell 1 holds a near-dup chain a~b~c with a≁c (threshold 0.9):
    // the greedy rule keeps ONLY a — b drops for a, c drops for b even
    // though c is not a's near-dup. cell 2 is isolated (always kept).
    val cells = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f), 1),
      (2L, Array(0.924f, 0.383f, 0.0f), 1),   // cos(1,2)≈0.924
      (3L, Array(0.707f, 0.707f, 0.0f), 1),   // cos(2,3)≈0.924, cos(1,3)≈0.707
      (4L, Array(0.0f, 0.0f, 1.0f), 2)
    ).toDF("vec_id", "embedding", "cell")
    val keep = Similarity.semanticDedup(cells, "vec_id", "embedding", "cell", 0.9)
      .select($"vec_id", $"keep").as[(Long, Long)].collect().toMap
    assert(keep == Map(1L -> 1L, 2L -> 0L, 3L -> 0L, 4L -> 1L))
    // same vectors, separate cells → no pair crosses a cell boundary
    val split = Similarity.semanticDedup(
      cells.withColumn("cell", $"vec_id".cast("int")),
      "vec_id", "embedding", "cell", 0.9)
      .select($"vec_id", $"keep").as[(Long, Long)].collect().toMap
    assert(split.values.forall(_ == 1L), "cell blocking must gate the pair join")
  }

  test("matryoshka truncation recall: one row per query, bounded, full width exact") {
    val rows = graft.queries.VectorQueries
      .simMatryoshkaRecall(spark, "/root/testdata/sf0.001")
      .select($"query_id", $"n_hits", $"recall_at_k")
      .as[(Long, Long, Double)].collect()
    assert(rows.length == 16, "one recall row per query vector")
    assert(rows.forall { case (_, h, r) =>
      h >= 0 && h <= 3 && r == h / 3.0 })
    // slicing the FULL width is the identity: approx ≡ truth, recall 1.0
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val full = Similarity.bruteForceTopK(
      emb.select($"vec_id", slice($"embedding", 1, 64).as("embedding")),
      "vec_id", "embedding", $"vec_id" < 16, 3)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val truth = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
                                          $"vec_id" < 16, 3)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    assert(full == truth)
  }

  test("int8 recall: one row per query, bounded; codegen double cosine = interpreted") {
    val rows = graft.queries.VectorQueries
      .simInt8Recall(spark, "/root/testdata/sf0.001")
      .select($"query_id", $"n_hits", $"recall_at_k")
      .as[(Long, Long, Double)].collect()
    assert(rows.length == 16)
    assert(rows.forall { case (_, h, r) => h >= 0 && h <= 3 && r == h / 3.0 })
    // 255 codes per dim is fine-grained: quantization must not destroy
    // ranking wholesale (mean recall well above the ~3/500 random floor)
    assert(rows.map(_._3).sum / rows.length > 0.5,
      "int8 reconstruction lost most of the top-3 ranking")
    // the double-cosine expr agrees between codegen and interpreted eval
    val a = Seq((1L, Array(1.0, 2.0, 3.0), Array(3.0, 2.0, 1.0)))
      .toDF("id", "x", "y")
    val viaExpr = a.select(
      graft.functions.VectorFunctions.cosineSimD($"x", $"y").as("c"))
      .as[Double].head()
    val expect = 10.0 / (math.sqrt(14.0) * math.sqrt(14.0))
    assert(viaExpr == expect)
    graft.operators.PlanCache.releaseAll()
  }

  test("MRL funnel: exhaustive funnel recovers brute force exactly") {
    // funnelK ≥ corpus makes stage 1 lossless, so stage 2 must reproduce
    // the brute-force top-3 bit-for-bit — pins the rescoring arithmetic
    val dir = "/root/testdata/sf0.001"
    val full = graft.queries.VectorQueries
      .simMrlFunnel(spark, dir, funnelK = 10000)
      .select($"query_id", $"neighbor_id", $"cosine")
      .as[(Long, Long, Double)].collect().toSet
    val brute = Similarity.bruteForceTopK(
        spark.read.parquet(s"$dir/embeddings.parquet"),
        "vec_id", "embedding", $"vec_id" < 16, 3)
      .select($"query_id", $"neighbor_id", $"cosine")
      .as[(Long, Long, Double)].collect().toSet
    assert(full == brute)
    // the narrow funnel's answers must come from its own candidate set
    val narrow = graft.queries.VectorQueries.simMrlFunnel(spark, dir)
      .groupBy($"query_id").count().as[(Long, Long)].collect()
    assert(narrow.forall(_._2 == 3), "3 answers per query after rescoring")
  }

  test("semanticDedupIncrement equals full recompute restricted to the batch") {
    // frozen quantizer trained on the corpus split; incremental decisions
    // for the batch must be bit-identical to one recompute over the
    // union under the same centroids (the contract that makes the
    // streaming twin safe)
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val corpus = emb.filter($"vec_id" % 5 =!= 0)
    val batch = emb.filter($"vec_id" % 5 === 0)
    val cents = Similarity.kmeansCentroids(corpus, "vec_id", "embedding", 8, 1)
      .localCheckpoint()
    val incr = Similarity.semanticDedupIncrement(
        Similarity.assignCells(corpus, "vec_id", "embedding", cents),
        Similarity.assignCells(batch, "vec_id", "embedding", cents),
        "vec_id", "embedding", "cell", 0.4)
      .select($"vec_id", $"keep").as[(Long, Long)].collect().toMap
    val full = Similarity.semanticDedup(
        Similarity.assignCells(emb, "vec_id", "embedding", cents),
        "vec_id", "embedding", "cell", 0.4)
      .filter($"vec_id" % 5 === 0)
      .select($"vec_id", $"keep").as[(Long, Long)].collect().toMap
    assert(incr.nonEmpty && incr == full)
    graft.operators.PlanCache.releaseAll()
  }

  test("probeMasks: exact Hamming-ball enumeration") {
    val m0 = Similarity.probeMasks(8, 0)
    assert(m0 == Seq(0), "flips=0 is just the identity probe")
    val m1 = Similarity.probeMasks(8, 1)
    assert(m1.size == 1 + 8 && m1.head == 0)
    assert(m1.forall(m => m >= 0 && m < 256 && Integer.bitCount(m) <= 1))
    val m2 = Similarity.probeMasks(8, 2)
    assert(m2.size == 1 + 8 + 28, "C(8,0)+C(8,1)+C(8,2)")
    assert(m2 == m2.sorted && m2.distinct == m2)
  }

  test("multi-probe LSH: flips=0 ≡ single-probe; recall ≥ single-probe per query") {
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val pred = col("vec_id") < 16
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select($"query_id", $"neighbor_id", $"rank")
        .as[(Long, Long, Int)].collect().toSet
    val single = Similarity.lshTopK(emb, "vec_id", "embedding", pred, 3,
                                    nPlanes = 8, dims = 64)
    val mp0 = Similarity.lshMultiProbeTopK(emb, "vec_id", "embedding", pred, 3,
                                           nPlanes = 8, maxFlips = 0, dims = 64)
    assert(rows(mp0) == rows(single),
      "probing only mask 0 must reproduce the single-probe result exactly")

    // Recall vs brute-force ground truth: the single-probe candidate set
    // is a subset of every multi-probe candidate set (mask 0 is always
    // probed), so per-query recall must be monotone in maxFlips.
    val truth = Similarity.bruteForceTopK(emb, "vec_id", "embedding", pred, 3)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    def recallByQuery(df: org.apache.spark.sql.DataFrame): Map[Long, Int] =
      df.select($"query_id", $"neighbor_id").as[(Long, Long)].collect()
        .filter(truth.contains).groupBy(_._1).view.mapValues(_.length).toMap
        .withDefaultValue(0)
    val rSingle = recallByQuery(single)
    val rMp2 = recallByQuery(Similarity.lshMultiProbeTopK(
      emb, "vec_id", "embedding", pred, 3, nPlanes = 8, maxFlips = 2, dims = 64))
    val qids = truth.map(_._1)
    assert(qids.forall(q => rMp2(q) >= rSingle(q)),
      s"multi-probe recall dropped below single-probe: " +
      qids.map(q => s"$q:${rSingle(q)}->${rMp2(q)}").mkString(", "))
    assert(qids.toSeq.map(rMp2).sum >= qids.toSeq.map(rSingle).sum)
  }

  test("mean pooling: exact grid means, 1-based dims, partition invariance") {
    val groups = Seq(
      (1, Array(1.0f, 2.0f)), (1, Array(3.0f, 4.0f)),
      (2, Array(-1.5f, 0.5f))).toDF("label", "embedding")
    def run(df: org.apache.spark.sql.DataFrame) =
      Similarity.meanPool(df, "label", "embedding")
        .as[(Int, Int, Long, Double)].collect()
        .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    val got = run(groups)
    // exact grid values: all inputs are on the 1e-7 grid already
    assert(got == Map(
      (1, 1) -> ((2L, 2.0)), (1, 2) -> ((2L, 3.0)),
      (2, 1) -> ((1L, -1.5)), (2, 2) -> ((1L, 0.5))))
    assert(run(groups.repartition(5)) == got)
  }

  test("centroid assignment: geometry, mislabel detection, zero-vector ties") {
    val data = Seq(
      (0L, 1, Array(1.0f, 0.0f)), (1L, 1, Array(0.9f, 0.1f)),
      (2L, 2, Array(0.0f, 1.0f)), (3L, 2, Array(0.1f, 0.9f)),
      (4L, 1, Array(0.0f, 0.8f)),  // mislabeled — lies on label 2's axis
      (5L, 3, Array(0.0f, 0.0f))   // zero vector AND zero centroid
    ).toDF("vec_id", "label", "embedding")
    def run(df: org.apache.spark.sql.DataFrame) =
      Similarity.centroidAssign(df, "vec_id", "embedding", "label")
        .as[(Int, Int, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    val got = run(data)
    // label-1 centroid (1.9, 0.9) still pulls vecs 0,1; the mislabeled
    // vec 4 lands with label 2's centroid (0.1, 1.9); the zero vector
    // scores cos=0 against every candidate and ties to the min label
    assert(got == Map(
      (1, 1) -> 2L, (1, 2) -> 1L, (2, 2) -> 2L, (3, 1) -> 1L))
    assert(run(data.repartition(5)) == got)
  }

  test("tiled near-dup pairs == crossJoin baseline; no cartesian/BNLJ node") {
    // fixture embeddings: the registered query's exact input
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long, Double)].collect().sorted.toSeq
    val naive = rows(Similarity.cosineNearDupPairs(emb, "vec_id",
                                                   "embedding", 0.4))
    // every tiling (including blocks > n and blocks = 1) is identical —
    // bit-for-bit, cosine included
    for (b <- Seq(1, 3, 8, 101)) {
      val tiled = Similarity.tiledNearDupPairs(emb, "vec_id",
                                               "embedding", 0.4, blocks = b)
      assert(rows(tiled) == naive, s"blocks=$b diverged")
    }
    // the whole point: the tiled plan carries NO quadratic join node
    val plan = Similarity.tiledNearDupPairs(emb, "vec_id", "embedding", 0.4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
           !plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
    // ... while the naive baseline does (guards the spec itself against
    // a future refactor silently comparing tiled to tiled)
    val naivePlan = Similarity.cosineNearDupPairs(emb, "vec_id",
        "embedding", 0.4).queryExecution.executedPlan.toString
    assert(naivePlan.contains("CartesianProduct") ||
           naivePlan.contains("BroadcastNestedLoopJoin"))
  }

  test("gramMatrix: upper triangle of X^T X, exact on the 1e-7 grid") {
    val X = Seq((0L, Array(1.0f, 2.0f)),
                (1L, Array(3.0f, -4.0f))).toDF("vec_id", "embedding")
    val g = Similarity.gramMatrix(X, "vec_id", "embedding")
      .as[(Int, Int, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    // X^T X = [[1+9, 2-12], [·, 4+16]]
    assert(g == Map((1, 1) -> ((2L, 10.0)), (1, 2) -> ((2L, -10.0)),
                    (2, 2) -> ((2L, 20.0))))
  }

  test("corrMatrix: linear/anti-linear/constant dims; zero-variance guard") {
    // d2 = 2·d1, d3 = −d1, d4 constant
    val X = Seq((0L, Array(1.0f, 2.0f, -1.0f, 5.0f)),
                (1L, Array(2.0f, 4.0f, -2.0f, 5.0f)),
                (2L, Array(3.0f, 6.0f, -3.0f, 5.0f))).toDF("vec_id", "embedding")
    val c = Similarity.corrMatrix(X, "vec_id", "embedding")
      .as[(Int, Int, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._4).toMap
    assert(c.keySet == Set((1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)))
    assert(math.abs(c((1, 2)) - 1.0) < 1e-12)
    assert(math.abs(c((1, 3)) + 1.0) < 1e-12)
    assert(math.abs(c((2, 3)) + 1.0) < 1e-12)
    // zero-variance partner guards to exactly 0
    assert(c((1, 4)) == 0.0 && c((2, 4)) == 0.0 && c((3, 4)) == 0.0)
  }

  test("gramMatrix: ragged rows contribute only the cells they reach") {
    val X = Seq((0L, Array(1.0f, 2.0f)),
                (1L, Array(3.0f))).toDF("vec_id", "embedding")
    val g = Similarity.gramMatrix(X, "vec_id", "embedding")
      .as[(Int, Int, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(g == Map((1, 1) -> ((2L, 10.0)), (1, 2) -> ((1L, 2.0)),
                    (2, 2) -> ((1L, 4.0))))
  }

  test("rrf fusion: score law, no self-hits, at most 5 per query") {
    val rows = graft.queries.VectorQueries
      .simRrfFusion(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(rows.nonEmpty)
    rows.foreach { case (qid, frank, docId, rankLex, rankDense, rrf6) =>
      assert(docId != qid, "self-hits excluded on both sides")
      assert(frank >= 1L && frank <= 5L)
      // the fused score is exactly the two reciprocal-rank terms
      val want = (if (rankLex > 0) 1000000L / (60L + rankLex) else 0L) +
        (if (rankDense > 0) 1000000L / (60L + rankDense) else 0L)
      assert(rrf6 == want && rrf6 > 0L,
             "every fused doc came from at least one system")
      assert(rankLex >= 0L && rankLex <= 20L && rankDense >= 0L &&
             rankDense <= 20L)
    }
    // within a query, fused ranks are dense 1..n and ordered by score
    rows.groupBy(_._1).foreach { case (_, g) =>
      val sorted = g.sortBy(_._2)
      assert(sorted.map(_._2) == (1L to g.size.toLong))
      assert(sorted.map(r => (-r._6, r._3)) ==
             sorted.map(r => (-r._6, r._3)).sorted,
             "fused order is (rrf6 desc, doc_id asc)")
    }
  }

  test("powerIteration: diagonal Gram converges onto the dominant axis") {
    // vectors (1,0), (-1,0), (0,0.5) → G = diag(2e14, 2.5e13) on the
    // grid² scale. Hand-unrolled shifted recurrence (scale 1e6):
    // v1 = (1e6, 125000), v2 = (1e6, 15625), v3 = (1e6, 1953)
    val df = Seq((1L, Array(1.0f, 0.0f)), (2L, Array(-1.0f, 0.0f)),
                 (3L, Array(0.0f, 0.5f))).toDF("vec_id", "embedding")
    val r = Similarity.powerIteration(df, "vec_id", "embedding", 3)
      .as[(Int, Long)].collect().toMap
    assert(r == Map(1 -> 1000000L, 2 -> 1953L))
  }

  test("powerIteration: rank-1 Gram is a fixed point; orthogonal start degenerates to 0") {
    // two copies of (1,1): G is rank-1 with eigenvector (1,1) — v0 is
    // already the eigenvector, all three rounds return it unchanged
    val ones = Seq((1L, Array(1.0f, 1.0f)), (2L, Array(1.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val r1 = Similarity.powerIteration(ones, "vec_id", "embedding", 3)
      .as[(Int, Long)].collect().toMap
    assert(r1 == Map(1 -> 1000000L, 2 -> 1000000L))
    // (1,-1): v0 = (S,S) is exactly orthogonal to the sole eigenvector
    // (1,-1) → u = 0, m = 0, and the guard pins vq to 0 (not a crash)
    val anti = Seq((1L, Array(1.0f, -1.0f))).toDF("vec_id", "embedding")
    val r2 = Similarity.powerIteration(anti, "vec_id", "embedding", 2)
      .as[(Int, Long)].collect().toMap
    assert(r2 == Map(1 -> 0L, 2 -> 0L))
  }

  test("anisoEnergy: axis-aligned mass carries ~all share, orthogonal ~none") {
    // same geometry as the powerIteration spec: eigenvector ≈ dim 1,
    // so (±1, 0) vectors have share → 1e6 (equal for both signs, with
    // the sign in proj_sign) and (0, 0.5) nearly 0
    val df = Seq((1L, Array(1.0f, 0.0f)), (2L, Array(-1.0f, 0.0f)),
                 (3L, Array(0.0f, 0.5f))).toDF("vec_id", "embedding")
    val r = Similarity.anisoEnergy(df, "vec_id", "embedding", 3)
      .as[(Long, Long, Long, Long)].collect()
      .map(t => t._1 -> (t._2, t._3, t._4)).toMap
    assert(r(1L)._1 == 100000000000000L && r(3L)._1 == 25000000000000L)
    assert(r(1L)._2 == 1L && r(2L)._2 == -1L && r(3L)._2 == 1L)
    assert(r(1L)._3 == r(2L)._3 && r(1L)._3 > 990000L)
    assert(r(3L)._3 < 10000L)
  }

  test("mmrRerank: redundancy penalty demotes the near-duplicate") {
    // q=1: a (rel .90) and b (rel .89) are near-identical (sim 1.0);
    // c (rel .50) is orthogonal to both. Plain relevance would pick
    // (a, b, c); MMR picks a, then c (b's penalized score
    // .7*.89 - .3*1.0 = .323 < c's .35), then b.
    val cand = Seq((1L, 10L, 0.90), (1L, 11L, 0.89), (1L, 12L, 0.50))
      .toDF("query_id", "doc_id", "rel")
    val pairs = Seq(
      (1L, 10L, 11L, 1.0), (1L, 11L, 10L, 1.0),
      (1L, 10L, 12L, 0.0), (1L, 12L, 10L, 0.0),
      (1L, 11L, 12L, 0.0), (1L, 12L, 11L, 0.0))
      .toDF("query_id", "a", "b", "sim")
    val out = Similarity.mmrRerank(cand, pairs, 3)
      .as[(Long, Long, Long, Double, Double)].collect()
      .sortBy(_._2).toSeq
    assert(out.map(r => (r._2, r._3)) == Seq((1L, 10L), (2L, 12L), (3L, 11L)))
    // pick-1 score is pure relevance; the duplicate's score carries
    // the full sim-1.0 penalty when finally selected
    assert(out(0)._5 == 0.7 * 0.90 - 0.3 * 0.0)
    assert(out(1)._5 == 0.7 * 0.50 - 0.3 * 0.0)
    assert(out(2)._5 == 0.7 * 0.89 - 0.3 * 1.0)
  }

  test("cell drift: occupancy partitions the corpus, shift replay, JSD bounds") {
    val dir = "/root/testdata/sf0.001"
    val drift = graft.queries.VectorQueries.simCellDrift(spark, dir)
      .as[(Int, Long, Long, Option[Long])].collect()
    val nVecs = spark.read.parquet(s"$dir/embeddings.parquet").count()
    // occupancy is a partition of the corpus: halves sum to the total
    assert(drift.map(r => r._2 + r._3).sum == nVecs && drift.nonEmpty)
    // shift is defined exactly for two-sided cells, and non-negative
    drift.foreach { case (cell, nOld, nNew, shift) =>
      assert(shift.isDefined == (nOld > 0 && nNew > 0), s"cell $cell")
      shift.foreach(v => assert(v >= 0))
    }
    val jsd = graft.queries.VectorQueries.simCellDriftJsd(spark, dir)
      .as[(Long, Option[Long], Option[Long], Option[Long], Option[Long])]
      .head()
    assert(jsd._1 == drift.length.toLong)
    // JSD ∈ [0, 2] bits (micro-bits ×2 grid) up to log-quantization
    // noise of a few µ-bits per term
    val j = jsd._5.get
    assert(j >= -10L && j <= 2000010L, s"jsd_micro2=$j")
    graft.operators.PlanCache.releaseAll()
  }

  test("embed contamination: census partitions the bench slice, brute twin") {
    val dir = "/root/testdata/sf0.001"
    val out = graft.queries.VectorQueries.simEmbedContamination(spark, dir)
      .as[(Long, Long, Long, Long)].collect()
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select($"vec_id", $"label", $"embedding")
      .as[(Long, Long, Array[Float])].collect()
    val bench = emb.filter(_._1 % 10 == 0)
    val corp = emb.filter(_._1 % 10 != 0)
    assert(out.map(_._2).sum == bench.length.toLong)
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) {
        d += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i)
      }
      if (na == 0.0 || nb == 0.0) 0.0 else d / (math.sqrt(na) * math.sqrt(nb))
    }
    val byCell = corp.groupBy(_._2)
    val truth = bench.groupBy(_._2).map { case (cell, bs) =>
      val cs = byCell.getOrElse(cell, Array.empty)
      val contaminated = bs.count(b => cs.exists(c => cos(b._3, c._3) >= 0.4))
      val pairs = bs.iterator.map(b => cs.count(c => cos(b._3, c._3) >= 0.4).toLong).sum
      cell -> ((bs.length.toLong, contaminated.toLong, pairs))
    }
    out.foreach { case (cell, nb, nc, np) =>
      assert(truth(cell) == ((nb, nc, np)), s"cell $cell")
      assert(nc <= nb && np >= nc)
    }
    graft.operators.PlanCache.releaseAll()
  }

  test("mmrRerank: k beyond pool size yields no null picks, stays per-query") {
    // two queries, 2 candidates each, k=3: only 2 picks materialize per
    // query (the empty third round selects nothing) and queries never mix
    val cand = Seq((1L, 10L, 0.9), (1L, 11L, 0.2),
                   (2L, 20L, 0.8), (2L, 21L, 0.7))
      .toDF("query_id", "doc_id", "rel")
    val pairs = Seq((1L, 10L, 11L, 0.5), (1L, 11L, 10L, 0.5),
                    (2L, 20L, 21L, 0.1), (2L, 21L, 20L, 0.1))
      .toDF("query_id", "a", "b", "sim")
    val out = Similarity.mmrRerank(cand, pairs, 3)
      .as[(Long, Long, Long, Double, Double)].collect().toSeq
    assert(out.size == 4)
    assert(out.filter(_._1 == 1L).map(_._3).toSet == Set(10L, 11L))
    assert(out.filter(_._1 == 2L).map(_._3).toSet == Set(20L, 21L))
    assert(out.map(_._2).toSet == Set(1L, 2L))
  }
}
