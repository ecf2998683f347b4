package graft

import org.apache.spark.sql.functions._

import graft.queries.{DocQueries, RelationalQueries}

/** Invariant specs for the round-3 query surface, driven over the
  * sf0.001 fixtures (the same data the driver smokes). These assert the
  * LAWS the operators promise, independent of the DuckDB hash gate.
  */
class PipelineQuerySpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("method agreement partitions the union of candidate pairs") {
    import graft.operators.Dedup
    val docs = graft.sources.Tables.documents(spark, dir)
    val rows = DocQueries.dedupMethodAgreement(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3))
      .toMap
    assert(!rows.contains((0L, 0L, 0L)), "a pair no method surfaced cannot exist")
    // the 2^3-1 cells partition the union: totals must reconcile exactly
    val union = Dedup.jaccardPairs(docs, "doc_id", "text")
      .select(col("doc_a"), col("doc_b"))
      .unionByName(Dedup.minHashCandidatePairs(docs, "doc_id", "text")
        .select(col("doc_a"), col("doc_b")))
      .unionByName(Dedup.simHashPairs(docs, "doc_id", "text")
        .select(col("doc_a"), col("doc_b")))
      .distinct().count()
    assert(rows.values.sum == union)
    // the fixture seeds exact duplicates: all three methods must agree
    // on at least those
    assert(rows.getOrElse((1L, 1L, 1L), 0L) > 0L,
      "exact dups are candidates of every method")
    graft.operators.PlanCache.releaseAll()
  }

  test("pipeRedact leaves no policy matches in the redacted text") {
    val masked = graft.sources.Tables.documents(spark, dir)
      .select(regexp_replace($"text", DocQueries.RedactPattern, "[PII]")
                .as("masked"))
      .agg(sum(regexp_count($"masked", lit(DocQueries.RedactPattern))))
      .as[Long].head()
    assert(masked == 0L)
    // and the redaction is observable: some doc actually matched
    val hits = DocQueries.pipeRedact(spark, dir)
      .agg(sum($"n_redacted")).as[Long].head()
    assert(hits > 0L, "policy pattern never fired on the fixture")
  }

  test("pipeWeightedSample: exactly m picks, heavy docs never skipped past") {
    val picks = DocQueries.pipeWeightedSample(spark, dir)
      .select($"doc_id", $"w", $"n_picks").as[(Long, Long, Long)].collect()
    // systematic PPS invariant: the draw size is EXACT, not expected
    assert(picks.map(_._3).sum == 100L,
           s"systematic sample must total m=100, got ${picks.map(_._3).sum}")
    assert(picks.forall(_._3 >= 1L))
    // inclusion is weight-monotone in aggregate: the sampled mean weight
    // must exceed the corpus mean (PPS favors heavy docs)
    val corpusMeanW = graft.sources.Tables.documents(spark, dir)
      .agg(avg(size(split($"text", " ")))).as[Double].head()
    val sampleMeanW = picks.map(_._2).sum.toDouble / picks.length
    assert(sampleMeanW > corpusMeanW,
           s"PPS sample mean $sampleMeanW vs corpus mean $corpusMeanW")
  }

  test("pipeContamination: shares in [0,1], benchmark docs excluded") {
    val rows = DocQueries.pipeContamination(spark, dir)
      .select($"n_docs", $"n_contaminated", $"max_share")
      .as[(Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (n, c, mx) =>
      assert(c <= n)
      assert(mx >= 0.0 && mx <= 1.0)
    }
    // per-source doc counts must cover exactly the non-benchmark corpus
    val corpus = graft.sources.Tables.documents(spark, dir)
      .filter($"doc_id" % 10 =!= 0).count()
    assert(rows.map(_._1).sum == corpus)
  }

  test("pipeMixturePlan: rates capped at 1, realized mixture hits targets") {
    val rows = DocQueries.pipeMixturePlan(spark, dir)
      .select($"lang", $"n_docs", $"target_w", $"keep_rate", $"n_keep")
      .as[(String, Long, Double, Double, Long)].collect()
    assert(rows.length == 5)
    rows.foreach { case (_, n, _, rate, keep) =>
      assert(rate > 0.0 && rate <= 1.0)
      assert(keep <= n, "cannot keep more docs than exist")
    }
    // the binding (scarcest) language is kept whole
    assert(rows.exists { case (_, n, _, _, keep) => keep >= n - 1 })
    // realized mixture ≈ target weights (floor slack ≤ 1 doc per lang)
    val total = rows.map(_._5).sum.toDouble
    rows.foreach { case (_, _, w, _, keep) =>
      assert(math.abs(keep / total - w) < 0.01,
        s"mixture off target: got ${keep / total}, want $w")
    }
  }

  test("divisionSuppliers returns exactly the full-coverage suppliers") {
    val out = RelationalQueries.divisionSuppliers(spark, dir)
      .select($"s_suppkey").as[Long].collect().toSet
    // independent recomputation with plain DataFrame ops
    val li = graft.sources.Tables.lineitem(spark, dir)
      .filter($"l_discount" >= 0.09 &&
        $"l_shipdate" >= lit(java.time.LocalDateTime.parse("1997-01-01T00:00:00")) &&
        $"l_shipdate" < lit(java.time.LocalDateTime.parse("1997-04-01T00:00:00")))
    val pairs = li
      .join(graft.sources.Tables.orders(spark, dir), $"l_orderkey" === $"o_orderkey")
      .join(graft.sources.Tables.customer(spark, dir), $"o_custkey" === $"c_custkey")
      .select($"l_suppkey", $"c_mktsegment").distinct().collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getString(1)).toSet)
    val allSegs = graft.sources.Tables.customer(spark, dir)
      .select($"c_mktsegment").distinct().as[String].collect().toSet
    val expected = pairs.filter(_._2 == allSegs).keys.toSet
    assert(out == expected)
  }

  test("minCostSupplier: every returned cost is the true per-part minimum") {
    val out = RelationalQueries.minCostSupplier(spark, dir)
      .select($"p_partkey", $"unit_cost").as[(Long, Double)].collect()
    assert(out.nonEmpty)
    val mins = graft.sources.Tables.lineitem(spark, dir)
      .groupBy($"l_partkey")
      .agg(min($"l_extendedprice" / $"l_quantity").as("mc"))
      .as[(Long, Double)].collect().toMap
    out.foreach { case (pk, c) =>
      assert(c == mins(pk), s"part $pk: $c is not the min ${mins(pk)}")
    }
  }

  test("bigOrders threshold is exact: no order at or below 300 leaks in") {
    val qtys = RelationalQueries.bigOrders(spark, dir)
      .select($"sum_qty").as[Double].collect()
    qtys.foreach(q => assert(q > 300.0))
  }

  test("bigramNll matches an independent in-JVM add-one bigram model") {
    val docs = Seq((1L, "a b a b c"), (2L, "b b"), (3L, "x"))
      .toDF("doc_id", "text")
    val out = graft.operators.TextOps.bigramNll(docs, "doc_id", "text")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    // independent recomputation: plain Scala maps, same quantization
    val toks = Map(1L -> Seq("a", "b", "a", "b", "c"), 2L -> Seq("b", "b"),
                   3L -> Seq("x"))
    val cu = toks.values.flatten.groupBy(identity).view.mapValues(_.size).toMap
    val v = cu.size
    val bigs = toks.view.mapValues(ts => ts.zip(ts.tail)).toMap
    val cb = bigs.values.flatten.groupBy(identity).view.mapValues(_.size).toMap
    def lp6(bg: (String, String)): Long =
      math.round(math.log(cb(bg) + 1.0) * 1e6) -
        math.round(math.log(cu(bg._1) + v.toDouble) * 1e6)
    val expect = bigs.collect { case (id, bs) if bs.nonEmpty =>
      val nll = -(bs.map(lp6).sum.toDouble / 1e6) / bs.size
      id -> (bs.size.toLong,
             BigDecimal(nll).setScale(6, BigDecimal.RoundingMode.HALF_UP)
               .toDouble)
    }.toMap
    assert(out == expect)
    assert(!out.contains(3L), "a 1-token doc has no bigrams")
    graft.operators.PlanCache.releaseAll()
  }

  test("gopher rules reconcile with a per-doc recomputation") {
    val out = DocQueries.textGopherRules(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toMap
    val docs = graft.sources.Tables.documents(spark, dir)
      .select($"source", $"text").as[(String, String)].collect()
    val stops = graft.operators.TextOps.EnglishStopwords.toSet
    val expect = docs.groupBy(_._1).view.mapValues { ds =>
      val rules = ds.map { case (_, text) =>
        val ts = text.split(" ", -1)
        val n = ts.length
        val chars = text.length - (n - 1)
        val nd = ts.distinct.length
        (chars >= 3 * n && chars <= 10 * n, n >= 50,
         ts.distinct.count(stops) >= 2, (n - nd) * 5 <= n * 2)
      }
      val clean = rules.count(r => r._1 && r._2 && r._3 && r._4).toLong
      (ds.length.toLong, rules.count(!_._1).toLong, rules.count(!_._2).toLong,
       rules.count(!_._3).toLong, rules.count(!_._4).toLong, clean,
       clean * 1000 / ds.length)
    }.toMap
    assert(out == expect)
  }

  test("DSIR weights: target-language docs outscore the rest on average") {
    val rows = DocQueries.pipeDsirWeights(spark, dir)
      .select($"lang", $"avg_logratio").as[(String, Double)].collect()
    val (en, rest) = rows.partition(_._1 == "en")
    assert(en.nonEmpty && rest.nonEmpty)
    def mean(xs: Array[(String, Double)]) = xs.map(_._2).sum / xs.length
    assert(mean(en) > mean(rest),
      s"en mean ${mean(en)} must exceed non-target mean ${mean(rest)}")
    graft.operators.PlanCache.releaseAll()
  }

  test("fuzzyMatch distances equal an independent Levenshtein DP") {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val out = RelationalQueries.fuzzyMatch(spark, dir)
      .select($"name_a", $"name_b", $"dist").as[(String, String, Long)]
      .collect()
    assert(out.nonEmpty, "no fuzzy pairs on the fixture")
    out.foreach { case (a, b, dst) =>
      assert(dst == lev(a, b).toLong, s"($a, $b)")
      assert(dst >= 1 && dst <= 3)
      assert(a.split(' ').last == b.split(' ').last, "blocking key violated")
    }
  }

  test("mmPhashPairs: banded candidates reproduce the all-pairs formula hashes") {
    // independent recomputation straight from the pixel-generating
    // formula — never touches the TIFF bytes or the banding
    val ids = graft.sources.Tables.documents(spark, dir)
      .filter($"doc_id" % 17 === 3).select($"doc_id").as[Long].collect()
    def ahash(id: Long): Long = {
      val vs = for (y <- 0 until 6; x <- 0 until 8)
        yield (id * 7 + 13 + y * 3 + x * 5) % 256
      val sv = vs.sum
      vs.zipWithIndex.collect { case (v, i) if v * 48 > sv => 1L << i }.sum
    }
    val expect = (for {
      a <- ids; b <- ids
      fa = s"dataset/doc_$a.tif"; fb = s"dataset/doc_$b.tif"
      if fa < fb
      hd = java.lang.Long.bitCount(ahash(a) ^ ahash(b))
      if hd <= 7
    } yield (fa, fb, hd.toLong)).toSet
    val out = graft.queries.MediaQueries.mmPhashPairs(spark, dir)
      .as[(String, String, Long)].collect().toSet
    assert(out == expect)
    graft.operators.PlanCache.releaseAll()
  }

  test("winnowing: selected set equals an independent replay; every window covered") {
    val out = DocQueries.textWinnowing(spark, dir)
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(r => (r._2, r._3)).toSet).toMap
    val docs = graft.sources.Tables.documents(spark, dir)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val md = java.security.MessageDigest.getInstance("MD5")
    def h40(sh: String): Long = {
      val hex = md.digest(s"win|$sh".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(10), 16)
    }
    docs.foreach { case (id, text) =>
      val ts = text.split(" ", -1)
      val grams = (0 to ts.length - 3)
        .map(i => h40(ts.slice(i, i + 3).mkString(" ")))
      val expect = (3 until grams.length).flatMap { q => // window [q-3, q]
        val win = (q - 3 to q).map(p => (grams(p), -(p + 1)))
        val (hm, negPos) = win.min
        Seq(((-negPos).toLong, hm))
      }.toSet
      val got = out.getOrElse(id, Set.empty)
      assert(got == expect, s"doc $id")
      // the winnowing guarantee: every full window contains a selection
      (3 until grams.length).foreach { q =>
        assert(got.exists { case (p, _) => p >= q - 2 && p <= q + 1 },
          s"doc $id window ending at ${q + 1} uncovered")
      }
    }
  }

  test("zipf fit matches an independent OLS over the same quantized logs") {
    val row = DocQueries.textZipfFit(spark, dir)
      .as[(Long, Double, Double, Double)].head()
    val wc = graft.operators.TextOps.wordCounts(
        graft.sources.Tables.documents(spark, dir), "text")
      .as[(String, Long)].collect()
    val top = wc.sortBy { case (w, n) => (-n, w) }.take(100)
    val x6 = top.indices.map(i => math.round(math.log(i + 1.0) * 1e6))
    val y6 = top.map(t => math.round(math.log(t._2.toDouble) * 1e6))
    val n = top.length.toLong
    val (sx, sy) = (x6.sum, y6.sum)
    val sxy = x6.zip(y6).map { case (a, b) => a * b }.sum
    val sxx = x6.map(a => a * a).sum
    val slope = (n * sxy - sx * sy).toDouble / (n * sxx - sx * sx).toDouble
    assert(row._1 == n && row._2 == slope)
    assert(row._2 < 0, "frequency must fall with rank")
    assert(row._4 >= 0 && row._4 <= 1, s"r2 ${row._4}")
    graft.operators.PlanCache.releaseAll()
  }

  test("leakage split: no near-dup pair straddles splits; totals reconcile") {
    import graft.operators.Dedup
    val docs = graft.sources.Tables.documents(spark, dir)
    val clusters = DocQueries.dedupClusters(spark, dir)
      .as[(Long, Long)].collect().toMap
    def splitOf(doc: Long): String = {
      val ckey = clusters.getOrElse(doc, doc)
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"split|$ckey".getBytes("UTF-8"))
      val bk = java.lang.Long.parseLong(
        d.take(2).map("%02x".format(_)).mkString, 16) % 100
      if (bk < 80) "train" else if (bk < 90) "val" else "test"
    }
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text")
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect()
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) =>
      assert(splitOf(a) == splitOf(b), s"pair ($a, $b) straddles splits") }
    val out = DocQueries.pipeLeakageSplit(spark, dir)
      .as[(String, String, Long, Long)].collect()
    assert(out.map(_._3).sum == docs.count(), "every doc lands in one split")
    graft.operators.PlanCache.releaseAll()
  }

  test("cepSequence matches an independent latest-predecessor scan") {
    val gap = 1800L * 1000000L
    val out = graft.queries.EventQueries.cepSequence(spark, dir)
      .select($"user_id", $"n_stage2", $"n_complete",
              $"first_complete_us", $"has_pattern")
      .as[(Long, Long, Long, Option[Long], Boolean)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
    val ev = graft.sources.Tables.events(spark, dir)
      .select($"user_id", $"event_id", expr("ts_ns DIV 1000"), $"event_type")
      .as[(Long, Long, Long, String)].collect()
    val expect = ev.groupBy(_._1).map { case (u, es) =>
      var lastClick = Option.empty[Long]
      var lastAb = Option.empty[Long]
      var n2 = 0L; var nc = 0L; var first = Option.empty[Long]
      es.sortBy(e => (e._3, e._2)).foreach { case (_, _, us, tp) =>
        val ab = tp == "view" && lastClick.exists(c => us - c <= gap)
        val abc = tp == "purchase" && lastAb.exists(a => us - a <= gap)
        if (ab) { n2 += 1 }
        if (abc) { nc += 1; if (first.isEmpty) first = Some(us) }
        // state updates AFTER the checks: frames end at 1 PRECEDING
        if (tp == "click") lastClick = Some(us)
        if (ab) lastAb = Some(us)
      }
      u -> (n2, nc, first, nc > 0)
    }
    assert(out == expect)
    assert(out.values.exists(_._4), "no user completed the pattern")
    graft.operators.PlanCache.releaseAll()
  }

  test("winnow contamination: benchmark excluded, integer bounds hold") {
    val rows = DocQueries.pipeContaminationWinnow(spark, dir)
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (id, nf, nh, pm) =>
      assert(id % 10 != 0, "benchmark docs must not be scored")
      assert(nh >= 0 && nh <= nf)
      assert(pm == nh * 1000 / nf)
    }
    graft.operators.PlanCache.releaseAll()
  }

  test("mmPhashIncr: exact dup implies near candidate; hashes replay the formula") {
    val ids = graft.sources.Tables.documents(spark, dir)
      .filter($"doc_id" % 17 === 3).select($"doc_id").as[Long].collect()
    def ahash(id: Long): Long = {
      val vs = for (y <- 0 until 6; x <- 0 until 8)
        yield (id * 7 + 13 + y * 3 + x * 5) % 256
      val sv = vs.sum
      vs.zipWithIndex.collect { case (v, i) if v * 48 > sv => 1L << i }.sum
    }
    val corpus = ids.filter(_ % 2 == 0).map(ahash).toSet
    def bandsOf(h: Long) = (0 until 8).map(b => (b, (h >> (b * 6)) & 63)).toSet
    val corpusBands = ids.filter(_ % 2 == 0).flatMap(h => bandsOf(ahash(h))).toSet
    val expect = ids.filter(_ % 2 == 1).map { id =>
      val h = ahash(id)
      val exact = corpus.contains(h)
      val near = bandsOf(h).exists(corpusBands)
      (s"dataset/doc_$id.tif", exact, near,
       if (exact || near) "drop" else "keep")
    }.toSet
    val out = graft.queries.MediaQueries.mmPhashIncr(spark, dir)
      .as[(String, Boolean, Boolean, String)].collect().toSet
    assert(out == expect)
    out.foreach { case (f, exact, near, _) =>
      if (exact) assert(near, s"$f: equal hashes share every band") }
    graft.operators.PlanCache.releaseAll()
  }

  test("dedupTextVsSemantic cells partition the union of both pair sets") {
    import graft.operators.{Dedup, Similarity}
    graft.functions.VectorFunctions.register(spark)
    val cells = graft.queries.VectorQueries.dedupTextVsSemantic(spark, dir)
      .as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(!cells.contains((0L, 0L)), "a pair neither modality surfaced cannot exist")
    val text = Dedup.jaccardPairs(
        graft.sources.Tables.documents(spark, dir), "doc_id", "text")
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    assert(cells.filterKeys(_._1 == 1L).values.sum == text.size,
      "text-row marginal equals the jaccard pair count")
    assert(cells.values.sum >= text.size)
    graft.operators.PlanCache.releaseAll()
  }

  test("fuzzyClusters: canonical is the component minimum and covers all parts") {
    val out = RelationalQueries.fuzzyClusters(spark, dir)
      .as[(String, String, Long)].collect()
    val nParts = graft.sources.Tables.part(spark, dir).count()
    assert(out.map(_._3).sum == nParts, "every part row accounted for")
    val canon = out.map(r => r._1 -> r._2).toMap
    out.foreach { case (name, c, _) =>
      assert(c <= name, s"canonical $c must be the component min for $name")
      assert(canon(c) == c, s"canonical $c must map to itself")
    }
    graft.operators.PlanCache.releaseAll()
  }

  test("cuped matches an independent moment recomputation") {
    val ev = graft.sources.Tables.events(spark, dir)
      .select($"user_id", expr("ts_ns DIV 1000"),
              expr("CAST(round(value * 100) AS BIGINT)"))
      .as[(Long, Long, Long)].collect()
    val mid = (ev.map(_._2).min + ev.map(_._2).max) / 2
    def variant(u: Long): Int = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"cuped|$u".getBytes("UTF-8"))
      (java.lang.Long.parseLong(d.take(2).map("%02x".format(_)).mkString, 16)
        % 2).toInt
    }
    val per = ev.groupBy(_._1).map { case (u, es) =>
      (u, es.filter(_._2 <= mid).map(_._3).sum,
          es.filter(_._2 > mid).map(_._3).sum, variant(u))
    }.toSeq
    val n = per.size.toDouble
    val (sx, sy) = (per.map(_._2).sum, per.map(_._3).sum)
    val sxx = per.map(p => p._2 * p._2).sum
    val sxy = per.map(p => p._2 * p._3).sum
    val theta = (sxy.toDouble - sx.toDouble * sy.toDouble / n) /
      (sxx.toDouble - sx.toDouble * sx.toDouble / n)
    val meanXAll = sx.toDouble / 100.0 / n
    val expect = per.groupBy(_._4).map { case (v, us) =>
      val nv = us.size.toDouble
      val my = us.map(_._3).sum.toDouble / 100.0 / nv
      val mx = us.map(_._2).sum.toDouble / 100.0 / nv
      v -> (us.size.toLong, my, theta, my - theta * (mx - meanXAll))
    }
    val out = graft.queries.EventQueries.cuped(spark, dir)
      .as[(Int, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
    assert(out == expect)
    graft.operators.PlanCache.releaseAll()
  }

  test("skyline equals brute-force strict-dominance filtering") {
    val parts = graft.sources.Tables.part(spark, dir)
      .select($"p_partkey", $"p_retailprice", $"p_size")
      .as[(Long, Double, Int)].collect()
    val expect = parts.filter { case (_, pr, sz) =>
      !parts.exists { case (_, pr2, sz2) =>
        pr2 <= pr && sz2 >= sz && (pr2 < pr || sz2 > sz) }
    }.map(_._1).toSet
    val out = RelationalQueries.skyline(spark, dir)
      .select($"p_partkey").as[Long].collect().toSet
    assert(out == expect && out.nonEmpty)
    graft.operators.PlanCache.releaseAll()
  }

  test("graphWalks: every hop follows a real edge at the seeded md5 rank") {
    val out = RelationalQueries.graphWalks(spark, dir)
      .as[(Long, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    // independent adjacency + rank replay
    val li = graft.sources.Tables.lineitem(spark, dir)
      .filter($"l_quantity" > 40)
      .select($"l_orderkey", $"l_partkey").as[(Long, Long)].collect()
    val edges = li.groupBy(_._1).values.flatMap { ls =>
      val ps = ls.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length)
        yield (ps(i), ps(j))
    }.toSet
    val adj = edges.toSeq.flatMap(e => Seq(e, e.swap))
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.sorted).toMap
    def rank(t: Int, u: Long): Int = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"walk|$t|$u".getBytes("UTF-8"))
      (java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16)
        % adj(u).size).toInt
    }
    assert(out.length == adj.size, "one walk per node")
    out.foreach { case (s0, n1, n2, n3) =>
      assert(n1 == adj(s0)(rank(1, s0)))
      assert(n2 == adj(n1)(rank(2, n1)))
      assert(n3 == adj(n2)(rank(3, n2)))
    }
    graft.operators.PlanCache.releaseAll()
  }

  test("relKCore matches an independent set-based peel") {
    val out = RelationalQueries.relKCore(spark, dir)
      .as[(Long, Long)].collect().toMap
    // independent recomputation from the raw fixture
    val li = graft.sources.Tables.lineitem(spark, dir)
      .filter($"l_quantity" > 40)
      .select($"l_orderkey", $"l_partkey").as[(Long, Long)].collect()
    var edges = li.groupBy(_._1).values.flatMap { ls =>
      val ps = ls.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length)
        yield (ps(i), ps(j))
    }.toSet
    var alive = Map.empty[Long, Int]
    var done = false
    var r = 0
    while (r < 6 && !done) {
      val deg = edges.toSeq.flatMap(e => Seq(e._1, e._2))
        .groupBy(identity).view.mapValues(_.size).toMap
      alive = deg.filter(_._2 >= 5)
      val next = edges.filter(e => alive.contains(e._1) && alive.contains(e._2))
      if (next == edges) done = true
      edges = next
      r += 1
    }
    assert(out == alive.map { case (n, d) => n -> d.toLong })
  }

  test("BM25 top-k: laws against an independent in-JVM scorer") {
    val rows = DocQueries.docBm25TopK(spark, dir)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    val byQuery = rows.groupBy(_._1)
    byQuery.foreach { case (q, rs) =>
      // ranks are 1..k, dense, ordered by (score desc, doc_id asc)
      assert(rs.map(_._2).sorted.toSeq == (1L to rs.size).toSeq)
      val ordered = rs.sortBy(_._2)
      ordered.zip(ordered.tail).foreach { case (a, b) =>
        assert(a._5 > b._5 || (a._5 == b._5 && a._3 < b._3)) }
      // NOT asserted: "query doc in its own top-k" — the fixture's
      // 31-word shared vocabulary means a short doc with high tf of
      // the same common terms legitimately outscores the (longer)
      // query document itself
    }
    // independent in-JVM replay of the full scoring pipeline
    val docs = graft.sources.Tables.documents(spark, dir)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val toks = docs.map { case (id, t) =>
      id -> Option(t).map(_.split(" ", -1).toSeq).getOrElse(Seq.empty) }.toMap
    val n = docs.length.toLong
    val sdl = toks.values.map(_.size.toLong).sum
    val dfm = toks.values.flatMap(_.distinct).groupBy(identity)
      .map { case (t, g) => t -> g.size.toLong }
    def idf6(df: Long): Long =
      math.round(math.log((n - df + 0.5) / (df + 0.5) + 1.0) * 1e6)
    val expected = toks.keys.filter(_ % 50 == 0).map { qid =>
      val terms = toks(qid).take(4).distinct
      val scores = toks.toSeq.flatMap { case (d, dt) =>
        val hits = terms.filter(dt.contains)
        if (hits.isEmpty) None
        else {
          val dl = dt.size.toLong
          val s6 = hits.map { t =>
            val tf = dt.count(_ == t).toLong
            math.round(idf6(dfm(t)).toDouble * (tf.toDouble * 2.2) /
              (tf.toDouble + 1.2 *
                (0.25 + (0.75 * dl.toDouble * n.toDouble) / sdl.toDouble)))
          }.sum
          Some((d, s6, hits.size.toLong))
        }
      }
      qid -> scores.sortBy(r => (-r._2, r._1)).take(5)
        .zipWithIndex
        .map { case ((d, s6, h), i) => (qid, i + 1L, d, h, s6) }
    }.toMap
    assert(byQuery.keySet == expected.keySet)
    byQuery.foreach { case (q, rs) =>
      assert(rs.sortBy(_._2).toSeq == expected(q), s"query $q diverged")
    }
  }

  test("funnel masses reconcile with the standalone gate reports") {
    val r = DocQueries.pipeFunnelReport(spark, dir).collect()(0)
    val Seq(nRaw, tokRaw, nQ, tokQ, nD, tokD, nF, tokF) =
      (0 until 8).map(r.getLong)
    // monotone: every gate only removes mass (at sf0.001 the ≥50-token
    // Gopher length rule legitimately zeroes the downstream stages —
    // positivity is NOT an invariant of the funnel, monotonicity is)
    assert(nRaw >= nQ && nQ >= nD && nD >= nF && nRaw > 0)
    assert(tokRaw >= tokQ && tokQ >= tokD && tokD >= tokF)
    // stage 0/1 reconcile with the corpus and the gopher report
    val docs = graft.sources.Tables.documents(spark, dir)
    assert(nRaw == docs.count())
    val clean = DocQueries.textGopherRules(spark, dir)
      .agg(sum($"n_clean")).as[Long].collect()(0)
    assert(nQ == clean)
    graft.operators.PlanCache.releaseAll()
  }

  test("NB classifier: hand-computed posterior argmax on a separable corpus") {
    // train (even ids): class A says "aa", class B says "bb"; the held
    // out docs (odd ids) repeat one class's word and must classify there
    val docs = Seq(
      (0L, "aa aa aa", "A"), (2L, "aa aa", "A"),
      (4L, "bb bb bb", "B"), (6L, "bb bb", "B"),
      (1L, "aa aa bb", "?"), (3L, "bb bb aa", "?"), (5L, "aa bb", "?")
    ).toDF("doc_id", "text", "lang")
    // replicate nbScored's math in plain scala on the 1e-6 log2 grid
    def lq(x: Long): Long = math.round(math.log(x.toDouble) / math.log(2) * 1e6)
    // model: V=2; A: aa=5, N=5; B: bb=5, N=5; priors 2/4 each
    val prior = lq(2) - lq(4)
    def score(k_aa: Long, k_bb: Long, cAa: Long, cBb: Long): Long = {
      val n = k_aa + k_bb
      prior - n * lq(5 + 2) + k_aa * lq(cAa + 1) + k_bb * lq(cBb + 1)
    }
    // doc 1 ("aa aa bb"): A's score carries 2·lq(6) vs B's 1·lq(6) → A
    assert(score(2, 1, 5, 0) > score(2, 1, 0, 5))
    // doc 3 ("bb bb aa") is the mirror → B
    assert(score(1, 2, 5, 0) < score(1, 2, 0, 5))
    // doc 5 ("aa bb") is symmetric: exact tie → alphabetical "A"
    assert(score(1, 1, 5, 0) == score(1, 1, 0, 5))
    val byDoc = DocQueries.nbPredFrom(docs)
      .as[(Long, String)].collect().toMap
    assert(byDoc == Map(1L -> "A", 3L -> "B", 5L -> "A"))
    graft.operators.PlanCache.releaseAll()
  }

  test("gram novelty: first-carrier masses reconcile with the gram universe") {
    val out = DocQueries.pipeGramNovelty(spark, dir)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    // every distinct gram is novel in exactly ONE document, so the
    // novel mass summed over sources = the distinct gram universe
    val universe = DocQueries.gram13(spark, dir)
      .select($"h").distinct().count()
    assert(out.map(_._4).sum == universe)
    out.foreach { case (src, nd, ng, nn, pm) =>
      assert(nd > 0 && ng >= nn && nn >= 0, s"$src masses")
      assert(pm == nn * 1000 / ng, s"$src permille")
    }
    graft.operators.PlanCache.releaseAll()
  }

  test("gram provenance: flow matrix reconciles with the novelty ledger") {
    val flows = DocQueries.pipeGramProvenance(spark, dir)
      .as[(String, String, Long, Long)].collect()
    assert(flows.nonEmpty)
    // every distinct (doc, gram) is either its gram's first carrier or
    // a re-occurrence counted in exactly one flow cell, so total flow
    // mass = distinct carriers − gram universe
    val dgAll = DocQueries.gram13(spark, dir)
      .select($"doc_id", $"h").distinct()
    val carriers = dgAll.count()
    val universe = dgAll.select($"h").distinct().count()
    assert(flows.map(_._3).sum == carriers - universe)
    flows.foreach { case (o, c, ng, nd) =>
      assert(ng >= nd && nd > 0, s"$o->$c masses")
    }
    graft.operators.PlanCache.releaseAll()
  }

  test("quality-dup matrix: cells partition the corpus exactly") {
    val docs = graft.sources.Tables.documents(spark, dir)
    val cells = DocQueries.pipeQualityDupMatrix(spark, dir)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(cells.nonEmpty)
    assert(cells.map(_._3).sum == docs.count())
    val tokTotal = docs
      .selectExpr("sum(size(split(text, ' ')))").as[Long].head()
    assert(cells.map(_._4).sum == tokTotal)
    // keepers across cells = distinct text groups
    assert(cells.map(_._5).sum ==
      docs.select(md5($"text".cast("binary"))).distinct().count())
    cells.foreach { case (q, b, nd, tm, nk) =>
      assert(q >= 1 && q <= 4 && b >= 0, s"cell ($q,$b)")
      assert(nd >= nk && nk >= 0 && tm > 0, s"cell ($q,$b) masses")
    }
    graft.operators.PlanCache.releaseAll()
  }

  test("RFM segments: census partitions users and masses exactly") {
    val ev = graft.sources.Tables.events(spark, dir)
    val cells = graft.queries.EventQueries.rfmSegments(spark, dir)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(cells.nonEmpty)
    assert(cells.map(_._4).sum == ev.select($"user_id").distinct().count())
    assert(cells.map(_._5).sum == ev.count())
    val cents = ev.filter($"event_type" === "purchase")
      .selectExpr("sum(CAST(round(value * 100) AS BIGINT))").as[Long].head()
    assert(cells.map(_._6).sum == cents)
    cells.foreach { case (r, f, m, nu, _, _) =>
      assert(r >= 1 && r <= 5 && f >= 1 && f <= 5 && m >= 1 && m <= 5)
      assert(nu > 0)
    }
    graft.operators.PlanCache.releaseAll()
  }

  test("bot regularity: panel matches a first-principles recompute") {
    val out = graft.queries.EventQueries.botRegularity(spark, dir)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    // recompute one user's row with BigInt math over collected gaps
    val uid = out.map(_._1).min
    val ts = graft.sources.Tables.events(spark, dir)
      .filter($"user_id" === uid)
      .selectExpr("ts_ns DIV 1000 AS us", "event_id")
      .as[(Long, Long)].collect().sortBy(identity).map(_._1)
    val gaps = ts.sliding(2).map { case Array(a, b) => b - a }.toSeq
    val (n, sg) = (BigInt(gaps.size), BigInt(gaps.sum))
    val ssq = gaps.map(g => BigInt(g) * g).sum
    val cv2 = if (sg == 0) BigInt(0)
              else (ssq * n - sg * sg) * 1000000 / (sg * sg)
    val row = out.find(_._1 == uid).get
    assert(row._2 == gaps.size && row._3 == (sg / n).toLong)
    assert(row._4 == gaps.min && row._5 == gaps.max)
    assert(row._6 == cv2.toLong)
    out.foreach { case (_, ng, mean, mn, mx, c, reg) =>
      assert(ng >= 8 && mn <= mean && mean <= mx && c >= 0)
      assert(reg == (if (c < 250000) 1L else 0L))
    }
    graft.operators.PlanCache.releaseAll()
  }

  test("user concentration: bands partition users and masses") {
    val ev = graft.sources.Tables.events(spark, dir)
    val out = graft.queries.EventQueries.userConcentration(spark, dir)
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(out.keySet.subsetOf(Set("top_decile", "rest")))
    assert(out.values.map(_._2).sum ==
      ev.select($"user_id").distinct().count())
    assert(out.values.map(_._3).sum == ev.count())
    val shares = out.values.map(_._5).sum
    assert(shares >= 998 && shares <= 1000) // truncation ≤ 1 per band
    // the top decile by definition holds a disproportionate share
    out.get("top_decile").foreach { t =>
      val total = out.values.map(_._2).sum
      assert(t._5 * total >= t._2 * 1000 ||
        t._2 == 0, "top decile share at least proportional")
    }
    graft.operators.PlanCache.releaseAll()
  }

  test("vocab growth: quarters are cumulative and end at the corpus") {
    val docs = graft.sources.Tables.documents(spark, dir)
    val rows = DocQueries.textVocabGrowth(spark, dir)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L))
    // monotone non-decreasing in every column
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._2 >= a._2 && b._3 >= a._3 && b._4 >= a._4)
    }
    // p100 cut covers the whole corpus exactly
    val last = rows.last
    assert(last._2 == docs.count())
    assert(last._3 == docs
      .selectExpr("sum(size(split(text, ' ')))").as[Long].head())
    assert(last._4 == docs
      .selectExpr("explode(split(text, ' ')) AS w")
      .select($"w").distinct().count())
    // Heaps: vocabulary grows SUBLINEARLY in token mass past the first
    // quarter (vocab ratio < token ratio, cross-multiplied)
    assert(BigInt(last._4) * rows.head._3 < BigInt(last._3) * rows.head._4)
    graft.operators.PlanCache.releaseAll()
  }

  test("crawl delta: status masses partition both snapshot halves") {
    val docs = graft.sources.Tables.documents(spark, dir)
    val out = DocQueries.pipeCrawlDelta(spark, dir)
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    val nOld = docs.filter($"doc_id" % 2 === 0).count()
    val nNew = docs.filter($"doc_id" % 2 === 1).count()
    assert(out.values.map(_._3).sum == nOld)
    assert(out.values.map(_._4).sum == nNew)
    out.get("removed").foreach(r => assert(r._4 == 0 && r._6 == 0))
    out.get("added").foreach(r => assert(r._3 == 0 && r._5 == 0))
    out.get("retained").foreach(r => assert(r._3 > 0 && r._4 > 0))
    graft.operators.PlanCache.releaseAll()
  }

  test("length outliers: median/MAD replay the exact interpolation") {
    def pct(vs: Seq[Double]): Double = {
      val s = vs.sorted
      val idx = (s.length - 1) * 0.5
      val (lo, hi) = (s(idx.toInt), s(math.ceil(idx).toInt))
      lo + (hi - lo) * (idx - idx.toInt)
    }
    val byS = graft.sources.Tables.documents(spark, dir)
      .selectExpr("source", "CAST(size(split(text, ' ')) AS LONG) AS n")
      .as[(String, Long)].collect().groupBy(_._1)
      .map { case (s, v) => s -> v.map(_._2.toDouble).toSeq }
    val out = DocQueries.pipeLengthOutliers(spark, dir)
      .as[(String, Long, Double, Double, Long, Long)].collect()
    assert(out.map(_._1).toSet == byS.keySet)
    out.foreach { case (src, nd, med, mad, no, pm) =>
      val vs = byS(src)
      assert(nd == vs.length)
      assert(med == pct(vs), s"$src med")
      assert(mad == pct(vs.map(v => math.abs(v - med))), s"$src mad")
      assert(no == vs.count(v => math.abs(v - med) > 3.0 * mad), s"$src out")
      assert(pm == no * 1000 / nd)
    }
    graft.operators.PlanCache.releaseAll()
  }

  test("markov entropy: grid replay from the transition counts") {
    val edges = graft.queries.EventQueries.transitions(spark, dir)
      .select($"prev_type", $"event_type", $"n_transitions")
      .as[(String, String, Long)].collect()
    def lq(x: Long): Long =
      math.round(math.log(x.toDouble) / math.log(2) * 1e6)
    val expect = edges.groupBy(_._1).map { case (src, es) =>
      val tot = es.map(_._3).sum
      val swl = es.map(e => e._3 * lq(e._3)).sum
      src -> ((es.length.toLong, tot, lq(tot) - swl / tot))
    }
    val out = graft.queries.EventQueries.markovEntropy(spark, dir)
      .as[(String, Long, Long, Long)].collect()
    assert(out.nonEmpty && out.map(_._1).toSet == expect.keySet)
    out.foreach { case (src, n, tot, h) =>
      assert((n, tot, h) == expect(src), s"$src")
      assert(h >= 0, s"$src entropy nonneg")
    }
    graft.operators.PlanCache.releaseAll()
  }

  test("LR filter: integer GD loop replays a driver-side Scala twin") {
    import graft.operators.LogReg
    val train = Seq(
      (0L, "en", "aa bb aa"), (2L, "en", "aa cc"),
      (4L, "fr", "cc dd cc"), (6L, "fr", "dd ee"),
      (8L, "fr", "")                          // bias-only document
    ).toDF("doc_id", "lang", "text")
    val feats = LogReg.features(train, "doc_id", "text", $"lang" === "en")
    val fRows = feats.as[(Long, Long, Long)].collect()
    // every doc carries the bias feature, even the empty one
    assert(fRows.count(_._3 == LogReg.BiasBkt.toLong) == 5)
    val n = fRows.map(_._1).distinct.length
    val byDoc = fRows.groupBy(_._1)
    def phat(z: Long): Long = math.max(0L, math.min(1000000L,
      500000L + ((z + LogReg.Shift) / 4 - LogReg.Shift / 4)))
    var w = Map.empty[Long, Long].withDefaultValue(0L)
    for (_ <- 1 to LogReg.Steps) {
      val r = byDoc.map { case (d, rows) =>
        d -> (phat(rows.map(row => w(row._3)).sum) -
              rows.head._2 * 1000000L)
      }
      val grad = fRows.groupBy(_._3).map { case (b, rows) =>
        b -> rows.map(row => r(row._1)).sum
      }
      w = (0L to LogReg.Buckets.toLong).map { b =>
        val g = grad.getOrElse(b, 0L)
        // g + 4nK >= 0, so Scala / == Spark DIV == DuckDB //
        b -> (w(b) - ((g + 4L * n * LogReg.UpdK) / (4L * n) - LogReg.UpdK))
      }.toMap.withDefaultValue(0L)
    }
    val trained = LogReg.train(feats).as[(Long, Long)].collect().toMap
    assert(trained.size == LogReg.Buckets + 1)
    trained.foreach { case (b, v) => assert(v == w(b), s"bkt $b") }
    // the trained model separates the two dialects
    val scored = LogReg.score(feats, LogReg.train(feats))
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r._4).toMap
    assert(scored(0L) > scored(4L))
    graft.operators.PlanCache.releaseAll()
  }

  test("LR AUC and ECE: brute-force pair twin and bucket-mass replay") {
    val dir = "/root/testdata/sf0.001"
    // the scored frame the rows derive from (re-derived here the same
    // way — memoized weights make this the identical model)
    val scored = graft.queries.DocQueries
      .registry("text_lr_gate")(spark, dir) // forces training memo
    scored.collect()
    val auc = graft.queries.DocQueries.textLrAuc(spark, dir)
      .as[(Long, Long, Long, Option[Long])].head()
    // brute-force 2U over all (pos, neg) pairs: 2·[p+ > p−] + [p+ = p−]
    val ps = graft.operators.LogReg.score(
      graft.operators.LogReg.features(
        graft.sources.Tables.documents(spark, dir)
          .filter($"doc_id" % 2 =!= 0),
        "doc_id", "text", $"lang" === "en"),
      graft.queries.DocQueries.textLrTrain(spark, dir))
      .select($"y", $"p_micro").as[(Long, Long)].collect()
    val pos = ps.filter(_._1 == 1L).map(_._2)
    val neg = ps.filter(_._1 == 0L).map(_._2)
    val u2 = pos.iterator.map(p =>
      2L * neg.count(_ < p) + neg.count(_ == p)).sum
    assert((auc._1, auc._2) == (pos.length.toLong, neg.length.toLong))
    assert(auc._3 == u2, s"u2 ${auc._3} vs brute $u2")
    // ECE/MCE: recompute the bucket gap masses from the scored rows
    val byB = ps.groupBy(t => math.min(9L, t._2 / 100000L))
    val gaps = byB.map { case (_, rows) =>
      val nb = rows.length.toLong
      val gap = math.abs(rows.map(_._2).sum - rows.count(_._1 == 1L) * 1000000L)
      (nb, gap)
    }
    val ece = graft.queries.DocQueries.textLrEce(spark, dir)
      .as[(Long, Long, Option[Long], Long)].head()
    assert(ece._1 == byB.size.toLong && ece._2 == ps.length.toLong)
    assert(ece._3.get == gaps.map(_._2).sum / ps.length)
    assert(ece._4 == gaps.map(t => t._2 / t._1).max)
    graft.operators.PlanCache.releaseAll()
  }

  test("retention cohorts: day-0 identity, census, full Scala twin") {
    val dir = "/root/testdata/sf0.001"
    val out = graft.queries.EventQueries.retentionDaily(spark, dir)
      .as[(Long, Long, Long, Long, Long)].collect()
    val k0 = out.filter(_._2 == 0L)
    assert(k0.nonEmpty)
    k0.foreach(r => assert(r._3 == r._4 && r._5 == 1000L, s"cohort ${r._1}"))
    out.foreach(r => assert(r._3 <= r._4 && r._2 >= 0 && r._2 <= 7))
    // twin: recompute the whole matrix from raw (user, day) pairs
    val ud = graft.sources.Tables.events(spark, dir)
      .selectExpr("user_id", "(ts_ns DIV 1000) DIV 86400000000 AS day")
      .as[(Long, Long)].collect().distinct
    val cohort = ud.groupBy(_._1).map { case (u, ds) => u -> ds.map(_._2).min }
    val sizes = cohort.groupBy(_._2).map { case (d, us) => d -> us.size.toLong }
    val truth = ud.map { case (u, d) => (cohort(u), d - cohort(u)) }
      .filter(t => t._2 >= 0 && t._2 <= 7)
      .groupBy(identity).map { case ((c, k), rows) =>
        (c, k, rows.length.toLong, sizes(c),
         rows.length.toLong * 1000 / sizes(c))
      }.toSet
    assert(out.toSet == truth)
    assert(k0.map(_._4).sum == cohort.size.toLong)
    graft.operators.PlanCache.releaseAll()
  }

  test("LR PR curve: threshold-monotone, reconciles with the gate point") {
    val out = DocQueries.textLrPrCurve(spark, dir)
      .as[(Long, Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(out.length == 9)
    // admitted and tp are non-increasing in the threshold
    out.sliding(2).foreach { case Array(a, b) =>
      assert(b._2 <= a._2 && b._3 <= a._3, s"thr ${b._1}")
    }
    out.foreach { r =>
      assert(r._3 <= r._2, "tp bounded by admitted")
      assert(r._4 <= 1000L && r._5 <= 1000L && r._6 <= 1000L)
    }
    // the 600000 row IS the gate's operating point
    val gate = DocQueries.textLrGate(spark, dir)
      .as[(Long, Long, Long, Long, Long)].collect()
    val p6 = out.find(_._1 == 600000L).get
    assert(p6._2 == gate.map(_._3).sum, "admitted total")
    assert(p6._3 == gate.filter(_._1 == 1L).map(_._3).sum, "tp = admitted positives")
    graft.operators.PlanCache.releaseAll()
  }

  test("stickiness: WAU dominates DAU, full Scala twin") {
    val out = graft.queries.EventQueries.stickiness(spark, dir)
      .as[(Long, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    out.foreach { case (d, dau, wau, st) =>
      assert(wau >= dau && st > 0L && st <= 1000L, s"day $d")
    }
    val ud = graft.sources.Tables.events(spark, dir)
      .selectExpr("user_id", "(ts_ns DIV 1000) DIV 86400000000 AS day")
      .as[(Long, Long)].collect().distinct
    val days = ud.map(_._2).distinct.toSet
    val truth = days.map { d =>
      val dau = ud.count(_._2 == d).toLong
      val wau = ud.filter(t => t._2 >= d - 6 && t._2 <= d)
        .map(_._1).distinct.length.toLong
      (d, dau, wau, dau * 1000 / wau)
    }
    assert(out.toSet == truth)
    graft.operators.PlanCache.releaseAll()
  }

  test("attribution: credit conserves to the cent across buckets") {
    val out = graft.queries.EventQueries.attributionLinear(spark, dir)
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3)))
      .toMap
    val w = 24L * 3600L * 1000000L
    val evs = graft.sources.Tables.events(spark, dir)
      .selectExpr("user_id", "event_id", "event_type",
                  "ts_ns DIV 1000 AS us",
                  "CAST(round(value * 100) AS BIGINT) AS cents")
      .as[(Long, Long, String, Long, Long)].collect()
    val byUser = evs.groupBy(_._1)
    // the operator guards cents >= 0 (Spark DIV vs DuckDB // disagree
    // on negatives) — mirror the guard in the twin
    val purchases = evs.filter(e => e._3 == "purchase" && e._5 >= 0)
    // conservation: every purchase's cents land somewhere, exactly
    val totalCents = purchases.map(_._5).sum
    assert(out.values.map(_._2).sum == totalCents)
    // attributed purchases each produce exactly one solo-or-first touch
    val attributed = purchases.count { p =>
      byUser(p._1).exists(e => e._3 == "click" && e._4 < p._4 &&
        e._4 >= p._4 - w)
    }
    assert(out.getOrElse("solo", (0L, 0L))._1 +
           out.getOrElse("first", (0L, 0L))._1 == attributed.toLong)
    assert(out("unattributed")._1 == purchases.length - attributed)
    graft.operators.PlanCache.releaseAll()
  }

  test("window funnel: levels replay a per-user Scala recompute") {
    val w = 24L * 3600L * 1000000L
    val evs = graft.sources.Tables.events(spark, dir)
      .selectExpr("user_id", "event_type", "ts_ns DIV 1000 AS us")
      .as[(Long, String, Long)].collect()
    val byUser = evs.groupBy(_._1)
    val levels = byUser.values.flatMap { rows =>
      val first = (t: String) => rows.filter(_._2 == t).map(_._3)
        .sorted.headOption
      first("signup").map { su =>
        val ck = rows.filter(r => r._2 == "click" && r._3 > su &&
          r._3 <= su + w).map(_._3).sorted.headOption
        val pu = ck.flatMap(c => rows.filter(r => r._2 == "purchase" &&
          r._3 > c && r._3 <= su + w).map(_._3).sorted.headOption)
        1L + (if (ck.isDefined) 1L else 0L) + (if (pu.isDefined) 1L else 0L)
      }
    }.groupBy(identity(_)).map { case (l, v) => l -> v.size.toLong }
    val out = graft.queries.EventQueries.windowFunnel(spark, dir)
      .as[(Long, Long)].collect().toMap
    assert(out == levels)
    assert(out.values.sum == byUser.count(_._2.exists(_._2 == "signup")))
    graft.operators.PlanCache.releaseAll()
  }

  test("residual energy: 1-row audit replays the pinned eigenvector math") {
    val emb = graft.sources.Tables.embeddings(spark, dir)
      .selectExpr("vec_id", "embedding").as[(Long, Array[Float])].collect()
    val v: Map[Int, Long] = graft.queries.VectorQueries
      .simPowerIter(spark, dir)
      .as[(Int, Long)].collect().toMap
    // Spark round() is HALF_UP away from zero — math.round floors at
    // negative .5, so replay through BigDecimal
    def q(x: Float): BigInt = BigInt(
      new java.math.BigDecimal(x.toDouble * 1e7)
        .setScale(0, java.math.RoundingMode.HALF_UP).toBigInteger)
    val v2 = v.values.map(c => BigInt(c) * c).sum
    var (total, top) = (BigInt(0), BigInt(0))
    emb.foreach { case (_, xs) =>
      val x2 = xs.map(x => q(x) * q(x)).sum
      val dot = xs.zipWithIndex.map { case (x, i) =>
        q(x) * BigInt(v.getOrElse(i + 1, 0L)) }.sum
      total += x2
      if (v2 != 0) top += dot * dot / v2
    }
    val (n, te, pe, ppm) = graft.queries.VectorQueries
      .simResidualEnergy(spark, dir)
      .as[(Long, Long, Long, Long)].head()
    assert(n == emb.length)
    // energies are emitted on the mega grid (Σ DIV 10⁶ — the BIGINT
    // overflow bound moved from ~9e4 to ~9e10 unit vectors, ADVICE r13)
    assert(BigInt(te) == total / 1000000 && BigInt(pe) == top / 1000000)
    assert(pe <= te && ppm == (total - top) * 1000000 / total)
    graft.operators.PlanCache.releaseAll()
  }

  test("mixture temperature: exact grid replay and tail-upsampling law") {
    val rows = DocQueries.pipeMixtureTemperature(spark, dir)
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(rows.length >= 2)
    val totalTok = graft.sources.Tables.documents(spark, dir)
      .selectExpr("sum(size(split(text, ' ')))").as[Long].head()
    // raw shares and the quantized pow replay
    val ams = rows.map { case (l, _, tok, sp, _, _) =>
      assert(sp == BigInt(tok) * 1000000 / totalTok, s"$l share")
      l -> math.round(math.pow(sp.toDouble / 1000000, 0.7) * 1000000)
    }.toMap
    val sumAm = ams.values.map(BigInt(_)).sum
    rows.foreach { case (l, _, _, sp, tp, up) =>
      assert(tp == BigInt(ams(l)) * 1000000 / sumAm, s"$l temp share")
      assert(up == (if (tp > sp) 1L else 0L))
    }
    // τ < 1 compresses: the boost ratio decreases with raw share
    val sorted = rows.sortBy(_._4)
    sorted.sliding(2).foreach { case Array(a, b) =>
      // a smaller share never gets a smaller boost: tpa/spa >= tpb/spb
      assert(BigInt(a._5) * b._4 >= BigInt(b._5) * a._4,
        s"${a._1} vs ${b._1} boost monotonicity")
    }
    // ppm shares account for the whole corpus up to per-lang truncation
    assert(math.abs(rows.map(_._5).sum - 1000000L) <= rows.length)
    graft.operators.PlanCache.releaseAll()
  }

  test("domain weights: exact ppm conservation and DoReMi direction") {
    val rows = DocQueries.pipeDomainWeights(spark, dir)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(rows.length >= 2)
    // cumulative-rounding allocation telescopes to EXACTLY 10⁶ ppm —
    // the cent-conservation law, no per-row truncation drift at all
    assert(rows.map(_._5).sum == 1000000L)
    rows.foreach { case (src, n, meanP, excess, w) =>
      assert(n > 0 && meanP >= 0 && meanP <= 1000000, s"$src mean")
      assert(excess >= 0 && w >= 0, s"$src nonneg")
    }
    // excess consistency: one corpus operating point X with
    // excess = max(0, X − mean_p) — positive-excess rows pin X exactly,
    // zero-excess rows must sit at or above it
    val xs = rows.filter(_._4 > 0).map(r => r._3 + r._4).distinct
    assert(xs.length <= 1, s"inconsistent corpus point: ${xs.toSeq}")
    xs.headOption.foreach { x =>
      rows.filter(_._4 == 0).foreach { r =>
        assert(r._3 >= x, s"${r._1} zero-excess below corpus point")
      }
    }
    // per-row allocation within 1 ppm of the exact multiplicative-
    // weights share m_i·10⁶/Σm (two floors in the telescoping), and the
    // direction law rides it: mass m_i = n_i·(10⁶ + excess_i) upweights
    // exactly the high-excess (low-scoring) domains
    val m = rows.map(r => r._1 -> BigInt(r._2) * (1000000L + r._4)).toMap
    val mSum = m.values.sum
    rows.foreach { case (src, _, _, _, w) =>
      val exact = m(src) * 1000000 / mSum
      assert((BigInt(w) - exact).abs <= 1, s"$src ppm vs exact share")
    }
    graft.operators.PlanCache.releaseAll()
  }

  test("readability: per-language panel matches a Scala replay") {
    val docs = graft.sources.Tables.documents(spark, dir)
      .select($"lang", $"text").as[(String, String)].collect()
    def runs(t: String) = "[aeiou]+".r.findAllIn(t).size.toLong
    val expect = docs.groupBy(_._1).map { case (l, ds) =>
      val nw = ds.map(_._2.split(" ", -1).length.toLong).sum
      val syl = ds.map(d => runs(d._2)).sum
      val nlong = ds.map(_._2.split(" ", -1).count(w => runs(w) >= 3)
        .toLong).sum
      l -> ((ds.size.toLong, nw, syl, nlong))
    }
    val out = DocQueries.textReadability(spark, dir)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
    assert(out.map(_._1).sorted.toSeq == expect.keys.toSeq.sorted)
    out.foreach { case (l, nd, nw, syl, nlong, sp, lp) =>
      assert((nd, nw, syl, nlong) == expect(l), s"$l masses")
      assert(sp == syl * 1000 / nw && lp == nlong * 1000 / nw, s"$l permille")
    }
    graft.operators.PlanCache.releaseAll()
  }

  test("DP geometric: noise replays the seeded inverse-CDF exactly") {
    val out = graft.queries.AnalyticsQueries.dpGeometricCounts(spark, dir)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    val keyOf = graft.sources.Tables.nation(spark, dir)
      .select($"n_name", $"n_nationkey").as[(String, Long)].collect().toMap
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    out.foreach { case (name, tc, noise, nc, err) =>
      val u = java.lang.Long.parseLong(
        md5hex(s"dp|${keyOf(name)}").substring(0, 15), 16)
      val v = u % 65536 + 1
      val m = math.max(16 - java.lang.Long.toBinaryString(v).length, 0)
      val expect = if ((u / 65536) % 2 == 1) -m else m
      assert(noise == expect, s"$name noise")
      assert(nc == math.max(tc + noise, 0L) && err == math.abs(nc - tc))
    }
    graft.operators.PlanCache.releaseAll()
  }

  test("context fit: masses reconcile and tighten monotonically") {
    val docs = graft.sources.Tables.documents(spark, dir)
    val total = docs
      .selectExpr("sum(size(split(text, ' ')))").as[Long].head()
    val rows = DocQueries.pipeContextFit(spark, dir)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(16L, 32L, 64L))
    rows.foreach { case (l, nd, ntr, kept, lost, pad, pm) =>
      assert(nd == docs.count())
      assert(kept + lost == total, s"L=$l mass split")
      assert(kept + pad == l * nd, s"L=$l padding identity")
      assert(pm == kept * 1000 / total, s"L=$l permille")
      assert(ntr >= 0 && ntr <= nd)
    }
    // a longer context never keeps less and never truncates more
    assert(rows.sliding(2).forall { case Array(a, b) =>
      b._4 >= a._4 && b._3 <= a._3 })
    graft.operators.PlanCache.releaseAll()
  }
}
