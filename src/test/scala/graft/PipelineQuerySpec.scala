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
}
