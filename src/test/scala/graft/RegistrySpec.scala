package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry integrity guard (round-13 incident): [[SparkEntry]] merges
  * the per-family query and oracle maps with `++`, so a key reused in
  * a LATER family file silently SHADOWS the earlier row — and the
  * oracle gate still reads all-green, because the one surviving
  * (query, oracle) pair is self-consistent. The only external symptom
  * is that the registry COUNT doesn't grow (caught by hand in r13 when
  * `evt_retention_cohorts` was re-registered from EventQueries and
  * shadowed the r12 AnalyticsQueries row). This spec makes that
  * tripwire structural: every key is defined by exactly one family,
  * and queries/oracles stay in 1:1 correspondence.
  *
  * Plain FunSuite — no SparkSession needed; the maps are pure values.
  */
class RegistrySpec extends AnyFunSuite {

  private val families: Seq[(String, Map[String, _], Map[String, String])] =
    Seq(
      ("Band", graft.queries.BandQueries.registry,
               graft.queries.BandQueries.oracles),
      ("Raster", graft.queries.RasterQueries.registry,
                 graft.queries.RasterQueries.oracles),
      ("Relational", graft.queries.RelationalQueries.registry,
                     graft.queries.RelationalQueries.oracles),
      ("Tpch", graft.queries.TpchQueries.registry,
               graft.queries.TpchQueries.oracles),
      ("Cdc", graft.queries.CdcQueries.registry,
              graft.queries.CdcQueries.oracles),
      ("Analytics", graft.queries.AnalyticsQueries.registry,
                    graft.queries.AnalyticsQueries.oracles),
      ("Doc", graft.queries.DocQueries.registry,
              graft.queries.DocQueries.oracles),
      ("Pii", graft.queries.PiiQueries.registry,
              graft.queries.PiiQueries.oracles),
      ("Vector", graft.queries.VectorQueries.registry,
                 graft.queries.VectorQueries.oracles),
      ("Event", graft.queries.EventQueries.registry,
                graft.queries.EventQueries.oracles),
      ("Media", graft.queries.MediaQueries.registry,
                graft.queries.MediaQueries.oracles))

  test("no query key is registered by more than one family") {
    val owners = families.flatMap { case (fam, reg, _) =>
      reg.keys.map(_ -> fam)
    }
    val dups = owners.groupBy(_._1).filter(_._2.length > 1)
    assert(dups.isEmpty,
      s"shadowed keys: ${dups.map { case (k, fs) =>
        s"$k <- ${fs.map(_._2).mkString(",")}" }.mkString("; ")}")
    // and the merged registry really carries every family's rows
    assert(SparkEntry.queries.size == owners.size)
  }

  test("oracles and queries are in 1:1 correspondence, per family") {
    families.foreach { case (fam, reg, ora) =>
      val noOracle = reg.keySet -- ora.keySet
      val noQuery = ora.keySet -- reg.keySet
      assert(noOracle.isEmpty, s"$fam queries without an oracle: $noOracle")
      assert(noQuery.isEmpty, s"$fam oracles without a query: $noQuery")
    }
    assert(SparkEntry.oracleSql.size == SparkEntry.queries.size)
  }
}
