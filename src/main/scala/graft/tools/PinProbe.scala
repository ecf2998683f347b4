package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Dev-only attribution probe (VERDICT r13 #1): do the prewarm-pinned
  * shared frames SURVIVE, still cached, from the prewarm to their
  * first consumer in a full-registry pass? Reproduces the bench's
  * structure — prewarm every family's pins, run the alphabetical
  * registry prefix up to a target query, then (a) report each pin's
  * storage level and a timed re-count (warm ≈ 0.1 s, a silently-
  * rebuilt frame ≈ its cold build), and (b) time the target queries.
  *
  * With `--warmup` the probe FIRST replicates Bench's untimed full-
  * registry warm-up + clearCache (without pruneStale — the r14 bug
  * reproduction: the warm-up leaves same-plan-as-pin entries in
  * PlanCache.live, and pass-1 FIFO evictions then uncache the pins BY
  * PLAN); `--warmup-prune` replicates the FIXED warm-up
  * (clearCache + pruneStale paired).
  *
  * Usage: runMain graft.tools.PinProbe [--warmup|--warmup-prune] [sfDir] [target...]
  */
object PinProbe {
  def main(args: Array[String]): Unit = {
    val flags = args.filter(_.startsWith("--")).toSet
    val rest = args.filterNot(_.startsWith("--"))
    val dir = if (rest.nonEmpty) rest(0) else "/root/testdata/sf0.1"
    val targets = if (rest.length > 1) rest.tail.toSeq
                  else Seq("rel_kll_error", "rel_kll_group_quantiles",
                           "rel_kll_merge", "rel_kll_quantiles")
    val spark = graft.GraftSession.tuned(
        SparkSession.builder().master("local[32]"), 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if (flags("--warmup") || flags("--warmup-prune")) {
      val t0 = System.nanoTime()
      SparkEntry.queries.foreach { case (_, fn) =>
        try fn(spark, dir).queryExecution.toRdd.count()
        catch { case _: Throwable => () }
      }
      spark.catalog.clearCache()
      if (flags("--warmup-prune")) graft.operators.PlanCache.pruneStale()
      println(f"[probe] warm-up (prune=${flags("--warmup-prune")}) in ${(System.nanoTime() - t0) / 1e9}%.1f s; plan_cache=${graft.operators.PlanCache.stats}")
    }

    val frames =
      graft.queries.DocQueries.prewarmSharedFrames(spark, dir) ++
      graft.queries.VectorQueries.prewarmSharedFrames(spark, dir) ++
      graft.queries.RelationalQueries.prewarmSharedFrames(spark, dir) ++
      graft.queries.EventQueries.prewarmSharedFrames(spark, dir)
    frames.foreach { case (n, df) =>
      val t0 = System.nanoTime()
      try df.queryExecution.toRdd.count()
      catch { case _: Throwable => () }
      println(f"[probe] prewarm $n: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def pinState(tag: String): Unit = frames.foreach { case (n, df) =>
      val lvl = df.storageLevel
      val t0 = System.nanoTime()
      try df.queryExecution.toRdd.count()
      catch { case _: Throwable => () }
      println(f"[probe] $tag $n: level=$lvl recount=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    pinState("post-prewarm")

    val firstTarget = targets.head
    val prefix = SparkEntry.queries.keys.toSeq.sorted
      .takeWhile(_ != firstTarget)
    val tPrefix0 = System.nanoTime()
    prefix.foreach { n =>
      try SparkEntry.queries(n)(spark, dir).queryExecution.toRdd.count()
      catch { case _: Throwable => () }
    }
    println(f"[probe] ran ${prefix.size} prefix queries in ${(System.nanoTime() - tPrefix0) / 1e9}%.1f s; plan_cache=${graft.operators.PlanCache.stats}")

    pinState("post-prefix")
    targets.foreach { n =>
      val t0 = System.nanoTime()
      try SparkEntry.queries(n)(spark, dir).queryExecution.toRdd.count()
      catch { case _: Throwable => () }
      println(f"[probe] target $n: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
