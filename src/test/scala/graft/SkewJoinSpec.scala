package graft

import org.apache.spark.sql.functions._

/** AQE skew-join: prove the runtime actually SPLITS a skewed partition
  * (not just that the conf is set). GraftSession enables
  * `spark.sql.adaptive.skewJoin`; this spec drives a join whose left
  * side puts ~all rows on one key and asserts (a) the executed plan
  * marks the sort-merge join `isSkew`, and (b) the result equals the
  * same join computed with AQE's splitting disabled — correctness is
  * invariant under the physical rescue. */
class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  private def withConf[T](pairs: (String, String)*)(body: => T): T = {
    val olds = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("a hot key triggers AQE skew split; results are unchanged by it") {
    // 50k rows on key 0, a trickle elsewhere — one fat shuffle partition
    val left = spark.range(0, 50000).select(
      when($"id" < 49500, lit(0L)).otherwise($"id" % 97).as("k"),
      ($"id" * 7 % 1000).as("v"))
    val right = spark.range(0, 97).select($"id".as("k"), ($"id" * 3).as("w"))
    def run(skew: Boolean): (Long, Long, String) = withConf(
      "spark.sql.adaptive.skewJoin.enabled" -> skew.toString,
      // thresholds scaled down so a local-mode partition counts as skewed
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      // no broadcast, no partition coalescing hiding the skew path
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false") {
      val joined = left.join(right.hint("merge"), Seq("k"))
        .agg(count(lit(1)).as("n"), sum($"v" + $"w").as("s"))
      val Array(row) = joined.collect()
      (row.getLong(0), row.getLong(1),
        joined.queryExecution.executedPlan.toString)
    }
    val (nSkew, sSkew, planSkew) = run(skew = true)
    val (nOff, sOff, _) = run(skew = false)
    assert(planSkew.contains("skew=true"),
      s"executed plan shows no skew split:\n${planSkew.take(2000)}")
    assert((nSkew, sSkew) == ((nOff, sOff)),
      "skew-split join changed the result")
  }
}
