package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Intervals

/** Binned interval-overlap join ≡ naive range-predicate join, with each
  * overlapping pair emitted exactly once regardless of bin spans. */
class IntervalsSpec extends SparkSpec {
  import spark.implicits._

  // deterministic interval set: starts stride a prime, durations cycle
  // 0..9 bins wide against binWidth=100 — exercises same-bin,
  // multi-bin, and bin-boundary (end exactly on a boundary) cases
  private def side(n: Int, seed: Int): DataFrame =
    (0 until n).map { i =>
      val start = ((i * 37 + seed * 13) % 997).toLong
      val dur = ((i * 53 + seed * 7) % 1000).toLong
      (1L + i % 3, i.toLong, start, start + dur)
    }.toDF("k", "id", "s", "e")

  private def naive(l: DataFrame, r: DataFrame): Set[(Long, Long, Long)] =
    l.toDF("k", "l_id", "l_s", "l_e")
      .join(r.toDF("k", "r_id", "r_s", "r_e"), "k")
      .filter($"l_s" <= $"r_e" && $"r_s" <= $"l_e")
      .select($"k", $"l_id", $"r_id").as[(Long, Long, Long)].collect().toSet

  test("overlapJoin equals the naive range join, no duplicates") {
    val l = side(40, 1); val r = side(40, 2)
    val got = Intervals.overlapJoin(l, r, Seq("k"), "s", "e", binWidthUs = 100L)
    val rows = got.select($"k", $"l_id", $"r_id").as[(Long, Long, Long)]
      .collect()
    assert(rows.length == rows.toSet.size, "a pair was emitted twice")
    assert(rows.toSet == naive(l, r))
  }

  test("bin width does not change the result (only the fan-out)") {
    val l = side(25, 3); val r = side(25, 4)
    val expected = naive(l, r)
    for (bw <- Seq(7L, 100L, 1000L, 100000L)) {
      val got = Intervals.overlapJoin(l, r, Seq("k"), "s", "e", bw)
        .select($"k", $"l_id", $"r_id").as[(Long, Long, Long)].collect()
      assert(got.length == got.toSet.size, s"dup at binWidth=$bw")
      assert(got.toSet == expected, s"mismatch at binWidth=$bw")
    }
  }

  test("touching endpoints count as overlap; disjoint intervals do not") {
    val l = Seq((1L, 10L, 0L, 100L)).toDF("k", "id", "s", "e")
    val r = Seq((1L, 20L, 100L, 200L), // touches at 100 → overlap
                (1L, 21L, 101L, 200L)) // disjoint
      .toDF("k", "id", "s", "e")
    val got = Intervals.overlapJoin(l, r, Seq("k"), "s", "e", 64L)
      .select($"r_id").as[Long].collect().toSeq
    assert(got == Seq(20L))
  }

  test("keys partition the join (no cross-key pairs)") {
    val l = Seq((1L, 1L, 0L, 1000L)).toDF("k", "id", "s", "e")
    val r = Seq((2L, 2L, 0L, 1000L)).toDF("k", "id", "s", "e")
    assert(Intervals.overlapJoin(l, r, Seq("k"), "s", "e", 100L).count() == 0)
  }
}
