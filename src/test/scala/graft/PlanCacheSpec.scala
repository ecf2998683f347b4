package graft

import org.apache.spark.storage.StorageLevel

import graft.operators.PlanCache

/** Lifecycle contract of the plan-reuse persist registry: bounded live
  * set (FIFO past the cap), idempotence on cached plans, full release. */
class PlanCacheSpec extends SparkSpec {

  test("live persists are bounded: oldest unpersists past the cap") {
    PlanCache.releaseAll()
    val frames = (0 until 20).map(i => spark.range(i, i + 100).toDF())
    frames.foreach(PlanCache.reuse)
    assert(PlanCache.liveCount <= 16, s"cap breached: ${PlanCache.liveCount}")
    // the first-inserted frames were evicted, the newest are still live
    assert(frames.head.storageLevel == StorageLevel.NONE,
      "oldest entry must have been unpersisted (FIFO)")
    assert(frames.last.storageLevel != StorageLevel.NONE,
      "newest entry must still be persisted")
  }

  test("reuse is idempotent on already-cached plans") {
    PlanCache.releaseAll()
    val df = spark.range(0, 50).toDF()
    PlanCache.reuse(df)
    val n = PlanCache.liveCount
    PlanCache.reuse(df) // same (now cached) plan — must not re-enqueue
    assert(PlanCache.liveCount == n)
    PlanCache.releaseAll()
  }

  test("releaseAll unpersists everything and empties the registry") {
    PlanCache.releaseAll()
    val dfs = (0 until 3).map(i => spark.range(i * 7, i * 7 + 10).toDF())
    dfs.foreach(PlanCache.reuse)
    assert(PlanCache.liveCount == 3)
    PlanCache.releaseAll()
    assert(PlanCache.liveCount == 0)
    assert(dfs.forall(_.storageLevel == StorageLevel.NONE))
  }
}
