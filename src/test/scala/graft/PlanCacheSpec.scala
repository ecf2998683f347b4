package graft

import org.apache.spark.storage.StorageLevel

import graft.operators.PlanCache

/** Lifecycle contract of the plan-reuse persist registry: bounded live
  * set (FIFO past the cap), idempotence on cached plans, full release. */
class PlanCacheSpec extends SparkSpec {

  test("live persists are bounded: oldest unpersists past the cap") {
    PlanCache.releaseAll()
    val frames = (0 until PlanCache.MaxLive + 4)
      .map(i => spark.range(i, i + 100).toDF())
    frames.foreach(PlanCache.reuse)
    assert(PlanCache.liveCount <= PlanCache.MaxLive,
      s"cap breached: ${PlanCache.liveCount}")
    // the first-inserted frames were evicted, the newest are still live
    assert(frames.head.storageLevel == StorageLevel.NONE,
      "oldest entry must have been unpersisted (FIFO)")
    assert(frames.last.storageLevel != StorageLevel.NONE,
      "newest entry must still be persisted")
  }

  test("pinned frames are exempt from eviction until releaseAll") {
    PlanCache.releaseAll()
    val pinned = PlanCache.pin(PlanCache.reuse(spark.range(9000, 9100).toDF()))
    (0 until PlanCache.MaxLive + 4)
      .foreach(i => PlanCache.reuse(spark.range(i, i + 100).toDF()))
    assert(pinned.storageLevel != StorageLevel.NONE,
      "pin must survive a full LRU churn")
    PlanCache.releaseAll()
    assert(pinned.storageLevel == StorageLevel.NONE,
      "releaseAll must release pins too")
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
