package graft

import org.apache.spark.sql.functions._

import graft.operators.ChangeCapture

/** CDC merge-action classification + SCD2 fold laws. */
class ChangeCaptureSpec extends SparkSpec {
  import spark.implicits._

  private def cur = Seq(
    (1L, "A", 10.0), // unchanged
    (2L, "A", 20.0), // price changes
    (3L, "B", 30.0), // deleted
    (4L, null.asInstanceOf[String], 40.0) // null attr, unchanged
  ).toDF("k", "status", "price")

  private def stg = Seq(
    (1L, "A", 10.0),
    (2L, "A", 25.0),
    (4L, null.asInstanceOf[String], 40.0),
    (5L, "C", 50.0) // inserted
  ).toDF("k", "status", "price")

  private def actions =
    ChangeCapture.mergeActions(cur, stg, "k", Seq("status", "price"))

  test("mergeActions classifies each key; nulls compare null-safely") {
    val got = actions.select($"k", col(ChangeCapture.ActionCol)).as[(Long, String)]
      .collect().toMap
    assert(got == Map(1L -> "NOOP", 2L -> "UPDATE", 3L -> "DELETE",
                      4L -> "NOOP", 5L -> "INSERT"))
  }

  test("mergeActions partitions the key universe exactly once") {
    assert(actions.count() == 5)
    assert(actions.select($"k").distinct().count() == 5)
  }

  test("scd2Apply emits closed+open for UPDATE, closed for DELETE, open for INSERT") {
    val withFrom = cur.withColumn("since", lit("2000-01-01").cast("timestamp"))
    // staged carries the same `since` (it is the tracked valid-from, not
    // a changing attribute) so change detection rides on status/price
    val acts = ChangeCapture.mergeActions(
      withFrom, stg.withColumn("since", lit("2000-01-01").cast("timestamp")),
      "k", Seq("status", "price", "since"))
    val hist = ChangeCapture.scd2Apply(acts, "k",
      Seq("status", "price"), "since", lit("2002-06-01").cast("timestamp"))
    val byKey = hist.groupBy($"k")
      .agg(count(lit(1)).as("n"),
           sum(when($"is_current", 1).otherwise(0)).as("n_open"))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(byKey == Map(
      1L -> ((1L, 1L)), // NOOP: single open row
      2L -> ((2L, 1L)), // UPDATE: closed + open
      3L -> ((1L, 0L)), // DELETE: closed only
      4L -> ((1L, 1L)),
      5L -> ((1L, 1L)))) // INSERT: open only
    // the open row for an updated key carries the NEW value
    val openPrice2 = hist.filter($"k" === 2L && $"is_current")
      .select($"price").as[Double].head()
    assert(openPrice2 == 25.0)
    // the closed row keeps the OLD value and closes at the batch ts
    val closed2 = hist.filter($"k" === 2L && !$"is_current")
      .select($"price", $"valid_to".cast("string")).as[(Double, String)].head()
    assert(closed2._1 == 20.0 && closed2._2.startsWith("2002-06-01"))
    // open rows are open
    assert(hist.filter($"is_current" && $"valid_to".isNotNull).count() == 0)
  }

  test("incremental sum/count maintenance equals a full recompute") {
    import graft.queries.Canon
    val cur2 = Seq((1L, "a", 10.0), (2L, "a", 20.0), (3L, "b", 30.0))
      .toDF("k", "grp", "v")
    // group move (1: a→b), in-place update (2), delete (3), insert (4)
    val stg2 = Seq((1L, "b", 10.0), (2L, "a", 25.0), (4L, "c", 5.0))
      .toDF("k", "grp", "v")
    val base = cur2.groupBy($"grp")
      .agg(count(lit(1)).as("n_rows"), sum(Canon.dec($"v")).as("sum_dec"))
    val acts2 = ChangeCapture.mergeActions(cur2, stg2, "k", Seq("grp", "v"))
    val got = ChangeCapture.incrementalSumCount(acts2, base, "grp", "v")
      .select($"grp", $"n_rows", $"sum_dec".cast("double"))
      .as[(String, Long, Double)].collect().sortBy(_._1).toSeq
    val full = stg2.groupBy($"grp")
      .agg(count(lit(1)).as("n_rows"),
           sum(Canon.dec($"v")).cast("double").as("s"))
      .as[(String, Long, Double)].collect().sortBy(_._1).toSeq
    assert(got == full)
    // group 'b' gained the moved row; 'a' net count fell to 1
    assert(got.map(r => r._1 -> r._2).toMap == Map("a" -> 1L, "b" -> 1L, "c" -> 1L))
  }

  test("applying a snapshot to itself is all NOOP") {
    val acts = ChangeCapture.mergeActions(cur, cur, "k", Seq("status", "price"))
    assert(acts.filter(col(ChangeCapture.ActionCol) =!= "NOOP").count() == 0)
  }

  test("contract violations fail loudly at call time, not as Catalyst aliases") {
    val df = Seq((1L, "a")).toDF("k", "status")
    intercept[IllegalArgumentException] {       // no compare columns
      ChangeCapture.mergeActions(df, df, "k", Seq.empty)
    }
    intercept[IllegalArgumentException] {       // missing compare column
      ChangeCapture.mergeActions(df, df, "k", Seq("price"))
    }
    intercept[IllegalArgumentException] {       // actions ≠ mergeActions output
      ChangeCapture.incrementalSumCount(df, df, "grp", "v")
    }
    val acts = ChangeCapture.mergeActions(
      Seq((1L, "a", 1.0)).toDF("k", "grp", "v"),
      Seq((1L, "b", 2.0)).toDF("k", "grp", "v"), "k", Seq("grp", "v"))
    intercept[IllegalArgumentException] {       // base missing the aggregate cols
      ChangeCapture.incrementalSumCount(acts, df, "grp", "v")
    }
  }
}
