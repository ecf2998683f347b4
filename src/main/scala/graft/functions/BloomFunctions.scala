package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** Expose Spark's internal Bloom-filter expressions (the machinery
  * behind runtime row-level filtering, `InjectRuntimeFilter`) as
  * session functions — the explicit form of the bloom-pruned semi join
  * for when the planner's automatic injection doesn't fire (e.g. the
  * build side is another engine's artifact, or the filter is applied
  * across queries).
  *
  * `bloom_agg(key, estItems, numBits)` builds a
  * `org.apache.spark.util.sketch.BloomFilter` as BINARY;
  * `bloom_contains(bloom, key)` probes it. The probe side requires the
  * bloom as a constant or scalar subquery (BloomFilterMightContain's
  * input check), hence the SQL-front-end shape in
  * `Relational.bloomSemiJoin`.
  */
object BloomFunctions {
  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "bloom_agg" -> (es => new BloomFilterAggregate(es(0), es(1), es(2))),
    "bloom_contains" -> (es => BloomFilterMightContain(es(0), es(1))),
  )

  /** Idempotent session-local registration. */
  def register(spark: SparkSession): Unit = all.foreach { case (name, builder) =>
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, builder, "built-in")
  }
}
