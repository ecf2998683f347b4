package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Sink surface (reference analog: the GTiff writer + output-directory
  * handling, `color_image_composite.cpp:11-57`; SURVEY §2.1 S3/S4).
  * Thin, deliberately opinionated wrappers encoding the layouts that
  * matter at 100 TB:
  *
  *  - [[writePartitioned]]: hive-style directory partitioning — readers
  *    prune whole directories on the partition predicate.
  *  - [[writeSortedParquet]]: sortWithinPartitions before write gives
  *    parquet min/max row-group statistics real selectivity (clustered
  *    data → tight ranges → row-group skipping on point/range filters).
  *  - [[writeBucketed]]: catalog-backed bucketing — repeated joins/aggs
  *    on the bucket key skip their shuffle entirely (BucketingSpec).
  *
  * All writers are overwrite-idempotent (safe re-runs of a failed job).
  */
object Sinks {

  def writePartitioned(df: DataFrame, partitionCols: Seq[String],
                       path: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
      .parquet(path)

  def writeSortedParquet(df: DataFrame, sortCols: Seq[String],
                         path: String): Unit =
    df.sortWithinPartitions(sortCols.map(col): _*)
      .write.mode(SaveMode.Overwrite).parquet(path)

  def writeBucketed(df: DataFrame, buckets: Int, keyCols: Seq[String],
                    table: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, keyCols.head, keyCols.tail: _*)
      .sortBy(keyCols.head, keyCols.tail: _*)
      .saveAsTable(table)

  /** Small-file compaction (the OPTIMIZE job): rewrite a fragmented
    * parquet directory into `targetFiles` splits. Small files are the
    * classic lakehouse degradation — per-file open/footer overhead and
    * task-scheduling cost dominate once files shrink below a split; a
    * periodic compaction pass restores scan efficiency. Reads the
    * existing layout, repartitions to the target width, writes to a
    * fresh directory (atomic swap is the caller's rename). */
  def compact(spark: SparkSession, inPath: String,
              outPath: String, targetFiles: Int): Unit =
    spark.read.parquet(inPath)
      .repartition(targetFiles)
      .write.mode(SaveMode.Overwrite).parquet(outPath)

  def writeCsv(df: DataFrame, path: String, header: Boolean = true): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("header", header.toString).csv(path)

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)
}
