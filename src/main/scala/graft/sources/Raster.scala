package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One decoded band row before pixel explosion. */
private[sources] case class BandRow(file: String, band: Int, w: Int, h: Int,
                                    values: Array[Float])

/** Raster ingestion: directory of raster blobs → long-format pixels
  * DataFrame `pixels(file, band, y, x, value)` — the Spark-native form
  * of the reference's GDAL read path (`GDALOpen` + per-band
  * `GDALRasterIO`, band_mean_computation.cpp:12-31; SURVEY §1.4).
  *
  * The decode itself is a plain Scala UDF over `binaryFile` content; no
  * GDAL exists in this container, so the wire format is [[GraftRasterCodec]]
  * — a toy deterministic header+Float32 layout standing in for GeoTIFF.
  * Swapping in a real TIFF decoder changes only the UDF body; the
  * exploded long format, the partitioning story (one input file per
  * task, pixels never leave the task until an aggregation shuffles
  * *statistics*, not pixels), and every downstream operator stay as-is.
  */
object Raster {

  /** Toy raster wire format: little-endian
    * [w: Int][h: Int][nBands: Int] then nBands × (w·h) Float32s,
    * band-major (the reference's band-at-a-time layout, SURVEY §1.3). */
  object GraftRasterCodec {
    def encode(w: Int, h: Int, bands: Array[Array[Float]]): Array[Byte] = {
      require(bands.forall(_.length == w * h), "band size must be w*h")
      val buf = ByteBuffer.allocate(12 + 4 * bands.length * w * h)
        .order(ByteOrder.LITTLE_ENDIAN)
      buf.putInt(w).putInt(h).putInt(bands.length)
      bands.foreach(b => b.foreach(buf.putFloat))
      buf.array()
    }

    /** → (w, h, bands). Malformed input → None (the reference turns I/O
      * failures into synthetic zero rows, band_mean_computation.cpp:13-16;
      * we surface them as an absent decode instead — explicit, testable). */
    def decode(bytes: Array[Byte]): Option[(Int, Int, Array[Array[Float]])] = {
      if (bytes == null || bytes.length < 12) return None
      val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      val w = buf.getInt; val h = buf.getInt; val nb = buf.getInt
      if (w <= 0 || h <= 0 || nb <= 0 ||
          bytes.length < 12 + 4L * nb * w * h) return None
      Some((w, h, Array.fill(nb)(Array.fill(w * h)(buf.getFloat))))
    }
  }

  // (BandRow is top-level in this package: a case class nested inside an
  // object breaks whole-stage codegen's constructor lookup and silently
  // falls back to interpreted execution.)

  /** binaryFile scan (+ glob pushdown) → decode UDF → per-band rows →
    * posexplode to pixels. Column pruning keeps `content` out of any
    * plan that only needs metadata; the explode runs inside the scan
    * task, so pixel rows are pipelined straight into whatever aggregate
    * or filter follows (never materialized whole, unlike the reference's
    * full-band buffers).
    */
  def pixels(spark: SparkSession, dir: String, glob: String = "*.graftraster"): DataFrame = {
    import spark.implicits._
    val decoded = Tables.binaryFiles(spark, dir, glob)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        GraftRasterCodec.decode(bytes).toSeq.flatMap { case (w, h, bands) =>
          bands.iterator.zipWithIndex.map { case (vals, i) =>
            BandRow(path, i + 1, w, h, vals)
          }
        }
      }
    decoded.toDF()
      .select(col("file"), col("band"), col("w"),
              posexplode(col("values")).as(Seq("pos", "value")))
      .select(col("file"), col("band"),
              (col("pos") / col("w")).cast("int").as("y"),
              (col("pos") % col("w")).cast("int").as("x"),
              col("value"))
  }

  /** Composite sink: RGB rows → parquet, one directory per run with the
    * reference's `<stem>_color` naming handled by the path column
    * (color_image_composite.cpp:15-19). Parquet stands in for the GTiff
    * writer (S3 in SURVEY §2.1) — the oracle-checked representation. */
  def writeComposite(rgb: DataFrame, outDir: String): Unit =
    rgb.write.mode("overwrite").partitionBy("file").parquet(outDir)
}
