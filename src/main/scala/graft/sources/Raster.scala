package graft.sources

import java.io.ByteArrayInputStream
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
  * Two wire formats, dispatched on magic bytes:
  *  - real TIFF via the JDK's bundled javax.imageio TIFF plugin
  *    (public API, JDK 9+) — the GeoTIFF-shaped path ([[TiffCodec]]);
  *  - [[GraftRasterCodec]], a deterministic header+Float32 layout for
  *    float bands beyond what baseline TIFF carries.
  * The decode is per-file inside the scan task; the exploded long
  * format, the partitioning story (one input file per task, pixels never
  * leave the task until an aggregation shuffles *statistics*, not
  * pixels), and every downstream operator are format-agnostic.
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

  /** Real TIFF decode/encode through javax.imageio (the JDK bundles a
    * TIFF reader AND writer since JDK 9 — public API, no native lib).
    * This is the GDAL stand-in the reference actually needs: its inputs
    * are multi-band GeoTIFFs read band-at-a-time
    * (band_mean_computation.cpp:12-26). Samples come off the decoded
    * `java.awt.image.Raster` per band, so any sample layout ImageIO
    * understands (banded, interleaved, palette) lands in the same
    * band-major float arrays as [[GraftRasterCodec]]. */
  object TiffCodec {
    // ImageIO's default useCache=true backs EVERY read/write stream with
    // a temp FILE: a corpus-scale decode pass then creates one /tmp file
    // per image, and the creations contend on the filesystem — measured
    // as ANTI-scaling (28k decodes: 4.8 s at 8 cores, 8.0 s at 32).
    // Blobs here are in-memory byte arrays; memory-cached streams are
    // strictly better. JVM-wide static, set once per executor.
    javax.imageio.ImageIO.setUseCache(false)

    /** TIFF magic: little-endian "II*\0" or big-endian "MM\0*". */
    def isTiff(bytes: Array[Byte]): Boolean =
      bytes != null && bytes.length >= 4 &&
        ((bytes(0) == 'I' && bytes(1) == 'I' && bytes(2) == 42 && bytes(3) == 0) ||
         (bytes(0) == 'M' && bytes(1) == 'M' && bytes(2) == 0 && bytes(3) == 42))

    def decode(bytes: Array[Byte]): Option[(Int, Int, Array[Array[Float]])] = {
      if (!isTiff(bytes)) return None
      val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(bytes))
      if (img == null) return None
      val raster = img.getRaster
      val (w, h, nb) = (raster.getWidth, raster.getHeight, raster.getNumBands)
      val bands = Array.tabulate(nb) { b =>
        val out = new Array[Float](w * h)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            out(y * w + x) = raster.getSampleFloat(x, y, b); x += 1
          }
          y += 1
        }
        out
      }
      Some((w, h, bands))
    }

    /** Encode three 0-255 bands as a baseline RGB TIFF (band 1→R, 2→G,
      * 3→B — the reference's band-number convention, 1-based). */
    def encodeRgb(w: Int, h: Int, bands: Array[Array[Float]]): Array[Byte] = {
      require(bands.length == 3, "baseline RGB TIFF carries exactly 3 bands")
      require(bands.forall(_.length == w * h), "band size must be w*h")
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val i = y * w + x
          def clamp(f: Float): Int = math.max(0, math.min(255, f.toInt))
          img.setRGB(x, y, (clamp(bands(0)(i)) << 16) |
                           (clamp(bands(1)(i)) << 8) | clamp(bands(2)(i)))
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      val ok = javax.imageio.ImageIO.write(img, "tiff", bos)
      require(ok, "no TIFF ImageIO writer available (requires JDK 9+)")
      bos.toByteArray
    }
  }

  /** Format dispatch: TIFF by magic, else the toy codec. */
  def decodeAny(bytes: Array[Byte]): Option[(Int, Int, Array[Array[Float]])] =
    if (TiffCodec.isTiff(bytes)) TiffCodec.decode(bytes)
    else GraftRasterCodec.decode(bytes)

  // (BandRow is top-level in this package: a case class nested inside an
  // object breaks whole-stage codegen's constructor lookup and silently
  // falls back to interpreted execution.)

  /** The decode+explode core over ANY (path, content) DataFrame — the
    * binaryFile scan ([[pixels]]) and in-plan blob derivations (the
    * oracle-checked `raster_*` queries, which manufacture deterministic
    * blobs from the documents fixture) share this exact path. The explode
    * runs inside the upstream task, so pixel rows are pipelined straight
    * into whatever aggregate or filter follows (never materialized whole,
    * unlike the reference's full-band buffers). */
  def decodePixels(files: DataFrame): DataFrame = {
    val spark = files.sparkSession
    import spark.implicits._
    val decoded = files
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        decodeAny(bytes).toSeq.flatMap { case (w, h, bands) =>
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

  /** binaryFile scan (+ glob pushdown) → decode → per-band rows →
    * posexplode to pixels. Column pruning keeps `content` out of any
    * plan that only needs metadata. */
  def pixels(spark: SparkSession, dir: String, glob: String = "*.graftraster"): DataFrame =
    decodePixels(Tables.binaryFiles(spark, dir, glob)
      .select(col("path"), col("content")))

  /** Composite sink: RGB rows → parquet, one directory per run with the
    * reference's `<stem>_color` naming handled by the path column
    * (color_image_composite.cpp:15-19). Parquet stands in for the GTiff
    * writer (S3 in SURVEY §2.1) — the oracle-checked representation. */
  def writeComposite(rgb: DataFrame, outDir: String): Unit =
    rgb.write.mode("overwrite").partitionBy("file").parquet(outDir)

  /** Scala-side twin of [[graft.operators.Composite.colorOutputPath]]:
    * `dataset/foo.tif → <subdir>/foo_color.tif` (the reference's naming,
    * color_image_composite.cpp:15-19,173). */
  def colorOutputName(path: String, subdir: String): String = {
    val base = path.substring(path.lastIndexOf('/') + 1)
    subdir + "/" + base.replaceAll("\\.tif$", "_color.tif")
  }

  /** REAL `.tif` composite sink — the reference's actual output format
    * (`color_image_composite.cpp:11-57,173`: one GTiff per input, output
    * band order R,G,B = input bands 4,3,2, `<stem>_color.tif` under
    * `colorimage/`). Input: long-format pixel rows (file, band, y, x,
    * value). One shuffle on the file key groups each image's pixels into
    * a single task; the task assembles the band planes, encodes a
    * baseline RGB TIFF via the JDK imageio writer ([[TiffCodec
    * .encodeRgb]]), and writes its own output file — the per-task file
    * emit of any distributed image sink, no driver collect, TIFF bytes
    * never shuffled. Eager (localCheckpoint) like the other sinks;
    * returns the audit frame (file, out_path, w, h, n_bytes).
    *
    * Storage caveat: files are emitted via `java.nio.file` — executor-
    * LOCAL paths. Correct in local[*] (this box) where driver and
    * executors share one filesystem; a multi-node deployment must write
    * through the Hadoop `FileSystem` API (or mount shared storage at the
    * same path on every executor) for outputs to land somewhere the
    * driver can see. */
  def writeCompositeTiff(pixels: DataFrame, outDir: String,
                         subdir: String = "colorimage"): DataFrame = {
    val spark = pixels.sparkSession
    import spark.implicits._
    val written = graft.operators.Composite.rgbComposite(pixels)
      .select(col("file"), col("y").cast("int"), col("x").cast("int"),
              col("r").cast("float"), col("g").cast("float"),
              col("b").cast("float"))
      .as[(String, Int, Int, Float, Float, Float)]
      .groupByKey(_._1)
      .mapGroups { (file, it) =>
        val rows = it.toArray
        val w = rows.iterator.map(_._3).max + 1
        val h = rows.iterator.map(_._2).max + 1
        val bands = Array.fill(3)(new Array[Float](w * h))
        rows.foreach { case (_, y, x, r, g, b) =>
          val i = y * w + x
          bands(0)(i) = r; bands(1)(i) = g; bands(2)(i) = b
        }
        val bytes = TiffCodec.encodeRgb(w, h, bands)
        val dest = java.nio.file.Paths.get(outDir, colorOutputName(file, subdir))
        java.nio.file.Files.createDirectories(dest.getParent)
        java.nio.file.Files.write(dest, bytes)
        (file, dest.toString, w, h, bytes.length.toLong)
      }
      .toDF("file", "out_path", "w", "h", "n_bytes")
    written.localCheckpoint() // eager: the writes happen exactly once here
  }
}
