package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.operators.Composite
import graft.sources.Raster
import graft.sources.Raster.GraftRasterCodec

/** Golden composite test (SURVEY §5.2): fixed synthetic 4×4 6-band
  * raster → byte-exact RGB output with the reference's band contract
  * (R,G,B) = (band4, band3, band2) (color_image_composite.cpp:34-53,
  * 179-181), plus the decode → long-format → pivot pipeline end-to-end
  * and the path-derivation rule. */
class CompositeRasterSpec extends SparkSpec {
  import spark.implicits._

  private val W = 4; private val H = 4
  /** band b, pixel (y,x) → 100·b + 10·y + x — unique, easy to assert. */
  private def bandVals(b: Int): Array[Float] =
    Array.tabulate(W * H)(p => (100 * b + 10 * (p / W) + (p % W)).toFloat)

  test("codec round-trips") {
    val bands = Array.tabulate(6)(i => bandVals(i + 1))
    val Some((w, h, back)) = GraftRasterCodec.decode(
      GraftRasterCodec.encode(W, H, bands))
    assert(w == W && h == H && back.length == 6)
    assert(back.zip(bands).forall { case (a, b) => a.sameElements(b) })
  }

  test("malformed blobs decode to None (reference zeros-on-error, cpp:13-16)") {
    assert(GraftRasterCodec.decode(null).isEmpty)
    assert(GraftRasterCodec.decode(Array[Byte](1, 2, 3)).isEmpty)
    // header promising more data than present
    val truncated = GraftRasterCodec.encode(W, H, Array.tabulate(6)(i => bandVals(i + 1)))
      .take(20)
    assert(GraftRasterCodec.decode(truncated).isEmpty)
  }

  test("golden composite: (r,g,b) = bands (4,3,2) per pixel") {
    val dir = Files.createTempDirectory("graft_raster").toFile
    val blob = GraftRasterCodec.encode(W, H, Array.tabulate(6)(i => bandVals(i + 1)))
    Files.write(new java.io.File(dir, "scene1.graftraster").toPath, blob)

    val px = Raster.pixels(spark, dir.getAbsolutePath)
    assert(px.count() == 6L * W * H)

    val rgb = Composite.rgbComposite(px).orderBy("y", "x").collect()
    assert(rgb.length == W * H)
    rgb.foreach { r =>
      val (y, x) = (r.getInt(1), r.getInt(2))
      assert(r.getFloat(3) == 400f + 10 * y + x, "r must be band 4")
      assert(r.getFloat(4) == 300f + 10 * y + x, "g must be band 3")
      assert(r.getFloat(5) == 200f + 10 * y + x, "b must be band 2")
    }
  }

  test("output path derivation (cpp:15-19)") {
    val out = Seq("dataset/foo.tif").toDF("path")
      .select(Composite.colorOutputPath($"path", "colorimage").as("p"))
      .as[String].head()
    assert(out == "colorimage/foo_color.tif")
  }

  test("TIFF roundtrip: encodeRgb → isTiff → ImageIO decode, byte-exact") {
    val rgb = Array.tabulate(3)(b =>
      Array.tabulate(W * H)(p => ((b * 83 + p * 7) % 256).toFloat))
    val blob = Raster.TiffCodec.encodeRgb(W, H, rgb)
    assert(Raster.TiffCodec.isTiff(blob), "writer output must carry TIFF magic")
    assert(!Raster.TiffCodec.isTiff(GraftRasterCodec.encode(W, H, rgb)))
    val Some((w, h, back)) = Raster.TiffCodec.decode(blob)
    assert(w == W && h == H && back.length == 3)
    assert(back.zip(rgb).forall { case (a, b) => a.sameElements(b) },
           "0-255 RGB samples must survive the ImageIO roundtrip exactly")
    // decodeAny dispatches on magic to the same result
    val Some((_, _, viaAny)) = Raster.decodeAny(blob)
    assert(viaAny.zip(rgb).forall { case (a, b) => a.sameElements(b) })
  }

  test("TIFF blobs flow through decodePixels (magic dispatch in-plan)") {
    val rgb = Array.tabulate(3)(b =>
      Array.tabulate(W * H)(p => ((b * 83 + p * 7) % 256).toFloat))
    val files = Seq(("dataset/t.tif", Raster.TiffCodec.encodeRgb(W, H, rgb)))
      .toDF("path", "content")
    val px = Raster.decodePixels(files)
    assert(px.count() == 3L * W * H)
    val band2sum = px.filter($"band" === 2).agg(sum($"value")).head().getDouble(0)
    assert(band2sum == rgb(1).sum.toDouble)
  }

  /** Golden roundtrip for the REAL `.tif` composite sink
    * (color_image_composite.cpp:34-53,173-181): write a fixed synthetic
    * corpus, read the emitted files back through the library's own
    * decoder, and byte-compare every band plane. Values stay in [0,256)
    * so the writer's unsigned-byte clamp is the identity.
    *
    * NOTE (cluster storage): writeCompositeTiff emits via java.nio.file —
    * executor-LOCAL paths, correct in local[*]; a multi-node deployment
    * must target shared storage through the Hadoop FileSystem API (the
    * sink's scaladoc carries the same caveat). */
  test("writeCompositeTiff golden roundtrip: R,G,B = bands 4,3,2, _color.tif naming") {
    val inDir = Files.createTempDirectory("graft_tifin").toFile
    val outDir = Files.createTempDirectory("graft_tifout").toFile
    // band b (1..6), pixel p → (37·b + 5·y + x) mod 256 — unique per
    // (file shift), integer, clamp-free
    def vals(shift: Int, b: Int): Array[Float] =
      Array.tabulate(W * H)(p =>
        ((shift + 37 * b + 5 * (p / W) + (p % W)) % 256).toFloat)
    for ((name, shift) <- Seq("scene1.tif" -> 0, "scene2.tif" -> 11)) {
      val blob = GraftRasterCodec.encode(W, H, Array.tabulate(6)(i => vals(shift, i + 1)))
      Files.write(new java.io.File(inDir, name).toPath, blob)
    }

    val px = Raster.pixels(spark, inDir.getAbsolutePath, "*.tif")
    val audit = Raster.writeCompositeTiff(px, outDir.getAbsolutePath)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2),
                           r.getInt(3), r.getLong(4))).sortBy(_._1)
    assert(audit.length == 2)
    assert(audit.forall { case (_, _, w, h, n) => w == W && h == H && n > 0 })
    // naming contract: <outDir>/colorimage/<stem>_color.tif
    assert(audit.map(_._2.split('/').takeRight(2).mkString("/")).toSeq ==
      Seq("colorimage/scene1_color.tif", "colorimage/scene2_color.tif"))

    // roundtrip 1: direct decode of the written bytes, byte-exact planes
    for ((file, outPath, _, _, _) <- audit) {
      val shift = if (file.endsWith("scene1.tif")) 0 else 11
      val Some((w, h, bands)) = Raster.TiffCodec.decode(
        Files.readAllBytes(java.nio.file.Paths.get(outPath)))
      assert(w == W && h == H && bands.length == 3)
      // output band order R,G,B = input bands 4,3,2 (cpp:34-53)
      assert(bands(0).sameElements(vals(shift, 4)), "R plane must be input band 4")
      assert(bands(1).sameElements(vals(shift, 3)), "G plane must be input band 3")
      assert(bands(2).sameElements(vals(shift, 2)), "B plane must be input band 2")
    }

    // roundtrip 2: the emitted files re-enter the DISTRIBUTED scan path
    val back = Raster.pixels(spark, outDir.getAbsolutePath + "/colorimage",
                             "*_color.tif")
    assert(back.count() == 2L * 3 * W * H)
    val b1 = back.filter($"file".endsWith("scene1_color.tif") && $"band" === 1)
      .agg(sum($"value")).head().getDouble(0)
    assert(b1 == vals(0, 4).sum.toDouble, "re-scanned R plane ≡ band 4 of scene1")
  }
}
