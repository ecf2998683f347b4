package graft

import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def blobs = Seq(
    (1L, Array.tabulate(600)(i => (i % 251).toByte)),  // 3 frames of 256
    (2L, Array[Byte](10, 20, 30)),
    (3L, Array.emptyByteArray)
  ).toDF("media_id", "bin")

  test("feature extraction: exact byte arithmetic incl. unsigned bytes") {
    val f = Multimodal.extractFeatures(blobs, "media_id", "bin")
      .collect().map(m => m.media_id -> m).toMap
    assert(f(2L).n_bytes == 3 && f(2L).byte_sum == 60 && f(2L).byte_mean == 20.0)
    assert(f(2L).n_frames == 1)
    assert(f(1L).n_bytes == 600 && f(1L).n_frames == 3)
    val expectedSum = (0 until 600).map(_ % 251).sum
    assert(f(1L).byte_sum == expectedSum, "bytes must be treated unsigned")
    assert(f(3L).n_bytes == 0 && f(3L).byte_mean == 0.0 && f(3L).n_frames == 0)
  }

  test("frame sampling: stride, last-frame remainder, empty blob") {
    val fr = Multimodal.sampleFrames(blobs, "media_id", "bin", frameSize = 256,
                                     stride = 2)
      .collect().map(f => (f.media_id, f.frame_idx) -> f.n_bytes).toMap
    assert(fr((1L, 0)) == 256)
    assert(fr((1L, 2)) == 88)          // 600 - 2*256
    assert(!fr.contains((1L, 1)))      // stride skips odd frames
    assert(fr((2L, 0)) == 3)
    assert(!fr.keySet.exists(_._1 == 3L))
  }

  test("frame features: per-frame unsigned sums, remainder frame, empty blob") {
    val ff = Multimodal.frameFeatures(blobs, "media_id", "bin", frameSize = 256)
      .collect().map(f => (f.media_id, f.frame_idx) -> f.byte_sum).toMap
    val bytes = (0 until 600).map(_ % 251)
    assert(ff((1L, 0)) == bytes.take(256).sum)
    assert(ff((1L, 1)) == bytes.slice(256, 512).sum)
    assert(ff((1L, 2)) == bytes.drop(512).sum)    // 88-byte remainder
    assert(ff((2L, 0)) == 60)
    assert(!ff.keySet.exists(_._1 == 3L))         // empty blob → no frames
  }

  test("ImageIoCodec: real TIFF encode→decode roundtrip matches the pixel formula") {
    // Known 8×6×3 image, integer samples in [0,256) so the unsigned-byte
    // clamp is the identity and the expected features are exact.
    val (w, h, nb) = (8, 6, 3)
    val bands = Array.tabulate(nb)(b =>
      Array.tabulate(w * h)(i => ((b * 97 + i * 31) % 256).toFloat))
    val tiff = graft.sources.Raster.TiffCodec.encodeRgb(w, h, bands)
    assert(graft.sources.Raster.TiffCodec.isTiff(tiff))

    val decoded = Multimodal.ImageIoCodec.decode(tiff)
    val expected = bands.flatMap(_.map(_.toInt.toByte))   // band-major
    assert(decoded.toSeq == expected.toSeq)

    val feats = Multimodal.ImageIoCodec.features(7L, tiff, frameSize = 64)
    val pixSum = bands.map(_.map(_.toLong).sum).sum
    assert(feats == Multimodal.MediaFeatures(
      7L, (w * h * nb).toLong, pixSum, pixSum.toDouble / (w * h * nb),
      ((w * h * nb + 63) / 64)))    // features over DECODED pixels, not wire bytes
  }

  test("FakeCodec decode is the identity (byte-addressable media pass through)") {
    val bytes = Array[Byte](1, 2, 3, -1)
    assert(Multimodal.FakeCodec.decode(bytes).toSeq == bytes.toSeq)
  }

  test("hist pairs: intersections verify exactly the pHash candidate set") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val pairs = graft.queries.MediaQueries.mmPhashPairs(spark, dir)
      .as[(String, String, Long)].collect()
      .map(p => (p._1, p._2) -> p._3).toMap
    val out = graft.queries.MediaQueries.mmHistPairs(spark, dir)
      .as[(String, String, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    // every output pair is a verified near-dup candidate with the same
    // hamming, and the similarity is a valid pixel-mass share
    out.foreach { case (a, b, hm, mass, pm) =>
      assert(pairs.get((a, b)).contains(hm), s"($a,$b) not a candidate")
      assert(mass >= 1 && mass <= 48 && pm == mass * 1000 / 48)
    }
    // replay one pair's intersection from the GENERATING formula — an
    // engine-independent recompute (band 1, v = (id·7+13+y·3+x·5)%256)
    val (fa, fb, _, mass0, _) = out.minBy(r => (r._1, r._2))
    def hist(f: String): Map[Long, Long] = {
      val id = "doc_(\\d+)".r.findFirstMatchIn(f).get.group(1).toLong
      (for (y <- 0 until 6; x <- 0 until 8)
        yield ((id * 7 + 13 + y * 3 + x * 5) % 256) / 32L)
        .groupBy(b => b).map { case (b, v) => b -> v.size.toLong }
    }
    val (ha, hb) = (hist(fa), hist(fb))
    val inter = (0L to 7L).map(b =>
      math.min(ha.getOrElse(b, 0L), hb.getOrElse(b, 0L))).sum
    assert(mass0 == inter)
    graft.operators.PlanCache.releaseAll()
  }

  test("windowEnergy: exact integer windows, ragged tail, negative peaks") {
    import spark.implicits._
    // media 1: samples 3, -4, 2, 2, -5 with window 2 → ragged last window
    val pcm = Seq((1L, 0L, 3L), (1L, 1L, -4L), (1L, 2L, 2L),
                  (1L, 3L, 2L), (1L, 4L, -5L),
                  (2L, 0L, 0L), (2L, 1L, 0L)).toDF("m", "t", "s")
    val got = Multimodal.windowEnergy(pcm, "m", "t", "s", 2)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6))).toSet
    assert(got.toMap == Map(
      (1L, 0L) -> ((2L, 4L, 25L, 12L)),   // 9+16=25, 25 DIV 2 = 12
      (1L, 1L) -> ((2L, 2L, 8L, 4L)),
      (1L, 2L) -> ((1L, 5L, 25L, 25L)),   // ragged tail window
      (2L, 0L) -> ((2L, 0L, 0L, 0L))))    // digital silence
  }
}
