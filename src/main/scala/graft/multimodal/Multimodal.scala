package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed batch-at-a-time with
  * `Dataset.mapPartitions` — the Scala analog of `mapInPandas` (iterator
  * of batches in, iterator of batches out; nothing driver-side, state
  * amortized per partition).
  *
  * Two codecs implement the decode stage:
  *  - [[FakeCodec]]: identity decode — features over the wire bytes
  *    directly (the byte-arithmetic shape the text-blob oracles replay);
  *  - [[ImageIoCodec]]: a REAL image decode through the JDK's bundled
  *    javax.imageio TIFF reader (the same public-API path as
  *    [[graft.sources.Raster.TiffCodec]] — no native libs), features over
  *    the decoded band-major samples. No ffmpeg/audio libraries exist in
  *    this container, so video/audio stay byte-shaped; the image path is
  *    end-to-end real (`mm_decode_features`).
  */
object Multimodal {

  /** Decoded per-item features (the "embedding-ish" output of a decode +
    * feature-extract stage). */
  case class MediaFeatures(media_id: Long, n_bytes: Long, byte_sum: Long,
                           byte_mean: Double, n_frames: Int)

  /** A decoded frame slice (frame-sampling output; bytes retained so a
    * downstream stage can run per-frame models). */
  case class Frame(media_id: Long, frame_idx: Int, n_bytes: Int)

  trait MediaCodec extends Serializable {
    /** Media decode: wire bytes → decoded sample bytes. Identity by
      * default (content already byte-addressable — text, PCM audio);
      * [[ImageIoCodec]] overrides with a real image decode. */
    def decode(bytes: Array[Byte]): Array[Byte] = bytes
    /** Cheap deterministic feature extraction over (possibly decoded)
      * bytes. */
    def features(id: Long, bytes: Array[Byte], frameSize: Int): MediaFeatures
  }

  /** Deterministic identity codec: features computed directly over the
    * raw bytes (sum/mean of unsigned values, ceil-division frame count).
    * Identical arithmetic is replayable in SQL for the oracle. */
  object FakeCodec extends MediaCodec {
    override def features(id: Long, bytes: Array[Byte], frameSize: Int): MediaFeatures = {
      var s = 0L
      var i = 0
      while (i < bytes.length) { s += bytes(i) & 0xff; i += 1 }
      val n = bytes.length.toLong
      MediaFeatures(id, n, s, if (n == 0) 0.0 else s.toDouble / n,
                    ((n + frameSize - 1) / frameSize).toInt)
    }
  }

  /** Real image decode via javax.imageio (magic-dispatched through
    * [[graft.sources.Raster.decodeAny]] — TIFF via the JDK reader, the
    * toy float layout otherwise). Decoded samples land band-major,
    * clamped to unsigned bytes; features then run over the DECODED
    * pixels, not the wire bytes — so a TIFF's header/IFD/strip framing
    * never leaks into the feature values, which is what makes the
    * decode oracle-checkable (the SQL twin replays the pixel formula,
    * not the container format). An undecodable blob yields zero samples
    * (explicit, like [[graft.sources.Raster.GraftRasterCodec.decode]]'s
    * None). */
  object ImageIoCodec extends MediaCodec {
    override def decode(bytes: Array[Byte]): Array[Byte] =
      graft.sources.Raster.decodeAny(bytes) match {
        case Some((w, h, bands)) =>
          val out = new Array[Byte](w * h * bands.length)
          var o = 0
          bands.foreach { band =>
            var i = 0
            while (i < band.length) {
              val v = math.max(0f, math.min(255f, band(i))).toInt
              out(o) = v.toByte
              o += 1; i += 1
            }
          }
          out
        case None => Array.emptyByteArray
      }
    override def features(id: Long, bytes: Array[Byte], frameSize: Int): MediaFeatures =
      FakeCodec.features(id, decode(bytes), frameSize)
  }

  val DefaultFrameSize = 256

  /** Batch feature extraction: (id, bytes) rows → MediaFeatures, one
    * codec instance per partition (the mapInPandas batch shape). */
  def extractFeatures(df: DataFrame, idCol: String, binCol: String,
                      codec: MediaCodec = FakeCodec,
                      frameSize: Int = DefaultFrameSize): Dataset[MediaFeatures] = {
    val pairs = df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])](Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
    pairs.mapPartitions { it =>
      it.map { case (id, bytes) =>
        codec.features(id, if (bytes == null) Array.emptyByteArray else bytes,
                       frameSize)
      }
    }(Encoders.product[MediaFeatures])
  }

  /** Per-frame feature (frame-scoring output — the audio-energy /
    * frame-salience shape). */
  case class FrameFeature(media_id: Long, frame_idx: Int, byte_sum: Long)

  /** Frame scoring: split each blob into frames and emit one feature row
    * per frame (here: unsigned byte sum, the energy stand-in). Downstream
    * selection (argmax frame per media) stays a relational operator, so
    * decode parallelism and selection shuffle are independently sized. */
  def frameFeatures(df: DataFrame, idCol: String, binCol: String,
                    frameSize: Int = DefaultFrameSize): Dataset[FrameFeature] = {
    val pairs = df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])](Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
    pairs.mapPartitions { it =>
      it.flatMap { case (id, bytes) =>
        val b = if (bytes == null) Array.emptyByteArray else bytes
        val nFrames = (b.length + frameSize - 1) / frameSize
        (0 until nFrames).iterator.map { f =>
          val start = f * frameSize
          val end = math.min(start + frameSize, b.length)
          var s = 0L
          var i = start
          while (i < end) { s += b(i) & 0xff; i += 1 }
          FrameFeature(id, f, s)
        }
      }
    }(Encoders.product[FrameFeature])
  }

  /** Frame sampling: split each blob into `frameSize`-byte frames,
    * keeping every `stride`-th frame — the video-frame-sample shape.
    * Emits (media_id, frame_idx, n_bytes); per-frame bytes stay inside
    * the partition iterator (never collected). */
  def sampleFrames(df: DataFrame, idCol: String, binCol: String,
                   frameSize: Int = DefaultFrameSize,
                   stride: Int = 2): Dataset[Frame] = {
    val pairs = df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])](Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
    pairs.mapPartitions { it =>
      it.flatMap { case (id, bytes) =>
        val b = if (bytes == null) Array.emptyByteArray else bytes
        val nFrames = (b.length + frameSize - 1) / frameSize
        (0 until nFrames by stride).iterator.map { f =>
          val start = f * frameSize
          Frame(id, f, math.min(frameSize, b.length - start))
        }
      }
    }(Encoders.product[Frame])
  }

  /** Windowed audio-energy features over a PCM sample frame
    * (media_id, t, sample): per fixed-size window the sample count,
    * peak |amplitude|, and integer mean square (Σs² DIV n — the RMS²
    * an audio-quality / silence-detection gate thresholds on, kept in
    * BIGINT so the oracle replays it exactly; callers sqrt at the
    * edge if they want true RMS). One shuffle on (media, window) with
    * map-side combine; sample magnitude ≤ 2¹⁵ (s16 PCM) keeps Σs²
    * under BIGINT for any window a pipeline would use (< 2³³ samples
    * per window).
    */
  def windowEnergy(samples: DataFrame, idCol: String, tCol: String,
                   sCol: String, window: Int): DataFrame =
    samples
      .groupBy(col(idCol),
               expr(s"CAST($tCol AS BIGINT) DIV $window").as("win"))
      .agg(count(lit(1)).as("n_samples"),
           max(abs(col(sCol).cast("long"))).as("peak"),
           sum(col(sCol).cast("long") * col(sCol)).as("sum_sq"))
      .withColumn("mean_sq", expr("sum_sq DIV n_samples"))
}
