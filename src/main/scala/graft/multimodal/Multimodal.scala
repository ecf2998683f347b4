package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed batch-at-a-time with
  * `Dataset.mapPartitions` — the Scala analog of `mapInPandas` (iterator
  * of batches in, iterator of batches out; nothing driver-side, state
  * amortized per partition).
  *
  * The actual media decode is STUBBED: no image/audio libraries exist in
  * this container, so [[MediaCodec.decode]] is implemented only by the
  * deterministic [[FakeCodec]]. Everything Spark-side — schema, encoder,
  * partition iteration, batch shape, frame sampling — is real and
  * tested; swapping in a JNI/javax.imageio codec changes one `val`.
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
    /** Real media decode — deliberately unimplemented in this container
      * (would be imageio/ffmpeg behind JNI). */
    def decode(bytes: Array[Byte]): Array[Byte] = ???
    /** Cheap deterministic feature extraction over (possibly decoded)
      * bytes. */
    def features(id: Long, bytes: Array[Byte], frameSize: Int): MediaFeatures
  }

  /** Deterministic stand-in codec: features computed directly over the
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
}
