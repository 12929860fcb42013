package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing for training-data
  * pipelines: media as opaque `binary` columns + typed metadata, with
  * decode/feature-extraction as partition-mapped batch functions.
  *
  * The actual codec step is STUBBED (this container has no image/audio
  * libraries): [[MediaDecoder.RealCodec]] throws, and tests/queries use
  * [[MediaDecoder.DeterministicFake]] — a seeded byte-hash "decode" with
  * the same signature and batch shape a libjpeg/ffmpeg-backed decoder
  * would have. Everything Spark-side is real: schema, encoders,
  * partitioning, per-partition batching (the Scala analog of PySpark's
  * `mapInPandas` — one iterator per partition, amortized setup).
  *
  * Scale notes: blobs stay columnar in parquet, never shuffled unless the
  * plan requires it; decode is a narrow per-partition map (no exchange);
  * feature vectors (small arrays) are what downstream shuffles touch.
  */
object Multimodal {

  /** Typed media row: opaque payload + metadata (the reference keeps
    * payloads opaque on the Kafka wire the same way —
    * 03_Data_Ingestion.py:139-160 bronze bytes).
    */
  final case class MediaRow(media_id: Long, format: String, width: Int,
      height: Int, blob: Array[Byte])

  /** Decoded features: fixed-shape embedding + basic stats. */
  final case class MediaFeatures(media_id: Long, format: String,
      n_bytes: Long, feature: Array[Float])

  trait MediaDecoder extends Serializable {
    /** blob → fixed-size feature vector (e.g. pooled pixels / fbank). */
    def decode(blob: Array[Byte], dim: Int): Array[Float]
  }

  object MediaDecoder {
    /** Deterministic stand-in: rolling byte hash folded into `dim` floats
      * in [-1, 1). Same signature/batch shape as a real codec.
      */
    object DeterministicFake extends MediaDecoder {
      def decode(blob: Array[Byte], dim: Int): Array[Float] = {
        val acc = new Array[Long](dim)
        var h = 1125899906842597L
        var i = 0
        while (i < blob.length) {
          h = h * 31 + (blob(i) & 0xff)
          acc(i % dim) += (h >>> 32)
          i += 1
        }
        acc.map(v => ((v % 1000003L).toFloat / 1000003.0f))
      }
    }

    /** Where libjpeg/ffmpeg/soundfile would plug in — unavailable here. */
    object RealCodec extends MediaDecoder {
      def decode(blob: Array[Byte], dim: Int): Array[Float] =
        throw new UnsupportedOperationException(
          "media codecs are not available in this environment; " +
            "use DeterministicFake or plug a real decoder in deployment")
    }
  }

  /** Partition-mapped decode: the `mapInPandas` analog. One decoder
    * instance per partition, streaming iterator (no per-row setup, no
    * materialization of the whole partition).
    */
  def decodeFeatures(media: Dataset[MediaRow], decoder: MediaDecoder,
      dim: Int): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { m =>
        MediaFeatures(m.media_id, m.format, m.blob.length.toLong,
          decoder.decode(m.blob, dim))
      }
    }
  }

  /** 60-bit perceptual signature over a binary payload, CODEC-FREE:
    * SimHash of overlapping byte windows (window `window`, stride
    * `stride`). A localized byte edit touches only the ⌈window/stride⌉
    * windows covering it, so near-identical blobs land within a few
    * Hamming bits while unrelated blobs scatter — the
    * perceptual-hash property, derived from bytes alone (no decoder).
    * Pair with [[graft.operators.TextDedup.hammingNearDups]] for the
    * banded near-dup join. Row-local (one HOF pass per blob), NULL for
    * blobs shorter than one window (callers filter or accept the
    * null-drop). At 100 TB: signature extraction rides the scan;
    * only 8-byte signatures ever shuffle.
    */
  def byteSimhash(blob: org.apache.spark.sql.Column, window: Int,
      stride: Int): org.apache.spark.sql.Column = {
    require(window > 0 && stride > 0, "window and stride must be positive")
    when(octet_length(blob) >= window,
      graft.functions.NativeExpressions.simhash60(
        transform(
          sequence(lit(0),
            ((octet_length(blob) - lit(window)) / lit(stride)).cast("int")),
          i => blob.substr(i * lit(stride) + lit(1), lit(window))
            .cast("string"))))
  }

  /** Deterministic "frame sampling" stub: pick every strideth byte window
    * as a frame key — the real thing would seek keyframes; the plumbing
    * (explode to one row per frame, frame index column) is identical.
    */
  def sampleFrames(media: DataFrame, stride: Int): DataFrame =
    media
      .withColumn("frame_idx",
        explode(sequence(lit(0),
          greatest((octet_length(col("blob")) / stride).cast("int") - 1, lit(0)))))
      .withColumn("frame_off", col("frame_idx") * stride)
}
