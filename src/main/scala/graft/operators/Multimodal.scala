package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._

/** Multimodal-column support for training-data pipelines: media payloads
  * travel as opaque BINARY columns with typed metadata; decode/feature
  * extraction runs batched per partition (the Scala analog of `mapInPandas`
  * batch processing — one codec init per batch, vectorized-friendly shape).
  *
  * The decode step itself is a DETERMINISTIC STUB (this container ships no
  * image/audio codecs): metadata is derived arithmetically from the payload
  * bytes. The Spark-side plumbing — schema, binary handling, partition-batched
  * UDF shape, frame-sampling explode — is real and oracle-tested.
  */
object Multimodal {

  case class MediaMeta(media_id: Long, n_bytes: Long, format: String,
                       width: Long, height: Long, n_frames: Long)

  /** Wrap a text column as an opaque binary payload (stand-in for raw media
    * bytes; at 100 TB these would come from `binaryFile` / parquet BINARY). */
  def asBinary(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("media_id"),
      col(textCol).cast("binary").as("payload"))

  /** STUB decode for one payload — deterministic arithmetic on the bytes.
    * A real deployment replaces the body with an actual codec call; the
    * signature (bytes in, typed meta out) and batching stay identical. */
  def decodeOne(mediaId: Long, payload: Array[Byte]): MediaMeta = {
    val n = payload.length.toLong
    val first = if (n > 0) payload(0) & 0xffL else 0L
    val fmt = (first % 3) match {
      case 0 => "image"; case 1 => "audio"; case _ => "video"
    }
    MediaMeta(mediaId, n, fmt, n % 1024, (n * 7) % 768, n % 5 + 1)
  }

  /** Partition-batched decode: payloads are processed in `batchSize` groups so
    * a real codec amortizes model/handle initialization per batch (the same
    * contract `mapInPandas` gives Python codecs). */
  def decodeMeta(bin: DataFrame, batchSize: Int = 64): Dataset[MediaMeta] = {
    implicit val enc: Encoder[MediaMeta] = ExpressionEncoder[MediaMeta]()
    bin.select(col("media_id"), col("payload")).as[(Long, Array[Byte])](
      ExpressionEncoder[(Long, Array[Byte])]())
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // codec init would happen here, once per batch
          batch.map { case (id, bytes) => decodeOne(id, bytes) }
        }
      }
  }

  /** Feature extraction over the raw payload bytes: a 16-bin byte histogram,
    * L1-normalized — a real (non-stub) per-item feature vector computed in
    * the same partition-batched shape a neural encoder would use. The output
    * column plugs directly into the Similarity/Dedup embedding operators. */
  def byteHistogramFeatures(bin: DataFrame, batchSize: Int = 64): DataFrame = {
    implicit val enc = ExpressionEncoder[(Long, Array[Float])]()
    bin.select(col("media_id"), col("payload")).as[(Long, Array[Byte])](
      ExpressionEncoder[(Long, Array[Byte])]())
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.map { case (id, bytes) =>
            val h = new Array[Float](16)
            var i = 0
            while (i < bytes.length) { h((bytes(i) & 0xff) >> 4) += 1f; i += 1 }
            val n = math.max(1, bytes.length).toFloat
            var b = 0
            while (b < 16) { h(b) /= n; b += 1 }
            (id, h)
          }
        }
      }.toDF("media_id", "features")
  }

  /** Raw integer 16-bin byte histogram (un-normalized
    * [[byteHistogramFeatures]]) — oracle-checkable exactly, same
    * partition-batched shape. One column per bin. */
  def byteHistogramCounts(bin: DataFrame, batchSize: Int = 64): DataFrame = {
    implicit val enc = ExpressionEncoder[(Long, Array[Long])]()
    bin.select(col("media_id"), col("payload")).as[(Long, Array[Byte])](
      ExpressionEncoder[(Long, Array[Byte])]())
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.map { case (id, bytes) =>
            val h = new Array[Long](16)
            var i = 0
            while (i < bytes.length) { h((bytes(i) & 0xff) >> 4) += 1L; i += 1 }
            (id, h)
          }
        }
      }.toDF("media_id", "bins")
      .select(col("media_id") +: (0 until 16).map(b =>
        element_at(col("bins"), b + 1).as(s"bin$b")): _*)
  }

  /** Resize stub: a real codec would rescale pixels; the metadata transform
    * (target dims, scale factor) is the part pipelines depend on. */
  def resizeMeta(meta: Dataset[MediaMeta], targetW: Long, targetH: Long): DataFrame =
    meta.toDF().select(col("media_id"), col("width"), col("height"),
      lit(targetW).as("target_width"), lit(targetH).as("target_height"),
      when(col("width") > 0,
        lit(targetW).cast("double") / col("width")).otherwise(lit(1.0))
        .as("scale_x"))

  /** Frame sampling: one row per pseudo-frame (explode over n_frames). */
  def sampleFrames(meta: Dataset[MediaMeta]): DataFrame =
    meta.toDF().select(col("media_id"), col("n_frames"),
        explode(sequence(lit(0L), col("n_frames") - 1)).as("frame_idx"))
      .select(col("media_id"), col("frame_idx"),
        // deterministic pseudo frame offset (ms) — stands in for real PTS
        (col("frame_idx") * 40 + col("media_id") % 40).as("frame_offset_ms"))
}
