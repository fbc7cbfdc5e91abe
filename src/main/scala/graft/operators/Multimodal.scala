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

  /** Frame sampling: one row per pseudo-frame (explode over n_frames). */
  def sampleFrames(meta: Dataset[MediaMeta]): DataFrame =
    meta.toDF().select(col("media_id"), col("n_frames"),
        explode(sequence(lit(0L), col("n_frames") - 1)).as("frame_idx"))
      .select(col("media_id"), col("frame_idx"),
        // deterministic pseudo frame offset (ms) — stands in for real PTS
        (col("frame_idx") * 40 + col("media_id") % 40).as("frame_offset_ms"))
}
