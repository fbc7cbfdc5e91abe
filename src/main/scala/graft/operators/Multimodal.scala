package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._

/** Multimodal-column support for training-data pipelines: media payloads
  * travel as opaque BINARY columns with typed metadata; decode/feature
  * extraction runs batched per partition (the Scala analog of `mapInPandas`
  * batch processing — one codec init per batch, vectorized-friendly shape).
  *
  * The metadata decode is a REAL pure-JVM container parser: BMP
  * (BITMAPFILEHEADER + BITMAPINFOHEADER) and RIFF/WAVE (PCM fmt + data
  * chunks, even-byte chunk padding per the RIFF spec) headers are parsed
  * from the payload bytes — no native codec needed for width/height/
  * sample-rate/frame-count metadata. Deep decode (pixel arrays, sample
  * PCM) is out of scope in this container; the partition-batched seam is
  * where such a codec would run.
  */
object Multimodal {

  /** Unified media metadata row. Image payloads (bmp) fill width/height and
    * n_frames = 1; audio payloads (wav) fill sample_rate/channels and
    * n_frames = PCM sample frames (data bytes / block align); unparseable
    * payloads get format "unknown" and zeros — kept, not dropped, so a
    * corrupt-payload rate is observable downstream. */
  case class MediaMeta(media_id: Long, n_bytes: Long, format: String,
                       width: Long, height: Long, n_frames: Long,
                       sample_rate: Long, channels: Long)

  /** Wrap a text column as an opaque binary payload (stand-in for raw media
    * bytes; at 100 TB these would come from `binaryFile` / parquet BINARY). */
  def asBinary(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("media_id"),
      col(textCol).cast("binary").as("payload"))

  // --- little-endian readers (bounds-checked by callers) ------------------
  private def le16(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8)
  private def le32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
  private def tag(b: Array[Byte], o: Int): String =
    new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Parse one payload's container header. BMP: 'BM' magic + a >= 40-byte
    * BITMAPINFOHEADER → biWidth/|biHeight| (height is negative for top-down
    * DIBs — magnitude is the pixel height either way). WAV: 'RIFF'...'WAVE'
    * then a chunk walk (chunks pad to even length) for 'fmt ' (channels,
    * sample rate, block align) and 'data' (payload size); frame count =
    * data size / block align. Anything else → "unknown" with zeros. */
  def decodeOne(mediaId: Long, payload: Array[Byte]): MediaMeta = {
    val n = payload.length.toLong
    def unknown = MediaMeta(mediaId, n, "unknown", 0L, 0L, 0L, 0L, 0L)
    if (payload.length >= 54 && payload(0) == 'B' && payload(1) == 'M' &&
        le32(payload, 14) >= 40L) {
      val w = le32(payload, 18)
      val hRaw = le32(payload, 22).toInt // i32: negative = top-down DIB
      MediaMeta(mediaId, n, "bmp", w, math.abs(hRaw.toLong), 1L, 0L, 0L)
    } else if (payload.length >= 12 && tag(payload, 0) == "RIFF" &&
        tag(payload, 8) == "WAVE") {
      var off = 12
      var sampleRate = 0L; var channels = 0L; var blockAlign = 0L
      var dataSize = -1L
      while (off + 8 <= payload.length) {
        val id = tag(payload, off)
        val size = le32(payload, off + 4) // unsigned u32: 0 .. 2^32-1
        val body = off + 8
        if (size > (payload.length - body).toLong) {
          // Corrupt/truncated chunk: the declared size overruns the payload
          // (hostile crawl bytes can declare e.g. 0xFFFFFFF8, which as i32
          // would walk the offset backwards and loop forever). Terminate the
          // walk; the validity check below decides wav-vs-unknown.
          off = payload.length
        } else {
          if (id == "fmt " && size >= 16 && body + 16 <= payload.length) {
            channels = le16(payload, body + 2)
            sampleRate = le32(payload, body + 4)
            blockAlign = le16(payload, body + 12)
          } else if (id == "data") {
            dataSize = size
          }
          // size <= remaining, so this fits in Int and always advances >= 8
          off = body + size.toInt + (size.toInt & 1) // RIFF pads odd chunks
        }
      }
      if (sampleRate == 0L || dataSize < 0L) unknown
      else MediaMeta(mediaId, n, "wav", 0L, 0L,
        if (blockAlign > 0) dataSize / blockAlign else 0L,
        sampleRate, channels)
    } else unknown
  }

  /** Partition-batched decode: payloads are processed in `batchSize` groups so
    * a real deep codec amortizes model/handle initialization per batch (the
    * same contract `mapInPandas` gives Python codecs). Header parsing itself
    * is allocation-light; the batching is the seam, not the cost. */
  def decodeMeta(bin: DataFrame, batchSize: Int = 64): Dataset[MediaMeta] = {
    implicit val enc: Encoder[MediaMeta] = ExpressionEncoder[MediaMeta]()
    bin.select(col("media_id"), col("payload")).as[(Long, Array[Byte])](
      ExpressionEncoder[(Long, Array[Byte])]())
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // deep-codec init would happen here, once per batch
          batch.map { case (id, bytes) => decodeOne(id, bytes) }
        }
      }
  }

  // --- fixture encoders (real container layouts) --------------------------
  // Test/fixture generators: at 100 TB payloads come off storage via
  // binaryFile/parquet; these build REAL spec-layout files so the parser is
  // exercised against the actual byte format (and cross-checked against the
  // JDK's own ImageIO/AudioSystem readers in MultimodalCodecSpec).

  /** A complete, valid 24-bit bottom-up BMP (54-byte header + zeroed pixel
    * array with 4-byte row padding). */
  def buildBmp(width: Int, height: Int): Array[Byte] = {
    require(width > 0 && height > 0, "BMP dims must be positive")
    val rowStride = ((3 * width + 3) / 4) * 4
    val imageSize = rowStride * height
    val fileSize = 54 + imageSize
    val b = java.nio.ByteBuffer.allocate(fileSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(fileSize)
      .putShort(0).putShort(0).putInt(54)           // reserved, data offset
    b.putInt(40).putInt(width).putInt(height)       // BITMAPINFOHEADER
      .putShort(1).putShort(24).putInt(0)           // planes, bpp, BI_RGB
      .putInt(imageSize).putInt(2835).putInt(2835)  // size, 72 DPI in ppm
      .putInt(0).putInt(0)                          // palette counts
    b.array()                                       // pixel area stays zeroed
  }

  /** A complete, valid PCM RIFF/WAVE file (44-byte canonical header +
    * deterministic sample bytes + the RIFF odd-size pad byte when needed). */
  def buildWav(sampleRate: Int, channels: Int, bitsPerSample: Int,
               nSamples: Int): Array[Byte] = {
    require(sampleRate > 0 && channels > 0 && nSamples >= 0, "bad WAV params")
    require(bitsPerSample % 8 == 0, "whole-byte sample sizes only")
    val blockAlign = channels * bitsPerSample / 8
    val dataSize = nSamples * blockAlign
    val pad = dataSize & 1
    val b = java.nio.ByteBuffer.allocate(44 + dataSize + pad)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
    b.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1)                                  // PCM
      .putShort(channels.toShort).putInt(sampleRate)
      .putInt(sampleRate * blockAlign)              // byte rate
      .putShort(blockAlign.toShort).putShort(bitsPerSample.toShort)
    b.put("data".getBytes("US-ASCII")).putInt(dataSize)
    var i = 0
    while (i < dataSize) { b.put((i & 0xff).toByte); i += 1 }
    b.array()                                       // pad byte stays zero
  }

  /** Deterministic media fixture over an id column: even ids become real
    * BMPs, odd ids real WAVs, with dims/rates that are pure integer
    * functions of the id — so a SQL oracle can compute the expected
    * decoded metadata arithmetically while Spark round-trips it through
    * the actual container bytes. Runs in the same partition-batched shape
    * as the decode. */
  def syntheticMedia(df: DataFrame, idCol: String,
                     batchSize: Int = 64): DataFrame = {
    implicit val enc = ExpressionEncoder[(Long, Array[Byte])]()
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap(_.map { id =>
          val payload =
            if (id % 2 == 0)
              buildBmp((id % 64).toInt + 1, (id % 48).toInt + 1)
            else
              buildWav(8000 + (id % 8).toInt * 1000,
                if (id % 4 == 1) 1 else 2,
                if (id % 8 < 4) 8 else 16,
                (id % 50).toInt + 5)
          (id, payload)
        })
      }.toDF("media_id", "payload")
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

  /** Resize metadata transform: a deep codec would rescale pixels; the
    * metadata side (target dims, scale factor) is what downstream pipelines
    * schedule on. Audio/unknown rows carry width 0 → scale 1.0. */
  def resizeMeta(meta: Dataset[MediaMeta], targetW: Long, targetH: Long): DataFrame =
    meta.toDF().select(col("media_id"), col("width"), col("height"),
      lit(targetW).as("target_width"), lit(targetH).as("target_height"),
      when(col("width") > 0,
        lit(targetW).cast("double") / col("width")).otherwise(lit(1.0))
        .as("scale_x"))

  /** Frame sampling: one row per frame (explode over n_frames; bmp = 1
    * frame, wav = PCM sample frames, unknown = none). */
  def sampleFrames(meta: Dataset[MediaMeta]): DataFrame =
    meta.toDF().select(col("media_id"), col("n_frames"),
        explode(when(col("n_frames") > 0,
            sequence(lit(0L), col("n_frames") - 1))
          .otherwise(array().cast("array<bigint>"))).as("frame_idx"))
      .select(col("media_id"), col("frame_idx"),
        // deterministic pseudo frame offset (ms) — stands in for real PTS
        (col("frame_idx") * 40 + col("media_id") % 40).as("frame_offset_ms"))
}
