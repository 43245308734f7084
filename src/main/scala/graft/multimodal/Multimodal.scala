package graft.multimodal

import java.io.ByteArrayOutputStream
import java.util.zip.{CRC32, Deflater, Inflater}

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus the decode / feature-extract /
  * frame-sample operator shapes a training-data pipeline needs.
  *
  * The codec is REAL: [[encodeBatched]]/[[decodeBatched]] run zlib
  * DEFLATE/INFLATE (`java.util.zip` — the stdlib codec every production
  * media container wraps) inside the batched `mapPartitions` surface,
  * one codec handle per batch (the arrow-batch analog of a Pandas-UDF
  * `mapInPandas`: handle setup amortizes over the batch, rows stream
  * through it). A heavier image/audio codec drops into the same batch
  * body without touching any plan — the Spark-side shape (schema,
  * partitioning, batch size, per-batch native-resource lifecycle) is
  * exactly what it would need.
  */
object Multimodal {

  /** One encoded media row (opaque compressed bytes). */
  final case class Encoded(doc_id: Long, content: Array[Byte])

  /** One decoded media row (the raw bytes a downstream stage consumes). */
  final case class Decoded(doc_id: Long, content: Array[Byte])

  /** Typed per-row media feature over decoded content. */
  final case class MediaFeature(doc_id: Long, n_bytes: Int, checksum: Long)

  /** Attach a binary content column + typed metadata struct to a text
    * table (stand-in for real media ingestion; deterministic).
    */
  def withFakeMedia(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .withColumn("content", col(textCol).cast("binary"))
      .withColumn("media_meta", struct(
        lit("fake/raw").as("format"),
        (pmod(xxhash64(col(idCol)), lit(1264L)) + 16).cast("int").as("width"),
        (pmod(xxhash64(col(idCol), lit(1)), lit(704L)) + 16).cast("int").as("height"),
        (col("n_chars") * 40).cast("long").as("duration_ms")))

  /** Real batched ENCODE: zlib-deflate each row's `content` bytes.
    * One `Deflater` per batch, `reset()` between rows, `end()` when the
    * batch closes — the native-resource lifecycle a real codec (libjpeg,
    * ffmpeg handle, ...) needs, which is the whole point of batching the
    * surface instead of a per-row UDF.
    */
  def encodeBatched(media: DataFrame, idCol: String,
                    batchSize: Int = 64): Dataset[Encoded] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col(idCol), col("content")).as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(batchSize).flatMap { batch =>
        val codec = new Deflater(Deflater.BEST_SPEED)
        try batch.map { case (id, bytes) =>
          codec.reset()
          codec.setInput(bytes)
          codec.finish()
          val out = new ByteArrayOutputStream(bytes.length / 2 + 32)
          val buf = new Array[Byte](8192)
          while (!codec.finished()) out.write(buf, 0, codec.deflate(buf))
          Encoded(id, out.toByteArray)
        } finally codec.end()
      })
  }

  /** Real batched DECODE: zlib-inflate each row's `content` back to the
    * original bytes. Same per-batch codec lifecycle as [[encodeBatched]].
    * A corrupt stream fails the task loudly (`DataFormatException` via
    * the zero-progress guard) rather than emitting truncated media.
    */
  def decodeBatched(media: DataFrame, idCol: String,
                    batchSize: Int = 64): Dataset[Decoded] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col(idCol), col("content")).as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(batchSize).flatMap { batch =>
        val codec = new Inflater()
        try batch.map { case (id, bytes) =>
          codec.reset()
          codec.setInput(bytes)
          val out = new ByteArrayOutputStream(bytes.length * 2 + 32)
          val buf = new Array[Byte](8192)
          while (!codec.finished()) {
            val n = codec.inflate(buf)
            if (n > 0) out.write(buf, 0, n)
            else if (!codec.finished())
              throw new java.util.zip.DataFormatException(
                s"truncated DEFLATE stream for id $id")
          }
          Decoded(id, out.toByteArray)
        } finally codec.end()
      })
  }

  /** Typed features over decoded media: byte length + CRC32 (the stdlib
    * media checksum; PNG/zip use the same polynomial).
    */
  def mediaFeatures(decoded: Dataset[Decoded]): Dataset[MediaFeature] = {
    val spark = decoded.sparkSession
    import spark.implicits._
    decoded.map { d =>
      val crc = new CRC32()
      crc.update(d.content)
      MediaFeature(d.doc_id, d.content.length, crc.getValue)
    }
  }

  /** Feature extraction as pure expressions (fake but deterministic):
    * 8 doubles in [0,1] from the content's SHA-256. Shape-compatible with
    * a real embedding column.
    */
  def fakeFeatures(df: DataFrame, contentCol: String = "content"): DataFrame =
    df.withColumn("features",
      transform(sequence(lit(0), lit(7)), i =>
        conv(substring(sha2(col(contentCol), 256), i * 4 + 1, lit(4)), 16, 10)
          .cast("double") / 65535.0))

  /** Frame sampling: one row per sampled frame timestamp — the video
    * fan-out shape (`explode(sequence)`), driven by the metadata duration.
    */
  def sampleFrames(media: DataFrame, idCol: String,
                   everyMs: Int = 1000): DataFrame =
    media.select(col(idCol),
      explode(sequence(lit(0L), col("media_meta.duration_ms"),
        lit(everyMs.toLong))).as("frame_ts"))
}
