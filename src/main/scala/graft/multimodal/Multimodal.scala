package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus the decode / feature-extract /
  * frame-sample operator shapes a training-data pipeline needs.
  *
  * The codecs themselves are STUBS (this container has no image/audio
  * libraries): decode produces deterministic fake features derived from
  * the bytes. Everything Spark-side — schemas, batching, partitioning,
  * the explode shapes — is real and tested, so a real codec drops into
  * [[decodeBatched]] without touching any plan.
  */
object Multimodal {

  /** Typed per-row media feature (the stub "decoded" output). */
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

  /** STUB decode, batched: the real implementation would decode
    * `batch.map(_.content)` with an image/audio codec per partition
    * (arrow-style batches; the Scala analog of a Pandas-UDF
    * `mapInPandas`). The batch shape — `mapPartitions` + `grouped` — is
    * the real plumbing; only the per-batch body is fake.
    */
  def decodeBatched(media: DataFrame, idCol: String,
                    batchSize: Int = 64): Dataset[MediaFeature] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col(idCol), col("content")).as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(batchSize).flatMap { batch =>
        // ??? real codec call site: decode(batch.map(_._2))
        batch.map { case (id, bytes) =>
          MediaFeature(id, bytes.length,
            bytes.foldLeft(17L)((a, b) => a * 31 + b)) // deterministic fake
        }
      })
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
