package graft.catalog

import org.apache.spark.sql.functions._

import graft.Tables
import graft.multimodal.Multimodal

/** Multimodal-plumbing coverage: binary columns, metadata, frame
  * sampling. The byte-level pieces (octet length, checksums over the
  * binary) are oracle-checked; hash-derived metadata is pinned by
  * MultimodalSpec.
  */
object MultimodalQueries {

  val all: Map[String, Q] = Map(

    // ----- binary column plumbing: utf8 bytes + checksum -----
    "q41_multimodal_bytes" -> Q(
      (s, dir) => Tables(s, dir, "documents")
        .select(col("doc_id"),
          // long, matching DuckDB OCTET_LENGTH's BIGINT (WARN-free)
          octet_length(col("text").cast("binary")).cast("long").as("n_bytes"),
          md5(col("text")).as("checksum"))
        .orderBy("doc_id"),
      Some(
        """SELECT doc_id,
          |  OCTET_LENGTH(CAST(text AS BLOB)) AS n_bytes,
          |  MD5(text) AS checksum
          |FROM documents ORDER BY doc_id""".stripMargin),
      "binary column length + checksum"),

    // ----- REAL batched codec: deflate -> inflate round trip -----
    // The batched mapPartitions decode surface with a real stdlib codec
    // (zlib DEFLATE/INFLATE) doing the work: the oracle checks the
    // DECODED bytes' length and md5 against the source text, so a codec
    // that truncates, pads, or reorders anything hash-mismatches. Both
    // directions run per batch with one reused codec handle — the
    // lifecycle a heavier media codec needs.
    "q71_media_decode" -> Q(
      (s, dir) => {
        val media = Multimodal.withFakeMedia(
          Tables(s, dir, "documents"), "doc_id", "text")
        Multimodal.decodeBatched(
            Multimodal.encodeBatched(media, "doc_id").toDF(), "doc_id")
          .toDF()
          .select(col("doc_id"),
            octet_length(col("content")).cast("long").as("n_bytes"),
            md5(col("content")).as("checksum"))
          .orderBy("doc_id")
      },
      Some(
        """SELECT doc_id,
          |  OCTET_LENGTH(CAST(text AS BLOB)) AS n_bytes,
          |  MD5(text) AS checksum
          |FROM documents ORDER BY doc_id""".stripMargin),
      "batched zlib encode->decode round trip, decoded bytes oracled"),

    // ----- frame-sampling fan-out from metadata duration -----
    "q42_frame_sample" -> Q(
      (s, dir) => Multimodal.sampleFrames(
          Multimodal.withFakeMedia(
            Tables(s, dir, "documents").filter(col("doc_id") < 50),
            "doc_id", "text"),
          "doc_id", everyMs = 1000)
        .orderBy("doc_id", "frame_ts"),
      Some(
        """SELECT doc_id,
          |  UNNEST(GENERATE_SERIES(0, n_chars * 40, 1000)) AS frame_ts
          |FROM documents WHERE doc_id < 50
          |ORDER BY doc_id, frame_ts""".stripMargin),
      "video-frame sampling explode shape")
  )
}
