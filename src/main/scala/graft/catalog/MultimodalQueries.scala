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
