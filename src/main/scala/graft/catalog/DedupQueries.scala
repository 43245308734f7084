package graft.catalog

import org.apache.spark.sql.functions._

import graft.Tables
import graft.dedup.Dedup

/** Deduplication coverage over `documents`. Exact dedup and n-gram Jaccard
  * carry DuckDB oracles; MinHash/SimHash are built on Spark's xxhash64
  * (not reproducible in DuckDB SQL) so they're registered without oracle —
  * the driver records a rows-only check and their semantics are pinned by
  * DedupSpec instead.
  */
object DedupQueries {

  val all: Map[String, Q] = Map(

    // ----- exact dedup: canonical min-id per identical text -----
    "q35_dedup_exact" -> Q(
      (s, dir) => Dedup.exact(Tables(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id"),
      Some(
        """SELECT MIN(doc_id) AS doc_id, MD5(text) AS text_hash
          |FROM documents GROUP BY text ORDER BY doc_id""".stripMargin),
      "exact hash-groupBy dedup"),

    // ----- n-gram Jaccard near-dup, bounded candidate set -----
    "q36_ngram_jaccard" -> Q(
      (s, dir) => Dedup.ngramJaccard(
          Tables(s, dir, "documents").filter(col("doc_id") < 100),
          "doc_id", "text", n = 5, minJaccard = 0.2)
        .orderBy("id1", "id2"),
      Some(
        """WITH sh AS (
          |  SELECT DISTINCT doc_id, SUBSTRING(text, CAST(i AS INTEGER), 5) AS g
          |  FROM (SELECT doc_id, text,
          |          UNNEST(GENERATE_SERIES(1, GREATEST(LENGTH(text) - 4, 1))) AS i
          |        FROM documents WHERE doc_id < 100)),
          |sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY 1),
          |inter AS (
          |  SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS it
          |  FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
          |  GROUP BY 1, 2)
          |SELECT id1, id2,
          |       ROUND(it / (s1.sz + s2.sz - it), 6) AS jaccard
          |FROM inter
          |JOIN sizes s1 ON id1 = s1.doc_id
          |JOIN sizes s2 ON id2 = s2.doc_id
          |WHERE it / (s1.sz + s2.sz - it) >= 0.2
          |ORDER BY id1, id2""".stripMargin),
      "exact n-gram Jaccard via inverted shingle index"),

    // ----- MinHash + LSH banding (scale path; no SQL oracle) -----
    "q37_minhash_lsh" -> Q(
      (s, dir) => {
        val sig = Dedup.minhashSignatures(
          Tables(s, dir, "documents"), "doc_id", "text",
          numHashes = 32, shingleN = 5)
        Dedup.minhashJaccard(Dedup.lshCandidates(sig, "doc_id", bands = 8),
            sig, "doc_id")
          .filter(col("est_jaccard") >= 0.5)
          .orderBy("id1", "id2")
      },
      None,
      "MinHash signatures -> LSH band join -> estimated-Jaccard filter"),

    // ----- full corpus-curation composition (no SQL oracle) -----
    "q45_curate_corpus" -> Q(
      (s, dir) => graft.pipelines.CorpusPipeline.curate(
          Tables(s, dir, "documents"),
          graft.pipelines.CorpusPipeline.Config(
            langs = Seq("en", "es", "fr", "de", "zh"), minQuality = 0.0))
        .select("doc_id", "tokens").orderBy("doc_id"),
      None,
      "filter -> exact dedup -> MinHash/LSH near-dup -> connected components -> token accounting"),

    // ----- SimHash near-dup candidates (no SQL oracle) -----
    "q38_simhash" -> Q(
      (s, dir) => Dedup.simhashCandidates(
          Dedup.simhash(Tables(s, dir, "documents"), "doc_id", "text"),
          "doc_id", maxDist = 3)
        .orderBy("id1", "id2"),
      None,
      "64-bit SimHash, banded candidates, hamming<=3")
  )
}
