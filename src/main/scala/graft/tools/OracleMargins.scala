package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** Audits the deterministic margins the q37/q38 copy-seed oracles rest
  * on (see graft.catalog.DedupQueries.saltedCopySeeded): over the
  * salted copy-seeded corpus, prints the organic (non-copy) maximum
  * est_jaccard — must stay below the 0.99 oracle threshold — and the
  * organic minimum SimHash hamming distance — must stay above
  * maxDist 3 — plus the oracled output row counts (50 copy pairs
  * each at sf0.01).
  *
  * Run: `sbt "runMain graft.tools.OracleMargins /root/testdata/sf0.01"`.
  */
object OracleMargins {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val shift = 10000000L
    val corpus = graft.catalog.DedupQueries.saltedCopySeededForAudit(spark, dir)
    val sig = Dedup.minhashSignatures(corpus, "doc_id", "text", 32, 5)
      .localCheckpoint()
    val mh = Dedup.minhashJaccard(
      Dedup.lshCandidates(sig, "doc_id", bands = 8), sig, "doc_id")
    println("q37 oracled rows (est>=0.99): " +
      mh.filter(col("est_jaccard") >= 0.99).count())
    println("organic max est_jaccard: " + mh.filter(col("id2") < shift)
      .agg(max("est_jaccard")).head().get(0))
    val sh = Dedup.simhash(corpus, "doc_id", "text").localCheckpoint()
    val sc = Dedup.simhashCandidates(sh, "doc_id", maxDist = 64)
    println("q38 oracled rows (hamming<=3): " +
      sc.filter(col("hamming") <= 3).count())
    println("organic min hamming: " + sc.filter(col("id2") < shift)
      .agg(min("hamming")).head().get(0))
    spark.stop()
  }
}
