package graft.tools

import org.apache.spark.sql.SparkSession

/** Deployment smoke check for `spark.sql.extensions=graft.functions
  * .GraftExtensions`: builds a FRESH session with only the extension
  * configured (no driver-side register calls) and exercises every
  * injected function through pure SQL — what a cluster user's session
  * actually sees. Run: `sbt "runMain graft.tools.ExtCheck"`.
  */
object ExtCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val out = spark.sql("""
      SELECT
        cosine_sim(array(1.0f, 0.0f), array(1.0f, 0.0f)) AS cs,
        stopword_counts('the cat')[6] AS tok,
        sig_overlap(array(1L, 2L), array(1L, 3L)) AS so,
        size(ngram_hashes('hello', 3, 2147483647)) AS nh,
        size(minhash_sig('hello world', 8, 5, 2147483647)) AS ms,
        simhash64('hello world') AS sh,
        shingle_fingerprint('hello world', 8) AS fp,
        lsh_bucket(array(1.0f, 0.0f), 4, 42) AS lb
    """).head()
    println(s"[extcheck] $out")
    val agg = spark.sql("""
      SELECT bounded_ids(x, 10) AS ids, kmv_sample(x, 3) AS kmv,
             kmv_distinct(x, 16) AS kd
      FROM VALUES (1L), (2L), (3L) AS t(x)
    """).head()
    println(s"[extcheck] $agg")
    spark.stop()
  }
}
