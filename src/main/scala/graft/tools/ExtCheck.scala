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
        lsh_bucket(array(1.0f, 0.0f), 4, 42) AS lb,
        repetition_counts('a a b')[0] AS rc,
        hashed_score('a b c', 's1') AS hs,
        size(segment_hashes('a b c d', 2)) AS sg,
        size(term_counts('a b a')) AS tc,
        ws_token_count(' a  b ') AS wc,
        size(token_window_hashes('a b c d', 2)) AS tw,
        size(bigram_hash_counts('a b a b')) AS bh,
        size(bigram_counts('a b a b')) AS bc,
        int8_cosine(int8_quantize(array(1.0f, 0.0f)),
                    int8_quantize(array(1.0f, 0.0f))) AS i8,
        size(html_table_rows('<table><tr><td>x</td></tr></table>')) AS ht
    """).head()
    println(s"[extcheck] $out")
    val pcts = spark.sql("""
      SELECT exact_percentiles(CAST(x AS DOUBLE), array(0.5))[0] AS p50,
             exact_percentiles_weighted(CAST(x AS DOUBLE), x, array(0.5))[0] AS wp50,
             exact_percentiles2(CAST(x AS DOUBLE), array(0.5),
                                CAST(x*2 AS DOUBLE), array(0.5)).p2[0] AS fp50
      FROM VALUES (1L), (2L), (3L) AS t(x)
    """).head()
    println(s"[extcheck] $pcts")
    val agg = spark.sql("""
      SELECT bounded_ids(x, 10) AS ids, kmv_sample(x, 3) AS kmv,
             kmv_distinct(x, 16) AS kd,
             top_k_pairs(CAST(x AS DOUBLE), x, 2) AS tk,
             vec_centroid(array(CAST(x AS FLOAT)), 1000000L) AS vc,
             mg_topk(CAST(x AS STRING), 4) AS mg
      FROM VALUES (1L), (2L), (3L) AS t(x)
    """).head()
    println(s"[extcheck] $agg")
    // might_contain requires the filter as a constant/scalar subquery;
    // bloom_any is stricter still — a driver-held FOLDABLE filter (its
    // contract: the probe set is broadcast as a literal), so build the
    // filter first and pass it as a lit.
    val hit = spark.sql("""
      SELECT bloom_might_contain(
               (SELECT bloom_agg(xxhash64(x), 3L, 8192L)
                FROM VALUES (1L), (2L), (3L) AS t(x)),
               xxhash64(1L)) AS hit
    """).head()
    val bf = spark.sql("""
      SELECT bloom_agg(xxhash64(x), 3L, 8192L)
      FROM VALUES (1L), (2L), (3L) AS t(x)
    """).head().getAs[Array[Byte]](0)
    val anyhit = spark.range(1).select(
      org.apache.spark.sql.functions.call_function("bloom_any",
        org.apache.spark.sql.functions.lit(bf),
        org.apache.spark.sql.functions.expr(
          "array(xxhash64(9L), xxhash64(2L))")).as("anyhit")).head()
    val nbAny = spark.range(1).select(
      org.apache.spark.sql.functions.call_function("ngram_bloom_any",
        org.apache.spark.sql.functions.lit(bf),
        org.apache.spark.sql.functions.lit("hello world"),
        org.apache.spark.sql.functions.lit(3),
        org.apache.spark.sql.functions.lit(2147483647L)).as("nbany")).head()
    println(s"[extcheck] $hit $anyhit $nbAny")
    spark.stop()
  }
}
