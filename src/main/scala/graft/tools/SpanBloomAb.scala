package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Evidence generator (r16): attribute the span-gate Bloom negative
  * (official bench: bloomed 0.93s vs plain 0.26s). Two competing
  * hypotheses from the scaladoc:
  *
  *  (a) FILTER LITERAL SIZE — the probe evaluates a multi-MB binary
  *      literal per token-scale gram;
  *  (b) GATE SHAPE — the filtered path's union + dropDuplicates vs the
  *      plain gate's one-row-per-key outer-join marks.
  *
  * Discriminator: run the SAME bloomed gate against the SAME store with
  * two filters — one sized for the store (~accurate, multi-MB) and one
  * deliberately tiny (16k items, ~16KB, near-100% fpp so every gram
  * still pays the store join: same join work, same union shape, only
  * the literal shrinks). If tiny-filter ~= plain+shape-overhead while
  * big-filter is the outlier, the literal is the cost; if both bloomed
  * legs are equally slow, the shape is.
  *
  *   sbt "runMain graft.tools.SpanBloomAb /root/testdata/sf0.1 5"
  */
object SpanBloomAb {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(5)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = graft.Tables(spark, dir, "documents")
    val table = s"graft_spanbloomab_${System.nanoTime()}"
    graft.dedup.SpanDedup.seedSpanStore(
      docs.filter(pmod(col("doc_id"), lit(2)) === 0).select("doc_id", "text"),
      8, table,
      new java.io.File(sys.props("java.io.tmpdir"), table).getPath)
    val batch = docs.filter(col("doc_id") < 1000)
    val storeWindows = spark.table(table).count()

    // accurate filter (store-sized) vs deliberately tiny one (same joins
    // and shape — near-100% fpp — only the literal shrinks)
    val big = graft.dedup.SpanDedup.spanStoreBloom(spark, table,
      math.max(storeWindows, 64L)).get
    val tiny = graft.dedup.SpanDedup.spanStoreBloom(spark, table, 16384L).get
    // the bench's sizing on THIS store: an oversized (2M-item, 2MB)
    // literal with ~zero fpp — if this leg alone is slow, the literal
    // is the cost, not the fpp-driven join work or the union shape
    val over = graft.dedup.SpanDedup.spanStoreBloom(spark, table,
      2000000L).get

    def t(f: () => org.apache.spark.sql.DataFrame): Double =
      Timing.medianDf(reps)(f)
    val ((plain, bloomBig, bloomTiny, bloomOver), foreign) =
      Timing.withForeignCores {
        (t(() => graft.dedup.SpanDedup.statsIncremental(batch, 8, table)),
          t(() => graft.dedup.SpanDedup.statsIncrementalBloom(
            batch, 8, table, big)),
          t(() => graft.dedup.SpanDedup.statsIncrementalBloom(
            batch, 8, table, tiny)),
          t(() => graft.dedup.SpanDedup.statsIncrementalBloom(
            batch, 8, table, over)))
      }
    println(f"""{"store_windows":$storeWindows,"big_filter_bytes":${big.length},"tiny_filter_bytes":${tiny.length},"over_filter_bytes":${over.length},"plain_sec":$plain%.3f,"bloom_big_sec":$bloomBig%.3f,"bloom_tiny_sec":$bloomTiny%.3f,"bloom_oversized_sec":$bloomOver%.3f,"foreign_cores":$foreign%.2f,"dir":"$dir"}""")
    spark.sql(s"DROP TABLE $table")
    spark.stop()
  }
}
