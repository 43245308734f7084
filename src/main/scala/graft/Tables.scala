package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the harness parquet tables (TESTDATA.md / FIXTURES.md §F6).
  *
  * All loads go through `spark.read.parquet` so Catalyst's predicate
  * pushdown / column pruning reach the scan (verified via
  * `.explain("formatted")` — `PushedFilters` / `ReadSchema`). At cluster
  * scale these would be partitioned/bucketed tables; the loaders are the
  * single place to swap in a catalog.
  */
object Tables {
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events` is written with parquet TIMESTAMP(NANOS), which Spark's
    * vectorized reader only accepts as a raw long under
    * `spark.sql.legacy.parquet.nanosAsLong`. We normalize to a proper
    * microsecond NTZ timestamp column so downstream operators (windows,
    * event-time grouping, streaming) see a regular timestamp. DuckDB reads
    * the same file natively as TIMESTAMP (ns truncated to us), so both
    * sides agree after the div-1000 truncation.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
}
