package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.catalog.Catalog

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * The actual query definitions live in `graft.catalog.*`; this object is
  * the stable facade the driver calls.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Runs the E2 GrowthStats core (A3 daily counts + W1 cumsum + W3 rates).
    */
  def entry(spark: SparkSession): DataFrame =
    Catalog.all("q03_growth_rates").fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Catalog.all.map { case (name, q) => name -> q.fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops (driver
    * falls back to a rows-only check).
    */
  def oracleSql: Map[String, String] =
    Catalog.all.collect { case (name, q) if q.oracle.isDefined =>
      name -> q.oracle.get
    }
}
