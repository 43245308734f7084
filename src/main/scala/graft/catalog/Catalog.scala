package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One catalog entry: a Spark query over a testdata dir, plus (when
  * SQL-expressible) the equivalent ANSI SQL the driver runs in DuckDB over
  * the same parquet tables. Column names/aliases MUST match between the
  * two — the driver sorts columns by name before hashing values.
  *
  * Determinism rules every entry follows:
  *  - final `orderBy` on a unique key set (hash compare is order-sensitive);
  *  - money aggregates go through exact `DECIMAL(18,2)` arithmetic and are
  *    cast to double only at the end (double-sum order nondeterminism would
  *    flip last-ulp bits between Spark and DuckDB);
  *  - window frames pinned to `ROWS BETWEEN ...` explicitly;
  *  - top-k always tie-broken by the key.
  */
final case class Q(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String = "")

object Catalog {
  /** All registered query modules, merged for SparkEntry. */
  def all: Map[String, Q] =
    CoreQueries.all ++ ScalarQueries.all ++ TextQueries.all ++
      DedupQueries.all ++ SimilarityQueries.all ++ MultimodalQueries.all
}
