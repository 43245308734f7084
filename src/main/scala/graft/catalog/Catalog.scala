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

  /** Release everything the catalog holds resident for one dataset:
    * memoized corpus snapshots, cell/IVF assignments, and every scoped
    * checkpoint whose key embeds the dataset dir. For long-lived
    * drivers that move BETWEEN datasets (the bench finishing its sf0.1
    * block before the sf1 block): the finished dataset's dead frames
    * otherwise occupy the block store for the JVM lifetime and feed
    * exactly the GC/block-pressure noise the solo-vs-in-bench gap
    * measures. Everything rebuilds transparently if the dataset is
    * queried again.
    */
  def releaseDatasetState(spark: org.apache.spark.sql.SparkSession,
                          dir: String): Unit = {
    DedupQueries.releaseDataset(spark, dir)
    SimilarityQueries.releaseDataset(spark, dir)
    ScalarQueries.releaseDataset(spark, dir)
    graft.util.Checkpoints.closeMatching(spark,
      graft.util.Checkpoints.keyHasDir(_, dir))
  }
}
