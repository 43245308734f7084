package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training pipelines: assign documents, in a
  * deterministic global order, to fixed token-budget bins (the
  * concat-then-chunk packing used to build training sequences).
  *
  * The core primitive is a SCALABLE global prefix sum. A naive
  * `sum(...).over(Window.orderBy(id))` puts the entire table in ONE
  * partition — the classic window-scaling trap. [[prefixSum]] is the
  * standard two-phase decomposition instead:
  *
  *   1. coarse bucket `b = id div bucketWidth`; per-bucket totals via a
  *      partial-aggregated `groupBy` (map-side combine, one small
  *      exchange);
  *   2. exclusive bucket offsets via a window over the TINY totals table
  *      (N / bucketWidth rows — at 10^12 rows and width 2^20 that is
  *      ~10^6 rows, trivially one partition; recurse if ever not);
  *   3. broadcast-join offsets back and add a per-bucket window cumsum
  *      (partitioned by bucket — parallelism = number of buckets).
  *
  * Equivalence with the single-partition window form is exactly what the
  * q81 oracle checks.
  */
object Packing {

  /** Inclusive prefix sum of `valCol` in `orderCol` order (must be a
    * unique non-negative numeric id — if `orderCol` has duplicate values,
    * the inner window's order ties and each tied row's `cum` is
    * partitioning-dependent; uniqueness is the caller's contract, as a
    * distributed check would cost the very aggregate pass this operator
    * exists to avoid duplicating). Adds column `cum`.
    *
    * Fails fast (not silently-overwrites) if the input schema already
    * contains the output or scratch columns: `withColumn` REPLACES an
    * existing column of the same name, which would corrupt caller data.
    */
  def prefixSum(df: DataFrame, orderCol: String, valCol: String,
                bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    requireFreeColumns(df, Seq("cum", "_psb", "_pso", "_pst"))
    val withB = df.withColumn("_psb",
      expr(s"$orderCol div $bucketWidth"))
    val offsets = withB
      .groupBy(col("_psb"))
      .agg(sum(col(valCol).cast("long")).as("_pst"))
      .withColumn("_pso",
        coalesce(
          sum(col("_pst")).over(Window.orderBy(col("_psb"))
            .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("_psb"), col("_pso"))
    val inner = Window.partitionBy(col("_psb")).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withB
      .join(broadcast(offsets), Seq("_psb"))
      .withColumn("cum",
        col("_pso") + sum(col(valCol).cast("long")).over(inner))
      .drop("_psb", "_pso")
  }

  /** Pack rows (in `orderCol` order) into bins of `budget` units of
    * `valCol`: concat-then-chunk — a row's bin is where its span STARTS,
    * `bin = (cum - val) div budget`, so bins hold ~budget units with
    * bounded overflow (< max row value). Never splits a row, fully
    * parallel, reproducible under any partitioning. Adds `cum` and
    * `bin`.
    */
  def packBins(df: DataFrame, orderCol: String, valCol: String,
               budget: Long, bucketWidth: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    requireFreeColumns(df, Seq("bin"))
    prefixSum(df, orderCol, valCol, bucketWidth)
      .withColumn("bin",
        expr(s"(cum - cast($valCol as bigint)) div $budget"))
  }

  /** Guard for the output/scratch column names these operators add:
    * `withColumn` silently replaces an existing same-named column, so a
    * collision must be an error at plan time, not data corruption at run
    * time. (Spark column names are case-insensitive by default — compare
    * lowercased.)
    */
  private def requireFreeColumns(df: DataFrame, names: Seq[String]): Unit = {
    val present = df.columns.map(_.toLowerCase)
    val clash = names.filter(n => present.contains(n.toLowerCase))
    require(clash.isEmpty,
      s"Packing: input already has column(s) ${clash.mkString(", ")} — " +
        "these names are reserved for the operator's output/scratch; " +
        "rename them before calling")
  }
}
