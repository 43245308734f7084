package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling/splitting for training pipelines.
  *
  * Everything keys off [[hashBucket]] — an md5-derived uniform value in
  * [0,1) computed from the row's id — NOT `rand()`/`randomSplit`, which
  * change with partitioning, retries, and cluster size. Hash-keyed
  * assignment is reproducible forever, survives re-runs over 100 TB, and
  * is stable under incremental appends (a doc's split never changes when
  * new data arrives) — the property eval-set hygiene actually needs.
  */
object Sampling {

  /** Uniform [0,1) from the first 8 md5 hex chars of (id, salt). */
  def hashBucket(id: Column, salt: String = ""): Column =
    conv(substring(md5(concat(id.cast("string"), lit(salt))), 1, 8), 16, 10)
      .cast("long") / lit(4294967296.0)

  /** Assign each row a split label by cumulative weight ranges, e.g.
    * `Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)`.
    */
  def assignSplit(df: DataFrame, idCol: String,
                  splits: Seq[(String, Double)], salt: String = ""): DataFrame =
    assignSplitBy(df, col(idCol), splits, salt)

  /** [[assignSplit]] keyed on an arbitrary column — the leakage-safe
    * form: bucket on a duplicate-cluster REPRESENTATIVE id (from exact
    * dedup or connected components) and every member of a cluster lands
    * in the same split, so near-identical text can never straddle the
    * train/eval boundary (the contamination a per-doc hash split cannot
    * prevent). Pure column expression — the caller supplies the rep
    * column however it was derived; no shuffle is added here.
    */
  def assignSplitBy(df: DataFrame, key: Column,
                    splits: Seq[(String, Double)],
                    salt: String = ""): DataFrame = {
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9, "weights must sum to 1")
    val b = hashBucket(key, salt)
    val cuts = splits.scanLeft(0.0)(_ + _._2).tail
    val expr = splits.init.zip(cuts.init).foldRight(lit(splits.last._1): Column) {
      case (((name, _), cut), rest) => when(b < cut, lit(name)).otherwise(rest)
    }
    df.withColumn("split", expr)
  }

  /** Per-stratum deterministic sampling: keep a row iff its hash bucket is
    * below its stratum's fraction (strata absent from the map are dropped).
    */
  def stratifiedSample(df: DataFrame, strataCol: String, idCol: String,
                       fractions: Map[String, Double],
                       salt: String = ""): DataFrame = {
    val b = hashBucket(col(idCol), salt)
    val frac = fractions.foldRight(lit(0.0): Column) {
      case ((stratum, f), rest) =>
        when(col(strataCol) === stratum, lit(f)).otherwise(rest)
    }
    df.filter(b < frac)
  }

  /** Mixture resampling to a per-stratum BUDGET (training-data mixing):
    * downsample each stratum so its expected `valCol` mass is `budget`
    * (strata already under budget are kept whole). The keep rate is
    * derived from the data — `min(1, budget / stratum_total)` via one
    * partial-aggregated groupBy broadcast back onto the rows — and
    * membership is hash-keyed per [[hashBucket]], so the sample is
    * reproducible under repartitioning, retries, and appends, and no
    * row ever flips strata between runs. Adds `keep_rate`.
    *
    * The stratum totals are summed in the column's own type — pass an
    * INTEGRAL `valCol` (token counts are) so the sum is exact and the
    * rate is a single IEEE division, bit-identical cross-engine; a
    * double-typed `valCol` would make the rate depend on summation
    * order. Expected-mass (not exact-knapsack) targeting is the
    * standard mixture-weights contract — at corpus scale the realized
    * mass concentrates tightly around the budget.
    */
  def sampleToBudget(df: DataFrame, strataCol: String, idCol: String,
                     valCol: String, budget: Double,
                     salt: String = ""): DataFrame = {
    require(budget > 0, "budget must be positive")
    val totals = df.groupBy(col(strataCol))
      .agg(sum(col(valCol)).as("_tot"))
      .withColumn("keep_rate",
        least(lit(1.0), lit(budget) / col("_tot").cast("double")))
      .select(col(strataCol), col("keep_rate"))
    df.join(broadcast(totals), Seq(strataCol))
      .filter(hashBucket(col(idCol), salt) < col("keep_rate"))
  }

  /** Deterministic EXACTLY-k-per-group sample (cluster/stratum-balanced
    * selection: k docs per language, per topic cell, per near-dup
    * cluster...): rank rows inside each group by [[hashBucket]] and
    * keep the k smallest, ties broken by id. Semantically the ranking
    * window `row_number().over(partitionBy(g).orderBy(bucket, id)) <= k`,
    * but executed as the [[graft.functions.TopK]] bounded-buffer
    * aggregate: no sort operator anywhere, per-group state is k pairs,
    * and map-side combine ships at most k rows per (group, task) — a
    * billion-doc stratum costs the same exchange bytes as a thousand-doc
    * one. Bottom-k by a fixed hash is also append-FRIENDLY: a new doc
    * enters a group's sample only by displacing the largest kept bucket
    * (KMV semantics), never by reshuffling the whole selection.
    * Output: groupCol, `rk` (1..k, bigint), idCol (bigint).
    */
  def samplePerGroup(df: DataFrame, groupCol: String, idCol: String,
                     k: Int, salt: String = ""): DataFrame =
    df.select(col(groupCol), col(idCol))
      .groupBy(col(groupCol))
      .agg(graft.functions.TopK.topKPairs(
        -hashBucket(col(idCol), salt), col(idCol).cast("long"), k).as("top"))
      .select(col(groupCol), posexplode(col("top")))
      .select(col(groupCol), (col("pos") + 1).cast("long").as("rk"),
        col("col.id").as(idCol))
}
