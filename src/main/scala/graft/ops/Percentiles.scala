package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact per-group percentiles with BOUNDED state: distributed rank
  * selection instead of Spark's `percentile()` aggregate.
  *
  * Spark's exact `percentile` is a buffer-everything
  * TypedImperativeAggregate: every value of a group is held in that
  * group's aggregation buffer, so per-group state is O(rows) on a
  * single task — at 100 TB a low-cardinality group key (q50's
  * `l_returnflag`: ~10^11 rows per flag) is a straight OOM, the one
  * true state-explosion the r12 plan audit named. This operator keeps
  * the SAME declared semantics (linear interpolation between the two
  * bracketing order statistics — `QUANTILE_CONT`) with state bounded
  * by DISTINCT VALUES per group, never rows:
  *
  *  1. Per value column, one pass counts value occurrences —
  *     `groupBy(group, value).count()`, a two-phase (partial map-side)
  *     hash agg whose only row-scale exchange ships at most one row
  *     per distinct (group, value) pair. Multi-column requests run one
  *     independent pass per column and join the per-group scalars
  *     (broadcast-sized). A single-scan `GROUPING SETS
  *     ((group, v1), (group, v2))` fusion was MEASURED SLOWER at sf1
  *     (2.58 s vs 2.01 s for q50's three percentiles over two
  *     columns): the Expand agg pays a 3-wide nullable group key
  *     (string + 2 doubles) on 2x rows, which costs more than the
  *     second narrow scan it saves — so the independent passes stand.
  *  2. A per-(group, column) window over the value-ordered DISTINCT
  *     values computes cumulative counts — each value row learns the
  *     0-indexed position range `[cum - cnt, cum)` it occupies in the
  *     group's sorted multiset, plus the group total `n`.
  *  3. For each requested percentile p, the target position
  *     `t = p * (n-1)` falls inside exactly one value's range for
  *     `floor(t)` and one for `ceil(t)`; a final per-group agg selects
  *     those bracketing values for every requested (column, p) at once
  *     and interpolates `lo*(floor(t)+1-t) + hi*(t-floor(t))` (Spark's
  *     `Percentile` formula; collapses to `lo` when t is integral
  *     since then hi == lo).
  *
  * The window partitions by (group, column), so one task holds one
  * group's distinct values for one column — O(distinct) state, the
  * floor for EXACT rank selection without a fixed value domain. For
  * q50's columns that is ~50 quantities / ~2*10^5 prices per flag vs
  * ~10^11 rows at the 100 TB point. (When even distinct values
  * explode, the approximate path is `approx_percentile`, a fixed-size
  * sketch — a different declared semantic, so not this operator.)
  */
object Percentiles {

  /** Exact linear-interpolation percentiles of `valueCol` per
    * `groupCol`: one output row per group, one column per requested
    * `(outName, p)`. Null values are excluded (as `percentile` and
    * `QUANTILE_CONT` both exclude them); a group with only nulls
    * drops out of the counts entirely (no output row), matching SQL
    * aggregation over `WHERE value IS NOT NULL`.
    */
  def exact(df: DataFrame, groupCol: String, valueCol: String,
            ps: Seq[(String, Double)]): DataFrame = {
    require(ps.nonEmpty && ps.forall { case (_, p) => p >= 0 && p <= 1 },
      s"percentiles must be in [0,1]: $ps")
    // 1. occurrence counts — the only row-scale exchange
    val counts = df
      .filter(col(valueCol).isNotNull)
      .groupBy(col(groupCol), col(valueCol).as("_v"))
      .agg(count(lit(1)).as("_c"))
    // 2. position ranges over one group's distinct values
    val byValue = Window.partitionBy(groupCol).orderBy("_v")
    val whole = Window.partitionBy(groupCol)
    val ranked = counts
      .withColumn("_cum", sum("_c").over(byValue)) // rows with value <= _v
      .withColumn("_n", sum("_c").over(whole))     // group row count
      .withColumn("_lo", col("_cum") - col("_c"))  // first 0-indexed pos of _v
    // 3. bracketing-value selection + interpolation for every p in one
    // final per-group agg
    val aggs: Seq[Column] = ps.flatMap { case (name, p) =>
      val t = lit(p) * (col("_n") - 1).cast("double")
      def at(rank: Column): Column =
        max(when(rank >= col("_lo") && rank < col("_cum"), col("_v")))
      Seq(at(floor(t)).as(s"_${name}_l"), at(ceil(t)).as(s"_${name}_h"),
        max(t).as(s"_${name}_t")) // t is group-constant
    }
    val interp: Seq[Column] = ps.map { case (name, _) =>
      val l = col(s"_${name}_l")
      val h = col(s"_${name}_h")
      val t = col(s"_${name}_t")
      (l * (floor(t) + 1 - t) + h * (t - floor(t))).as(name)
    }
    ranked.groupBy(groupCol).agg(aggs.head, aggs.tail: _*)
      .select(col(groupCol) +: interp: _*)
  }

  /** Percentiles over possibly-different value columns: one
    * independent [[exact]] pass per column (the measured winner — see
    * class doc), joined on the group key. The join inputs are
    * one-row-per-group aggregates, so AQE broadcasts them; column
    * order in the output follows `specs`.
    *
    * The join is FULL OUTER: a group whose values are all null for one
    * column drops out of that column's [[exact]] output, and an inner
    * join would then silently discard the group's real percentiles for
    * every OTHER column too. Outer-joining keeps the group with nulls
    * for the missing column — the same shape `percentile()` returns
    * (null for an all-null column, values elsewhere).
    */
  def exactMulti(df: DataFrame, groupCol: String,
                 specs: Seq[(String, String, Double)]): DataFrame = {
    val perCol = specs.groupBy(_._1).toSeq
      .sortBy { case (vcol, _) => specs.indexWhere(_._1 == vcol) }
      .map { case (vcol, ss) =>
        exact(df, groupCol, vcol, ss.map { case (_, n, p) => (n, p) })
      }
    val joined = perCol.reduce(_.join(_, Seq(groupCol), "full_outer"))
    joined.select(col(groupCol) +: specs.map(s => col(s._2)): _*)
  }
}
