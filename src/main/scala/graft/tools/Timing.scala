package graft.tools

import org.apache.spark.sql.DataFrame

/** The ONE timing discipline every evidence tool shares with
  * [[graft.Bench]]: full materialization through `toRdd` (keeps the
  * declared plan — `.count()` lets Catalyst prune computed columns and
  * eliminate joins, the r12 consumption trap), one untimed warm pass,
  * then the median of `reps` timed passes. Tools must measure the same
  * thing the bench measures, or their numbers attribute nothing; any
  * future change to the consumption contract lands here once.
  */
object Timing {

  /** Execute `df` doing ALL its declared work, discarding rows. */
  def materialize(df: DataFrame): Unit =
    df.queryExecution.toRdd.foreach(_ => ())

  /** Median-of-`reps` wall seconds of `body`, after one untimed warm
    * invocation (JIT + page cache; re-planning still happens per call).
    */
  def medianSec(reps: Int)(body: () => Unit): Double = {
    body() // warm
    val ts = (1 to reps).map { _ =>
      val t0 = System.nanoTime(); body(); (System.nanoTime() - t0) / 1e9
    }.sorted
    ts(ts.size / 2)
  }

  /** [[medianSec]] over a DataFrame builder, each pass fully
    * materialized — the standard per-query probe. */
  def medianDf(reps: Int)(f: () => DataFrame): Double =
    medianSec(reps)(() => materialize(f()))
}
