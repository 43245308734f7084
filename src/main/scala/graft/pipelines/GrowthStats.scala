package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Analytics

/** E2 — GrowthStats analytics (cv-stats.py:86-134): daily counts →
  * cumulative sum → growth rates → optional 14-day growth simulation,
  * producing the `florida_growth` and `florida_growth_rates` shapes
  * (FIXTURES.md F5).
  */
object GrowthStats {

  /** P13 — exclude the still-open current day (cv-stats.py:34-35). */
  def excludeOpenDay(cases: DataFrame, dateCol: String = "date_added"): DataFrame =
    cases.filter(col(dateCol) < date_sub(current_date(), 1))

  /** `florida_growth_rates` shape: (date, rate); first row null
    * (cv-stats.py:122-129).
    */
  def growthRates(cases: DataFrame, dateCol: String = "date_added"): DataFrame =
    Analytics.growthRates(
        Analytics.cumSum(Analytics.dailyCounts(cases, col(dateCol))))
      .select(col("d").as("date"), col("rate"))

  /** `florida_growth` shape: (date, count, series) — actual cumulative
    * series plus, when `simulate`, the predicted compound-growth tail
    * (cv-stats.py:95-115). The growth factor is the trailing-5 mean rate
    * (cv-stats.py:107), fetched as a 1-row frame — no collect in the plan;
    * the single `first()` mirrors the reference's scalar gf and is a
    * 1-row driver fetch, not a data-sized collect.
    */
  def growthSeries(cases: DataFrame, simulate: Boolean = false,
                   simDays: Int = 14, dateCol: String = "date_added"): DataFrame = {
    val cum = Analytics.cumSum(Analytics.dailyCounts(cases, col(dateCol)))
    val actual = cum.select(col("d"), col("cum").as("count"))
    if (!simulate) {
      actual.withColumn("series", lit("actual"))
        .select(col("d").as("date"), col("count"), col("series"))
    } else {
      val gf = Analytics.trailingMean(Analytics.growthRates(cum), 5)
        .first().getDouble(0)
      val last = actual.orderBy(desc("d")).limit(1)
        .select(col("d"), col("count").as("cum"))
      val predicted = Analytics.growthSim(last, simDays, gf)
      Analytics.tagAndUnion(actual, predicted)
        .select(col("d").as("date"), col("count"), col("series"))
    }
  }
}
