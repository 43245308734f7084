package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.SparkSpec

class ExactMoneySpec extends SparkSpec {
  import spark.implicits._

  test("cents == CAST(x AS DECIMAL(18,2)) * 100 on real money data") {
    val li = graft.Tables(spark, sf, "lineitem")
    val d2 = DecimalType(18, 2)
    val bad = li.select(
        ExactMoney.cents(col("l_extendedprice")).as("fast"),
        (col("l_extendedprice").cast(d2) * 100).cast("long").as("exact"))
      .filter(col("fast") =!= col("exact")).count()
    assert(bad == 0)
    val badQty = li.select(
        ExactMoney.cents(col("l_quantity")).as("fast"),
        (col("l_quantity").cast(d2) * 100).cast("long").as("exact"))
      .filter(col("fast") =!= col("exact")).count()
    assert(badQty == 0)
  }

  test("sumMoney == decimal sum cast to double, including the split recombination") {
    val li = graft.Tables(spark, sf, "lineitem")
    val d2 = DecimalType(18, 2)
    val got = li.groupBy("l_returnflag")
      .agg(ExactMoney.sumMoney(ExactMoney.cents(col("l_extendedprice")), 2)
        .as("s"))
      .orderBy("l_returnflag").as[(String, Double)].collect()
    val want = li.groupBy("l_returnflag")
      .agg(sum(col("l_extendedprice").cast(d2)).cast("double").as("s"))
      .orderBy("l_returnflag").as[(String, Double)].collect()
    assert(got.toSeq == want.toSeq) // bit-equal, not approximate
  }

  test("split identity holds for adversarial longs (sign, boundaries)") {
    val vals = Seq(0L, 1L, -1L, (1L << 20) - 1, 1L << 20, (1L << 20) + 1,
      -(1L << 20) - 1, 987654321098L, -987654321098L, Long.MaxValue / 4,
      -(Long.MaxValue / 4))
    val got = vals.toDF("v")
      .agg(ExactMoney.sumUnits(col("v")).cast("string")).as[String].head()
    assert(BigInt(got.takeWhile(c => c.isDigit || c == '-')) ==
      vals.map(BigInt(_)).sum)
  }

  test("null money propagates into the sum as SQL null-skip") {
    val df = Seq(Some(1.25), None, Some(2.50)).toDF("x")
    val got = df.agg(
        ExactMoney.sumMoney(ExactMoney.cents(col("x")), 2)).as[Double].head()
    assert(got == 3.75)
  }

  test("q12 plan: long-buffer hash agg, no decimal sum in the aggregate") {
    val q = graft.catalog.Catalog.all("q12_pricing_summary")
    val plan = q.fn(spark, sf).queryExecution.executedPlan.toString
    // the aggregation functions must be long sums (split halves) +
    // count; sum(<decimal>) would print a cast to decimal INSIDE sum(...)
    assert(!plan.contains("sum(cast("), plan.linesIterator.take(20).mkString("\n"))
    assert(plan.contains("HashAggregate"), plan)
  }
}
