package graft.pipelines


import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bucketing: the co-located-join layout for repeated large-large joins
  * (SURVEY §2.3 scale note). Writing both sides bucketed by the join key
  * into the session catalog lets Spark plan the join with ZERO exchanges —
  * at 100 TB this turns every recurring fact-fact join into a local merge.
  */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("joins between tables bucketed on the key plan without a shuffle") {
    val orders = graft.Tables(spark, sf, "orders")
    val lineitem = graft.Tables(spark, sf, "lineitem")

    orders.write.mode("overwrite")
      .bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("b_orders")
    lineitem.write.mode("overwrite")
      .bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("b_lineitem")

    val joined = spark.table("b_lineitem")
      .join(spark.table("b_orders"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))

    val plan = joined.queryExecution.executedPlan.toString
    // bucketed-bucketed equi-join: no Exchange below the join
    val joinPart = plan.split("HashAggregate").last
    assert(!joinPart.contains("Exchange hashpartitioning(l_orderkey"))
    assert(!joinPart.contains("Exchange hashpartitioning(o_orderkey"))

    // and results match the unbucketed join
    val expected = lineitem.join(orders, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    val got = joined.as[(String, Long)].collect().toMap
    assert(got == expected)

    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
  }
}
