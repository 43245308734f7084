package graft.pipelines

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the property Sinks.reloadBucketed exists for: an equi-join
  * between two tables co-bucketed on the join key (same key, same bucket
  * count) plans WITHOUT any exchange — each bucket joins only its twin —
  * and returns the same rows as the plain shuffled join.
  */
class BucketedJoinSpec extends SparkSpec {

  private lazy val root = java.nio.file.Files
    .createTempDirectory("graft_bucketed_spec").toString

  private lazy val tables: (String, String) = {
    Sinks.reloadBucketed(graft.Tables(spark, sf, "lineitem"),
      "spec_li_bkt", s"$root/li", "l_orderkey", 4)
    Sinks.reloadBucketed(graft.Tables(spark, sf, "orders"),
      "spec_ord_bkt", s"$root/ord", "o_orderkey", 4)
    ("spec_li_bkt", "spec_ord_bkt")
  }

  test("co-bucketed join plans with zero exchanges") {
    val (li, ord) = tables
    val joined = spark.table(li).hint("merge")
      .join(spark.table(ord), col("l_orderkey") === col("o_orderkey"))
      .select("l_orderkey", "l_quantity", "o_orderpriority")
    joined.count() // finalize the adaptive plan
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected exchange in:\n$plan")
  }

  test("bucketed join returns exactly the plain join's rows") {
    val (li, ord) = tables
    val bucketed = spark.table(li).hint("merge")
      .join(spark.table(ord), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
    val plain = graft.Tables(spark, sf, "lineitem")
      .join(graft.Tables(spark, sf, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
    assert(bucketed.orderBy("o_orderpriority").collect().toSeq ==
      plain.orderBy("o_orderpriority").collect().toSeq)
  }

  test("each bucket directory holds exactly one file") {
    tables
    val files = new java.io.File(s"$root/li").listFiles()
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_"))
    assert(files.length == 4, files.map(_.getName).mkString(", "))
  }
}
