package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Evidence generator: times q50's two exact-percentile surfaces on the
  * same frame in one JVM — the count-map `TypedImperativeAggregate`
  * (`exact_percentiles`, an ObjectHashAggregate whose per-row path is
  * interpreted) against the rank-selection operator
  * (`graft.ops.Percentiles.exactMulti`, whose row-scale aggregates are
  * whole-stage-codegen'd). Both are pinned bit-equal by PercentilesSpec;
  * this probe decides which one the catalog's q50 should run.
  *
  *   sbt "runMain graft.tools.PercentileAb data/sf1 5"
  */
object PercentileAb {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(5)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def countMap() = {
      graft.functions.ExactPercentilesF.register(spark)
      import graft.functions.ExactPercentilesF.exactPercentiles
      graft.Tables(spark, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          exactPercentiles(col("l_quantity"), Seq(0.5, 0.95)).as("qp"),
          exactPercentiles(col("l_extendedprice"), Seq(0.25)).as("pp"))
        .select(col("l_returnflag"),
          round(element_at(col("qp"), 1), 6).as("p50"),
          round(element_at(col("qp"), 2), 6).as("p95"),
          round(element_at(col("pp"), 1), 6).as("price_p25"))
        .orderBy("l_returnflag")
    }
    def rankSel() = {
      graft.ops.Percentiles.exactMulti(
          graft.Tables(spark, dir, "lineitem"), "l_returnflag", Seq(
            ("l_quantity", "p50_r", 0.5), ("l_quantity", "p95_r", 0.95),
            ("l_extendedprice", "p25_r", 0.25)))
        .select(col("l_returnflag"),
          round(col("p50_r"), 6).as("p50"), round(col("p95_r"), 6).as("p95"),
          round(col("p25_r"), 6).as("price_p25"))
        .orderBy("l_returnflag")
    }

    def consume(df: org.apache.spark.sql.DataFrame): Unit =
      df.queryExecution.toRdd.foreach(_ => ())
    def med(f: () => org.apache.spark.sql.DataFrame): Double = {
      consume(f()) // warm
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); consume(f()); (System.nanoTime() - t0) / 1e9
      }.sorted
      ts(ts.size / 2)
    }
    // Scan twin (r15 attribution): the same group key and the same two
    // decoded double columns through a fully codegen'd HashAggregate —
    // parquet-decode floor plus a trivial aggregate. count_map − this =
    // the ObjectHashAggregate interpreted-update premium q50 actually
    // pays on top of the unavoidable scan.
    def scanTwin() =
      graft.Tables(spark, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(sum("l_quantity").as("sq"), sum("l_extendedprice").as("sp"))
        .orderBy("l_returnflag")

    // equality first (PercentilesSpec pins it at test scale; re-assert here)
    val a = countMap().collect().toSeq
    val b = rankSel().collect().toSeq
    require(a == b, s"surfaces disagree:\n$a\n$b")
    // interleaved reps
    println(f"""{"count_map_sec":${med(countMap)}%.3f,"rank_selection_sec":${med(rankSel)}%.3f,"scan_twin_sec":${med(scanTwin)}%.3f,"dir":"$dir"}""")
    spark.stop()
  }
}
