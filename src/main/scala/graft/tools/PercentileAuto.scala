package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Evidence probe for the r16 auto-routing question: per-COLUMN, when
  * does the two-phase histogram shape (codegen count → weighted
  * count-map fold, q97's shape) beat the single-phase count-map
  * aggregate (q50's shape)? The r15 A/B bundled a near-unique column
  * (l_extendedprice) into every two-phase variant, so it measured the
  * mix, not the pivot. This times SINGLE-column cells — both shapes on
  * each of l_discount (11 distinct), l_quantity (50), l_extendedprice
  * (~1M 2-dp money values) — in one JVM, medians-of-reps, asserting
  * result equality per cell.
  *
  *   sbt "runMain graft.tools.PercentileAuto data/sf1 5"
  */
object PercentileAuto {
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
    graft.functions.ExactPercentilesF.register(spark)
    graft.functions.ExactPercentilesF.registerWeighted(spark)
    import graft.functions.ExactPercentilesF.{exactPercentiles,
      exactPercentilesWeighted}

    def li = graft.Tables(spark, dir, "lineitem")
    val ps = Seq(0.5, 0.95)

    def countMap(c: String): DataFrame =
      li.groupBy("l_returnflag")
        .agg(exactPercentiles(col(c), ps).as("p"))
        .select(col("l_returnflag"),
          round(element_at(col("p"), 1), 6).as("p50"),
          round(element_at(col("p"), 2), 6).as("p95"))
        .orderBy("l_returnflag")

    def twoPhase(c: String): DataFrame =
      li.groupBy(col("l_returnflag"), col(c).as("v"))
        .agg(count(col(c)).as("n"))
        .groupBy("l_returnflag")
        .agg(exactPercentilesWeighted(col("v"), col("n"), ps).as("p"))
        .select(col("l_returnflag"),
          round(element_at(col("p"), 1), 6).as("p50"),
          round(element_at(col("p"), 2), 6).as("p95"))
        .orderBy("l_returnflag")

    val cols = Seq("l_discount", "l_quantity", "l_extendedprice")
    val distincts = cols.map(c =>
      c -> li.select(approx_count_distinct(col(c))).head().getLong(0)).toMap
    // result equality per column before timing anything
    cols.foreach { c =>
      val a = countMap(c).collect().toSeq
      val b = twoPhase(c).collect().toSeq
      require(a == b, s"shapes disagree on $c: $a vs $b")
    }
    def med(f: () => DataFrame): Double = Timing.medianDf(reps)(f)
    val cells = cols.flatMap { c =>
      Seq(s"${c}_count_map_sec" -> med(() => countMap(c)),
        s"${c}_two_phase_sec" -> med(() => twoPhase(c)))
    }
    val body = (cols.map(c =>
        s""""${c}_distinct":${distincts(c)}""") ++
      cells.map { case (k, v) => f""""$k":$v%.3f""" })
      .mkString(",")
    println(s"""{$body,"dir":"$dir"}""")
    spark.stop()
  }
}
