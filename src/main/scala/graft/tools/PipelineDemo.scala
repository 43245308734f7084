package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession

import graft.pipelines._

/** End-to-end demo of the reference-parity pipelines (E1+E2+E3): ingest a
  * raw-scrape-shaped CSV + county dimension, compute growth and county
  * stats, exercise all three sink modes. Usage:
  *   sbt "runMain graft.tools.PipelineDemo <rawCasesCsv> <countiesJson>"
  */
object PipelineDemo {
  def main(args: Array[String]): Unit = {
    val Array(rawCsv, countiesJson) = args
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val out = Files.createTempDirectory("graft-demo").toString
    val counties = Ingest.readCounties(spark, countiesJson)
    val cases = Ingest.normalizeCases(
      Ingest.readRawCasesCsv(spark, rawCsv), counties)

    println(s"=== normalized cases (${cases.count()}):")
    cases.show(10, 40)

    // E1 sinks: initial load, then an incremental re-run (S7)
    val loaded = Sinks.appendIncremental(spark, cases, s"$out/florida", "case_number")
    val rerun = Sinks.appendIncremental(spark, cases, s"$out/florida", "case_number")
    println(s"=== S7 incremental: first=$loaded rerun=$rerun (expect N,0)")

    val stored = spark.read.parquet(s"$out/florida")

    // E2: growth series + rates (S9 truncate-and-reload)
    val growth = GrowthStats.growthSeries(stored, simulate = true)
    Sinks.truncateAndReload(growth, s"$out/florida_growth")
    println("=== florida_growth (actual + predicted):")
    spark.read.parquet(s"$out/florida_growth").orderBy("series", "date").show(30)

    val rates = GrowthStats.growthRates(stored)
    Sinks.truncateAndReload(rates, s"$out/florida_growth_rates")
    println("=== florida_growth_rates:")
    spark.read.parquet(s"$out/florida_growth_rates").orderBy("date").show()

    // E3: top-5 counties (S9)
    val top5 = CountyStats.topFiveCounties(stored, counties)
    Sinks.truncateAndReload(top5, s"$out/top_five_counties")
    println("=== top_five_counties:")
    spark.read.parquet(s"$out/top_five_counties").orderBy("county", "date").show()

    println(s"=== sinks written under $out")
    spark.stop()
  }
}
