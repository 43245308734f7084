package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Evidence probe for the r16 time-travel retention cost: runs the
  * SAME daily re-ingest loop (N dynamic day-replace commits, each
  * rewriting 3 days of a seeded store) against a plain store and a
  * retention-enabled one, in one JVM, and reports total wall seconds
  * for each loop. The delta is the per-commit price of archiving
  * condemned files (renames instead of deletes) + version bookkeeping
  * (one root listing for the sequence, manifest retention rename,
  * prune).
  *
  *   sbt "runMain graft.tools.RetentionProbe 20"
  */
object RetentionProbe {
  def main(args: Array[String]): Unit = {
    val commits = args.headOption.map(_.toInt).getOrElse(20)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def batch(round: Int) = spark.range(3000)
      .select(date_add(lit(java.sql.Date.valueOf("2024-01-01")),
        (col("id") % 3).cast("int")).as("d"),
        (col("id") + round).cast("int").as("n"),
        concat(lit(s"r$round-"), col("id")).as("label"))

    def loop(dir: String): Double = {
      val t0 = System.nanoTime()
      (1 to commits).foreach { r =>
        batch(r).write.format("dailystore").option("path", dir)
          .option("partitionOverwriteMode", "dynamic")
          .mode("overwrite").save()
      }
      (System.nanoTime() - t0) / 1e9
    }

    val root = new java.io.File(sys.props("java.io.tmpdir"),
      s"retention_probe_${System.nanoTime()}").getPath
    val plainDir = s"$root/plain"
    val ttDir = s"$root/tt"
    // seed both (untimed), enable retention on one
    batch(0).write.format("dailystore").option("path", plainDir)
      .mode("append").save()
    batch(0).write.format("dailystore").option("path", ttDir)
      .mode("append").save()
    graft.sources.DailyStoreTimeTravel.enable(spark, ttDir, keep = 5)
    val warm = loop(plainDir) // one untimed warm loop (JIT)
    val plain = loop(plainDir)
    val tt = loop(ttDir)
    println(f"""{"commits":$commits,"plain_loop_sec":$plain%.3f,"retention_loop_sec":$tt%.3f,"per_commit_delta_ms":${(tt - plain) / commits * 1000}%.1f,"warm_sec":$warm%.3f}""")
    spark.stop()
  }
}
