package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Evidence probe behind the r15 dailystore read-front decision.
  * Builds a 400-day store (one file per day), then times fresh
  * `spark.read.parquet` plans — each one re-lists the store — for a
  * pruned single-day count and a full count, against a 5-day control.
  *
  * Measured (local[32], local FS, medians-of-5): pruned single-day
  * read 0.93 s on the 400-day store vs 0.14 s on the 5-day store —
  * ~0.8 s of per-query discovery (parallel-listing job + partition
  * parse) before a single row is read, and local FS is the CHEAP
  * case. Decision: `DailyStoreTable` gained BATCH_READ by delegating
  * to Spark's DSv2 parquet `FileTable` (vectorized reader, pruning,
  * `FileScan` statistics for AQE); the delegate is rebuilt per table
  * resolution — caching the FileIndex across queries would serve
  * stale reads after a write, and read-after-write correctness beats
  * amortizing a listing this probe shows is sub-second even at 400
  * partitions.
  */
object ListingProbe {
  def main(args: Array[String]): Unit = {
    val days = args.headOption.map(_.toInt).getOrElse(400)
    val reps = args.lift(1).map(_.toInt).getOrElse(5)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def build(n: Int): String = {
      val dir = new java.io.File(sys.props("java.io.tmpdir"),
        s"listing_probe_${n}_${System.nanoTime()}").getPath
      spark.range(n.toLong * 10)
        .select(date_add(lit(java.sql.Date.valueOf("2020-01-01")),
          (col("id") % n).cast("int")).as("d"),
          col("id").as("v"))
        .write.format("dailystore").option("path", dir)
        .mode("append").save()
      dir
    }
    // listing still re-runs per fresh read after the warm pass
    def medTime(f: () => Unit): Double = Timing.medianSec(reps)(f)
    val big = build(days)
    val small = build(5)
    val oneDay = java.sql.Date.valueOf("2020-01-03")
    val prunedBig = medTime(() => {
      spark.read.parquet(big).filter(col("d") === oneDay).count(); ()
    })
    val fullBig = medTime(() => { spark.read.parquet(big).count(); () })
    val prunedSmall = medTime(() => {
      spark.read.parquet(small).filter(col("d") === oneDay).count(); ()
    })
    println(f"""{"days":$days,"pruned_big_sec":$prunedBig%.3f,"full_big_sec":$fullBig%.3f,"pruned_small_sec":$prunedSmall%.3f}""")
    spark.stop()
  }
}
