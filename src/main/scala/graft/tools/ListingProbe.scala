package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Evidence probe behind the dailystore read-front decisions.
  *
  * r15: built a 400-day store (one file per day) and timed fresh
  * `spark.read.parquet` plans — each one re-lists the store — for a
  * pruned single-day count against a 5-day control. Measured
  * (local[32], local FS, medians-of-5): pruned single-day read 0.93 s
  * at 400 days vs 0.14 s at 5 days — ~0.8 s of per-query discovery
  * (parallel-listing job + partition parse) before a single row is
  * read. Decision then: delegate reads to Spark's DSv2 parquet
  * `FileTable`, rebuilt per table resolution, because a cached
  * FileIndex would serve stale reads after a write.
  *
  * r16 (VERDICT follow-up): the same probe SWEPT across store sizes —
  * 400 / 1,600 / 6,400 day partitions (6,400 ≈ a 17-year daily store)
  * — and measuring the CATALOG front (`spark.table` through
  * `DailyStoreTable`'s per-resolution delegate) alongside the bare
  * path read, plus the cached-delegate read when the commit-state
  * cache is enabled. Run:
  *
  *   sbt "runMain graft.tools.ListingProbe 400,1600,6400 5"
  *
  * The numbers decide whether the delegate needs a cache keyed on the
  * store's commit state (`_commit-*` manifests + partition mtimes give
  * exact invalidation) — see the README scaling table for the measured
  * outcome and `DailyStoreTable`'s scaladoc for the decision.
  */
object ListingProbe {
  def main(args: Array[String]): Unit = {
    val sizes = args.headOption.map(_.split(",").map(_.trim.toInt).toSeq)
      .getOrElse(Seq(400, 1600, 6400))
    val reps = args.lift(1).map(_.toInt).getOrElse(5)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def build(root: String, n: Int): String = {
      val dir = s"$root/store_$n"
      spark.range(n.toLong * 10)
        .select(date_add(lit(java.sql.Date.valueOf("2000-01-01")),
          (col("id") % n).cast("int")).as("d"),
          col("id").as("v"))
        .write.format("dailystore").option("path", dir)
        .mode("append").save()
      dir
    }
    def medTime(f: () => Unit): Double = Timing.medianSec(reps)(f)

    val root = new java.io.File(sys.props("java.io.tmpdir"),
      s"listing_probe_${System.nanoTime()}").getPath
    graft.sources.DailyStoreCatalog.register(spark, "lprobe", root)
    val oneDay = java.sql.Date.valueOf("2000-01-03")

    val out = new StringBuilder("{\"stores\":[")
    sizes.zipWithIndex.foreach { case (n, i) =>
      val dir = build(root, n)
      // bare path read: fresh plan => fresh listing every query
      // (Spark's own file source — the cache cannot help here)
      val pruned = medTime(() => {
        spark.read.parquet(dir).filter(col("d") === oneDay).count(); ()
      })
      def catalogRead(): Unit = {
        spark.table(s"lprobe.store_$n")
          .filter(col("d") === oneDay).count(); ()
      }
      // catalog front WITHOUT the commit-state cache: per-resolution
      // delegate rebuild + schema inference (the r15 behavior)
      spark.conf.set("spark.sql.dailystore.readCache", "false")
      val catalogCold = medTime(() => catalogRead())
      // catalog front WITH the cache (default): one listing per store
      // state, then key-checked reuse
      spark.conf.set("spark.sql.dailystore.readCache", "true")
      catalogRead() // builds the cache entry (untimed, like any warm-up)
      val catalogCached = medTime(() => catalogRead())
      if (i > 0) out.append(",")
      out.append(
        f"""{"days":$n,"pruned_path_sec":$pruned%.3f,""" +
          f""""catalog_nocache_sec":$catalogCold%.3f,""" +
          f""""catalog_cached_sec":$catalogCached%.3f}""")
    }
    out.append("]}")
    println(out.toString)
    spark.stop()
  }
}
