package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measured evidence for the merge's cost model (r19 verdict #3):
  * q114/q116 time only the post-merge READ, so "cost is O(touched
  * days' data) + one two-column discovery scan" was argued from the
  * byte-identity pin and plan structure, never measured. This tool
  * stamps the two curves that model predicts, on a deterministic
  * synthetic store (`spark.range` — no dataset dependency, exactly
  * reproducible):
  *
  *  1. TOUCHED-DAY CURVE — fixed store (256 days × 8,192 rows/day),
  *     merges touching T ∈ {1, 4, 16, 64} days (64 updated keys per
  *     touched day, in place). Expect wall time ≈ a + b·T: linear in
  *     touched days, never in store size.
  *  2. STORE-GROWTH CURVE — the same T=16 merge against a 4×-day store
  *     (1,024 days, same rows/day). The REWRITE term is unchanged (the
  *     same 16 days rewrite); only the discovery scan grows with the
  *     store, so the delta between the two stores IS the discovery
  *     scan's growth — stamped directly by the `assumeKeyDayStable`
  *     variant of both points, where discovery is skipped and the two
  *     stores should time FLAT.
  *
  * Each merge re-applies the same idempotent updates (same keys, same
  * values), so every rep performs identical work — the store is
  * day-identical after each commit. Median of `reps` after one untimed
  * warm pass (the graft.Bench discipline via [[Timing]]), with the
  * foreign-cores stamp.
  *
  * Usage: sbt "runMain graft.tools.MergeScaling [reps]"
  * Prints ONE JSON line; recorded as BENCH_SOLO.r20_merge_scaling.
  */
object MergeScaling {

  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(5)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // the general-merge curve drives the SQL MERGE front, whose
      // rewrite rule the extensions inject (r21)
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val rowsPerDay = 8192
    val base = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_mergescale_${System.nanoTime()}").getPath

    def seed(path: String, nDays: Int): Unit = {
      spark.range(0L, nDays.toLong * rowsPerDay)
        .select(
          date_add(lit("2020-01-01").cast("date"),
            (col("id") % nDays).cast("int")).as("d"),
          col("id").as("k"),
          (col("id") * 1.0).as("v"))
        .write.format("dailystore").option("path", path)
        .option("partitionCol", "d").mode("append").save()
    }

    /** 64 keys per touched day, touching days 0 until t, in place
      * (key-day stable in truth, so the stable variant is sound). */
    def updates(nDays: Int, t: Int): DataFrame =
      spark.range(0L, nDays.toLong * rowsPerDay)
        .filter(col("id") % nDays < t && col("id") / nDays < 64)
        .select(
          date_add(lit("2020-01-01").cast("date"),
            (col("id") % nDays).cast("int")).as("d"),
          col("id").as("k"),
          (col("id") * 1.0 + 1.0).as("v"))

    def mergeSec(path: String, nDays: Int, t: Int,
                 stable: Boolean): Double =
      Timing.medianSec(reps) { () =>
        graft.sources.DailyStoreMerge.mergeByKey(
          spark, path, updates(nDays, t), key = "k", pcol = "d",
          assumeKeyDayStable = stable)
        ()
      }

    val small = s"$base/days256"
    val big = s"$base/days1024"
    seed(small, 256)
    seed(big, 1024)

    /** The GENERAL-merge rewrite term (r21, verdict #4): the same
      * synthetic store driven through the SQL MERGE general path
      * (conditional partial UPDATE — `WHEN MATCHED AND` forces
      * [[graft.plans]]' DailyStoreGeneralMergeCommand: touched-day
      * left-outer join + conditional projections + insert anti-join +
      * the unique-matched-key guard pass), vs [[mergeSec]]'s
      * keyed-replace anti-join. Same update keys/values, idempotent
      * across reps like the keyed curve.
      */
    def generalMergeSec(catalogTbl: String, nDays: Int, t: Int): Double = {
      updates(nDays, t).createOrReplaceTempView("msc_upd")
      Timing.medianSec(reps) { () =>
        spark.sql(
          s"""MERGE INTO $catalogTbl USING msc_upd
             |ON $catalogTbl.k = msc_upd.k
             |WHEN MATCHED AND msc_upd.v >= 0.0 THEN UPDATE SET v = msc_upd.v
             |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
        ()
      }
    }

    val (out, foreign) = Timing.withForeignCores {
      val curve = Seq(1, 4, 16, 64).map { t =>
        s""""t$t":${f"${mergeSec(small, 256, t, stable = false)}%.3f"}"""
      }.mkString(",")
      val grown = mergeSec(big, 1024, 16, stable = false)
      val smallStable = mergeSec(small, 256, 16, stable = true)
      val bigStable = mergeSec(big, 1024, 16, stable = true)
      graft.sources.DailyStoreCatalog.register(spark, "msc", base)
      val gcurve = Seq(1, 4, 16, 64).map { t =>
        s""""t$t":${f"${generalMergeSec("msc.days256", 256, t)}%.3f"}"""
      }.mkString(",")
      val ggrown = generalMergeSec("msc.days1024", 1024, 16)
      (curve, grown, smallStable, bigStable, gcurve, ggrown)
    }
    val (curve, grown, smallStable, bigStable, gcurve, ggrown) = out
    // scalastyle:off println
    println(
      s"""{"touched_day_curve_days256":{$curve},""" +
        f""""grown_4x_days1024_t16":$grown%.3f,""" +
        f""""stable_days256_t16":$smallStable%.3f,""" +
        f""""stable_days1024_t16":$bigStable%.3f,""" +
        s""""general_touched_day_curve_days256":{$gcurve},""" +
        f""""general_grown_4x_days1024_t16":$ggrown%.3f,""" +
        s""""rows_per_day":$rowsPerDay,"reps":$reps,""" +
        f""""foreign_cores":$foreign%.2f}""")
    // scalastyle:on println
    spark.stop()
  }
}
