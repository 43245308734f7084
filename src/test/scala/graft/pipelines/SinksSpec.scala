package graft.pipelines

import java.nio.file.Files

import graft.SparkSpec

class SinksSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft-sink").resolve("t.parquet").toString

  test("S9 truncateAndReload replaces all rows") {
    val path = tmp()
    Seq(1, 2, 3).toDF("k").write.parquet(path)
    Sinks.truncateAndReload(Seq(9).toDF("k"), path)
    assert(spark.read.parquet(path).as[Int].collect().toSeq == Seq(9))
  }

  test("S7 appendIncremental: only rows above the high watermark; idempotent") {
    val path = tmp()
    val first = Sinks.appendIncremental(spark, Seq(1, 2, 3).toDF("k"), path, "k")
    assert(first == 3)
    val second = Sinks.appendIncremental(spark, Seq(2, 3, 4, 5).toDF("k"), path, "k")
    assert(second == 2) // only 4, 5
    val third = Sinks.appendIncremental(spark, Seq(2, 3, 4, 5).toDF("k"), path, "k")
    assert(third == 0) // re-run adds nothing
    assert(spark.read.parquet(path).as[Int].collect().sorted.toSeq == Seq(1, 2, 3, 4, 5))
  }

  test("S8 upsertByKey: same-key rows replaced, others kept (cv.py:126-132)") {
    val path = tmp()
    Seq((1, "Under Investigation"), (2, "No"), (3, "Under Investigation"))
      .toDF("case_number", "travel").write.parquet(path)
    Sinks.upsertByKey(spark,
      Seq((1, "Yes"), (3, "No")).toDF("case_number", "travel"),
      path, "case_number")
    val got = spark.read.parquet(path).as[(Int, String)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1, "Yes"), (2, "No"), (3, "No")))
  }

  test("reloadPartitioned: date predicate prunes partitions at the scan") {
    val path = tmp()
    val df = Seq(("2020-03-01", 1), ("2020-03-02", 2), ("2020-03-03", 3))
      .toDF("d", "v")
    Sinks.reloadPartitioned(df, path, "d")
    val read = spark.read.parquet(path).filter("d = '2020-03-02'")
    val plan = read.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(d"))
    assert(read.select("v").as[Int].collect().toSeq == Seq(2))
  }

  test("S8 upsertByKey on a fresh path just writes") {
    val path = tmp()
    Sinks.upsertByKey(spark, Seq((1, "Yes")).toDF("case_number", "travel"),
      path, "case_number")
    assert(spark.read.parquet(path).count() == 1)
  }

  private def listRoot(path: String): Set[String] =
    new java.io.File(path).listFiles().map(_.getName).toSet

  test("upsertByKey does NOT adopt a plain day-partitioned dir by " +
    "default: the swap path runs and no dailystore metadata is planted") {
    val path = tmp()
    Seq(("mar01", 1, "a"), ("mar02", 2, "b"))
      .toDF("d", "k", "v").write.partitionBy("d").parquet(path)
    Sinks.upsertByKey(spark,
      Seq(("mar02", 2, "B2"), ("mar03", 3, "c"))
        .toDF("d", "k", "v"), path, "k")
    assert(spark.read.parquet(path).select("d", "k", "v").orderBy("k")
      .as[(String, Int, String)].collect().toSeq ==
      Seq(("mar01", 1, "a"), ("mar02", 2, "B2"), ("mar03", 3, "c")))
    // no manifests, lease, or sidecar were injected into a dir the
    // connector never wrote (the r19 silent-adoption complaint)
    assert(!listRoot(path).exists(n =>
      n.startsWith("_last_commit") || n.startsWith("_commit-") ||
        n.startsWith("_writer")))
  }

  test("adoptDayPartitioned = true adopts a plain day-partitioned dir: " +
    "merge path (untouched day files untouched), plain reads " +
    "round-trip identically, and time travel starts at the adoption") {
    val path = tmp()
    Seq(("mar01", 1, "a"), ("mar02", 2, "b"))
      .toDF("d", "k", "v").write.partitionBy("d").parquet(path)
    val preAdoption = spark.read.parquet(path).select("d", "k", "v")
      .orderBy("k").as[(String, Int, String)].collect().toSeq
    val day1Files = new java.io.File(path, "d=mar01")
      .listFiles().filter(_.getName.endsWith(".parquet"))
      .map(f => f.getName -> f.length()).toMap
    Sinks.upsertByKey(spark,
      Seq(("mar02", 2, "B2")).toDF("d", "k", "v"), path, "k",
      adoptDayPartitioned = true)
    // merge path taken: mar01's files are byte-for-byte the same names
    assert(new java.io.File(path, "d=mar01")
      .listFiles().filter(_.getName.endsWith(".parquet"))
      .map(f => f.getName -> f.length()).toMap == day1Files)
    // plain parquet readers see the merged contents, nothing else
    assert(spark.read.parquet(path).select("d", "k", "v").orderBy("k")
      .as[(String, Int, String)].collect().toSeq ==
      preAdoption.map { case (dd, k, v) =>
        if (k == 2) (dd, k, "B2") else (dd, k, v) })
    // adoption planted the sidecar: subsequent upserts route WITHOUT
    // the flag (provenance), and version-0-back reads the live state
    Sinks.upsertByKey(spark,
      Seq(("mar03", 3, "c")).toDF("d", "k", "v"), path, "k")
    assert(spark.read.parquet(path).count() == 3)
    val head = graft.sources.DailyStoreTimeTravel
      .readVersion(spark, path, 0, pcol = "d")
    assert(head.count() == 3)
  }

  test("adoption refuses a dir whose day values are URI-escaped: falls " +
    "back to the swap loudly, plants nothing") {
    val path = tmp()
    Seq(("a:b", 1, "x"), ("c", 2, "y")).toDF("d", "k", "v")
      .write.partitionBy("d").parquet(path)
    assert(new java.io.File(path, "d=a%3Ab").exists())
    Sinks.upsertByKey(spark,
      Seq(("c", 2, "Y2")).toDF("d", "k", "v"), path, "k",
      adoptDayPartitioned = true)
    assert(spark.read.parquet(path).select("d", "k", "v").orderBy("k")
      .as[(String, Int, String)].collect().toSeq ==
      Seq(("a:b", 1, "x"), ("c", 2, "Y2")))
    assert(!listRoot(path).exists(_.startsWith("_last_commit")))
  }
}
