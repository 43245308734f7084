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
}
