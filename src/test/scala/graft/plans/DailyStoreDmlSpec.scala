package graft.plans

import java.sql.Date

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.DailyStoreCatalog

/** Pins for the SQL DML fronts ([[DailyStoreDml]]): MERGE/UPDATE/DELETE
  * on a catalog dailystore table rewrite into the copy-on-write
  * commits — semantics vs the in-memory model, untouched-day
  * byte-identity, day moves, emptied-day removal, and loud rejection
  * of unsupported MERGE shapes. Non-dailystore plans are untouched
  * (the whole suite running green under the injected rule is the
  * broader pin).
  */
class DailyStoreDmlSpec extends SparkSpec {
  import spark.implicits._

  private val seq = new java.util.concurrent.atomic.AtomicInteger(0)

  private def freshStore(): (String, String, String) = {
    val n = seq.incrementAndGet()
    val root = new java.io.File(sys.props("java.io.tmpdir"),
      s"dsdml_${n}_${System.nanoTime()}").getPath
    val tbl = s"t$n"
    new java.io.File(root, tbl).mkdirs()
    DailyStoreCatalog.register(spark, s"dml$n", root)
    (s"dml$n.$tbl", s"$root/$tbl", root)
  }

  private def d(s: String): Date = Date.valueOf(s)

  private def seed(path: String): Unit =
    Seq((d("2020-03-01"), 1, "a"), (d("2020-03-01"), 2, "b"),
      (d("2020-03-02"), 3, "c"), (d("2020-03-02"), 4, "dd"),
      (d("2020-03-03"), 5, "e"))
      .toDF("d", "k", "v").repartition(2)
      .write.format("dailystore").option("path", path)
      .option("partitionCol", "d").mode("append").save()

  private def readBack(path: String): Seq[(Date, Int, String)] =
    spark.read.parquet(path).select("d", "k", "v").orderBy("d", "k")
      .as[(Date, Int, String)].collect().toSeq

  private def dayFiles(path: String, day: String): Map[String, Long] = {
    val dd = new java.io.File(path, s"d=$day")
    if (!dd.exists()) Map.empty
    else dd.listFiles().filter(_.getName.endsWith(".parquet"))
      .map(f => f.getName -> f.lastModified()).toMap
  }

  test("MERGE INTO (keyed replace): update in place, day move, insert; " +
    "untouched day not rewritten; duplicate source keys rejected") {
    val (tbl, path, _) = freshStore()
    seed(path)
    val before = dayFiles(path, "2020-03-01")
    Seq((d("2020-03-02"), 3, "C2"), (d("2020-03-02"), 5, "E2"),
      (d("2020-03-04"), 9, "I"))
      .toDF("d", "k", "v").createOrReplaceTempView("dml_src")
    spark.sql(
      s"""MERGE INTO $tbl USING dml_src
         |ON $tbl.k = dml_src.k
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(readBack(path) == Seq(
      (d("2020-03-01"), 1, "a"), (d("2020-03-01"), 2, "b"),
      (d("2020-03-02"), 3, "C2"), (d("2020-03-02"), 4, "dd"),
      (d("2020-03-02"), 5, "E2"), (d("2020-03-04"), 9, "I")))
    assert(dayFiles(path, "2020-03-01") == before,
      "untouched day must not be rewritten")
    assert(!new java.io.File(path, "d=2020-03-03").exists(),
      "day emptied by the key move must be removed")
    // duplicate source keys violate the cardinality rule -> loud
    Seq((d("2020-03-02"), 3, "x"), (d("2020-03-03"), 3, "y"))
      .toDF("d", "k", "v").createOrReplaceTempView("dml_dup")
    val e = intercept[Exception] {
      spark.sql(
        s"""MERGE INTO $tbl USING dml_dup ON $tbl.k = dml_dup.k
           |WHEN MATCHED THEN UPDATE SET *
           |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    }
    assert(e.getMessage.contains("duplicate"), e.getMessage)
  }

  test("UPDATE: affected days rewrite with IF(cond, v, col); a " +
    "partition-column assignment moves rows; untouched day intact") {
    val (tbl, path, _) = freshStore()
    seed(path)
    val before = dayFiles(path, "2020-03-01")
    spark.sql(s"UPDATE $tbl SET v = 'C2' WHERE k = 3")
    assert(readBack(path).contains((d("2020-03-02"), 3, "C2")))
    assert(readBack(path).contains((d("2020-03-02"), 4, "dd")),
      "bystander row of the rewritten day survives")
    assert(dayFiles(path, "2020-03-01") == before)
    // day move via SET d: row leaves 03-03 (dir removed), lands in 03-04
    spark.sql(
      s"UPDATE $tbl SET d = DATE'2020-03-04' WHERE k = 5")
    assert(readBack(path).contains((d("2020-03-04"), 5, "e")))
    assert(!new java.io.File(path, "d=2020-03-03").exists())
    // no-match UPDATE is a no-op
    val pre = readBack(path)
    spark.sql(s"UPDATE $tbl SET v = 'zz' WHERE k = 999")
    assert(readBack(path) == pre)
  }

  test("DELETE: matched rows leave their days; a fully-deleted day's " +
    "directory is removed; untouched day intact; WHERE prunes") {
    val (tbl, path, _) = freshStore()
    seed(path)
    val before = dayFiles(path, "2020-03-01")
    spark.sql(s"DELETE FROM $tbl WHERE k = 3")
    assert(readBack(path) == Seq(
      (d("2020-03-01"), 1, "a"), (d("2020-03-01"), 2, "b"),
      (d("2020-03-02"), 4, "dd"), (d("2020-03-03"), 5, "e")))
    assert(dayFiles(path, "2020-03-01") == before)
    // whole-day delete removes the directory
    spark.sql(s"DELETE FROM $tbl WHERE d = DATE'2020-03-03'")
    assert(!new java.io.File(path, "d=2020-03-03").exists())
    assert(readBack(path).size == 3)
  }

  test("whole-day DELETE is metadata-only: it succeeds even when the " +
    "condemned day's data file is unreadable (no scan), and still " +
    "commits through the manifest") {
    val (tbl, path, _) = freshStore()
    seed(path)
    // corrupt the 03-03 data file: any plan READING the day would fail
    val dayDir = new java.io.File(path, "d=2020-03-03")
    dayDir.listFiles().filter(_.getName.endsWith(".parquet")).foreach { f =>
      java.nio.file.Files.write(f.toPath, "corrupt".getBytes("UTF-8"))
    }
    spark.sql(s"DELETE FROM $tbl WHERE d = DATE'2020-03-03'")
    assert(!dayDir.exists(), "condemned day removed without a read")
    assert(readBack(path).size == 4)
    // range predicates over the partition column take the same path
    spark.sql(s"DELETE FROM $tbl WHERE d < DATE'2020-03-02'")
    assert(!new java.io.File(path, "d=2020-03-01").exists())
    assert(readBack(path) == Seq(
      (d("2020-03-02"), 3, "c"), (d("2020-03-02"), 4, "dd")))
  }

  test("SQL INSERT INTO appends; INSERT OVERWRITE truncates (DSv2 " +
    "catalog contract); positional VALUES follow the catalog schema " +
    "order (data columns first, partition column last)") {
    val (tbl, path, _) = freshStore()
    seed(path)
    spark.sql(
      s"INSERT INTO $tbl VALUES (7, 'g', CAST('2020-03-05' AS DATE))")
    assert(readBack(path).contains((d("2020-03-05"), 7, "g")))
    assert(readBack(path).size == 6)
    spark.sql(
      s"INSERT OVERWRITE $tbl VALUES (8, 'h', CAST('2020-03-06' AS DATE))")
    assert(readBack(path) == Seq((d("2020-03-06"), 8, "h")))
  }

  test("MERGE WHEN MATCHED THEN DELETE (keyed delete): matched keys " +
    "leave their days, unmatched source keys are ignored, emptied " +
    "day removed, untouched day intact") {
    val (tbl, path, _) = freshStore()
    seed(path)
    val before = dayFiles(path, "2020-03-01")
    // k=3 deletes from 03-02 (bystander k=4 stays); k=5 empties 03-03;
    // k=999 matches nothing
    Seq(3, 5, 999).toDF("k").createOrReplaceTempView("dml_del")
    spark.sql(
      s"""MERGE INTO $tbl USING dml_del ON $tbl.k = dml_del.k
         |WHEN MATCHED THEN DELETE""".stripMargin)
    assert(readBack(path) == Seq(
      (d("2020-03-01"), 1, "a"), (d("2020-03-01"), 2, "b"),
      (d("2020-03-02"), 4, "dd")))
    assert(dayFiles(path, "2020-03-01") == before)
    assert(!new java.io.File(path, "d=2020-03-03").exists())
  }

  test("keyed delete ON the partition column degenerates to a day-list " +
    "delete; merge into a store whose days were ALL deleted re-seeds it") {
    val (tbl, path, _) = freshStore()
    seed(path)
    Seq(d("2020-03-01"), d("2020-03-03")).toDF("d")
      .createOrReplaceTempView("dml_days")
    spark.sql(
      s"""MERGE INTO $tbl USING dml_days ON $tbl.d = dml_days.d
         |WHEN MATCHED THEN DELETE""".stripMargin)
    assert(readBack(path).map(_._2) == Seq(3, 4))
    // empty the store entirely, then merge into the day-less store
    spark.sql(s"DELETE FROM $tbl WHERE true")
    assert(!new java.io.File(path).listFiles()
      .exists(_.getName.startsWith("d=")),
      "every day directory removed (metadata-only full delete)")
    graft.sources.DailyStoreMerge.mergeByKey(spark, path,
      Seq((d("2020-03-09"), 11, "z")).toDF("d", "k", "v"), key = "k")
    assert(readBack(path) == Seq((d("2020-03-09"), 11, "z")))
  }

  test("DELETE keeps rows whose condition evaluates to NULL (SQL " +
    "deletes only WHERE-true rows)") {
    val (tbl, path, _) = freshStore()
    Seq((d("2020-03-01"), 1, Some("x")), (d("2020-03-01"), 2, None),
      (d("2020-03-02"), 3, Some("y")))
      .toDF("d", "k", "v").repartition(2)
      .write.format("dailystore").option("path", path)
      .option("partitionCol", "d").mode("append").save()
    // k=1 matches; k=2's v is NULL so `v = 'x'` is NULL, not TRUE —
    // the row must SURVIVE the affected-day rewrite
    spark.sql(s"DELETE FROM $tbl WHERE v = 'x'")
    val got = spark.read.parquet(path).select("d", "k", "v")
      .orderBy("k").as[(Date, Int, Option[String])].collect().toSeq
    assert(got == Seq(
      (d("2020-03-01"), 2, None), (d("2020-03-02"), 3, Some("y"))))
  }

  test("nondeterministic DELETE/UPDATE conditions are rejected at " +
    "analysis") {
    val (tbl, path, _) = freshStore()
    seed(path)
    val e1 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql(s"DELETE FROM $tbl WHERE rand() < 0.5")
    }
    assert(e1.getMessage.contains("nondeterministic"), e1.getMessage)
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql(s"UPDATE $tbl SET v = 'x' WHERE rand() < 0.5")
    }
    assert(e2.getMessage.contains("nondeterministic"), e2.getMessage)
  }

  test("unsupported MERGE shapes fail loudly with the supported shape " +
    "in the message") {
    val (tbl, path, _) = freshStore()
    seed(path)
    Seq((d("2020-03-02"), 3, "x"))
      .toDF("d", "k", "v").createOrReplaceTempView("dml_shape")
    def rejects(sql: String, frag: String): Unit = {
      val e = intercept[org.apache.spark.sql.AnalysisException] {
        spark.sql(sql)
      }
      assert(e.getMessage.contains("dailystore SQL DML"), e.getMessage)
      assert(e.getMessage.contains(frag), e.getMessage)
    }
    // extra matched clause condition
    rejects(
      s"""MERGE INTO $tbl USING dml_shape ON $tbl.k = dml_shape.k
         |WHEN MATCHED AND dml_shape.v = 'x' THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin,
      "matched actions")
    // DELETE action
    rejects(
      s"""MERGE INTO $tbl USING dml_shape ON $tbl.k = dml_shape.k
         |WHEN MATCHED THEN DELETE
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin,
      "matched actions")
    // non-equality condition
    rejects(
      s"""MERGE INTO $tbl USING dml_shape ON $tbl.k >= dml_shape.k
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin,
      "merge condition")
    // diverging assignments (UPDATE SET one column only)
    rejects(
      s"""MERGE INTO $tbl USING dml_shape ON $tbl.k = dml_shape.k
         |WHEN MATCHED THEN UPDATE SET v = 'fixed'
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin,
      "identically")
  }

  test("DML under retention: a MERGE is a versioned commit — " +
    "readVersion(1) reconstructs the pre-merge state") {
    val (tbl, path, _) = freshStore()
    graft.sources.DailyStoreTimeTravel.enable(spark, path, keep = 3)
    seed(path)
    val pre = readBack(path)
    Seq((d("2020-03-02"), 3, "C2"))
      .toDF("d", "k", "v").createOrReplaceTempView("dml_tt")
    spark.sql(
      s"""MERGE INTO $tbl USING dml_tt ON $tbl.k = dml_tt.k
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(readBack(path) != pre)
    val rolled = graft.sources.DailyStoreTimeTravel
      .readVersion(spark, path, 1)
      .select("d", "k", "v").orderBy("d", "k")
      .as[(Date, Int, String)].collect().toSeq
    assert(rolled == pre)
  }
}
