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

  test("SQL MERGE rejects a target holding same-key copies of a " +
    "matched key (keyed replace would collapse them, diverging from " +
    "MERGE's update-each-copy)") {
    val (tbl, path, _) = freshStore()
    seed(path)
    // a second copy of k=3 via an ordinary append
    Seq((d("2020-03-03"), 3, "c-copy")).toDF("d", "k", "v")
      .write.format("dailystore").option("path", path)
      .option("partitionCol", "d").mode("append").save()
    Seq((d("2020-03-02"), 3, "C9")).toDF("d", "k", "v")
      .createOrReplaceTempView("dml_dupt")
    val e = intercept[Exception] {
      spark.sql(
        s"""MERGE INTO $tbl USING dml_dupt ON $tbl.k = dml_dupt.k
           |WHEN MATCHED THEN UPDATE SET *
           |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    }
    assert(e.getMessage.contains("same-key copies"), e.getMessage)
    // failed BEFORE the commit: both copies intact
    assert(readBack(path).count(_._2 == 3) == 2)
  }

  test("keyed delete under the forced shuffle_hash regime matches the " +
    "broadcast regime's result") {
    val (tbl, path, _) = freshStore()
    seed(path)
    spark.conf.set(graft.sources.DailyStoreMerge.MaxBroadcastKeysConf, "1")
    try {
      Seq(3, 5).toDF("k").createOrReplaceTempView("dml_del_sh")
      spark.sql(
        s"""MERGE INTO $tbl USING dml_del_sh ON $tbl.k = dml_del_sh.k
           |WHEN MATCHED THEN DELETE""".stripMargin)
    } finally spark.conf.unset(
      graft.sources.DailyStoreMerge.MaxBroadcastKeysConf)
    assert(readBack(path) == Seq(
      (d("2020-03-01"), 1, "a"), (d("2020-03-01"), 2, "b"),
      (d("2020-03-02"), 4, "dd")))
  }

  test("whole-day DELETE against a digit-like STRING day store takes " +
    "the scan path (no metadata binding of a string into an inferred " +
    "int column)") {
    val (tbl, path, _) = freshStore()
    Seq(("20200301", 1, "a"), ("20200302", 2, "b"))
      .toDF("d", "k", "v")
      .write.format("dailystore").option("path", path)
      .option("partitionCol", "d").mode("append").save()
    // partition inference types d INTEGER for the catalog relation; the
    // r19 wholeDayMatches would bind UTF8String into an int predicate
    spark.sql(s"DELETE FROM $tbl WHERE d = 20200301")
    assert(!new java.io.File(path, "d=20200301").exists())
    assert(spark.read.format("dailystore").option("path", path)
      .load().count() == 1)
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
    // non-equality condition
    rejects(
      s"""MERGE INTO $tbl USING dml_shape ON $tbl.k >= dml_shape.k
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin,
      "merge condition")
    // two matched clauses
    rejects(
      s"""MERGE INTO $tbl USING dml_shape ON $tbl.k = dml_shape.k
         |WHEN MATCHED AND dml_shape.v = 'x' THEN DELETE
         |WHEN MATCHED THEN UPDATE SET v = dml_shape.v""".stripMargin,
      "at most one WHEN MATCHED")
    // nondeterministic clause condition
    rejects(
      s"""MERGE INTO $tbl USING dml_shape ON $tbl.k = dml_shape.k
         |WHEN MATCHED AND rand() < 0.5 THEN UPDATE SET v = 'x'""".stripMargin,
      "nondeterministic")
    // INSERT not covering every target column is unreachable through
    // INSERT * (the parser expands it), but a nondeterministic INSERT
    // assignment is rejected like any clause expression
    rejects(
      s"""MERGE INTO $tbl USING dml_shape ON $tbl.k = dml_shape.k
         |WHEN NOT MATCHED THEN INSERT (d, k, v)
         |VALUES (dml_shape.d, dml_shape.k, uuid())""".stripMargin,
      "nondeterministic")
  }

  test("a store EMPTIED by DML stays resolvable: every commit stamps " +
    "the schema meta sidecar, so delete-everything then UPDATE / " +
    "INSERT / MERGE works instead of UNABLE_TO_INFER_SCHEMA " +
    "(r20 review; the DmlPropertySpec intermittent wedge)") {
    val (tbl, path, _) = freshStore()
    seed(path)
    // empty the store through SQL — every day partition is removed
    spark.sql(s"DELETE FROM $tbl WHERE true")
    assert(!new java.io.File(path).listFiles()
      .exists(_.getName.startsWith("d=")))
    // statements against the emptied store resolve via the meta sidecar
    spark.sql(s"UPDATE $tbl SET v = 'x' WHERE k = 1") // matches nothing
    Seq((d("2020-03-07"), 7, "back")).toDF("d", "k", "v")
      .createOrReplaceTempView("dml_empty_src")
    spark.sql(
      s"""MERGE INTO $tbl USING dml_empty_src ON $tbl.k = dml_empty_src.k
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(readBack(path) == Seq((d("2020-03-07"), 7, "back")))
    // and the resolved column order is the historical inference order
    // (data columns first, partition column last) — a write-order meta
    // would flip positional INSERT INTO ... VALUES bindings
    spark.sql(s"INSERT INTO $tbl VALUES (8, 'ins', DATE'2020-03-08')")
    assert(readBack(path) == Seq(
      (d("2020-03-07"), 7, "back"), (d("2020-03-08"), 8, "ins")))
  }

  test("general MERGE: NOT MATCHED is decided by the ON key of the " +
    "SOURCE row, not by the INSERT-assigned key value (r20 review)") {
    val (tbl, path, _) = freshStore()
    seed(path) // keys 1..5
    // the INSERT assigns k = s.k + 1000:
    //  - s.k = 3 MATCHES target k=3 -> must NOT insert, even though its
    //    assigned key 1003 is absent from the store
    //  - s.k = 9 is unmatched -> must insert as k = 1009 — and to prove
    //    the classification does not run on the ASSIGNED key, a third
    //    source row s.k = 7 (unmatched) assigns to 1007; all inserts land
    Seq((d("2020-03-05"), 3, "NO"), (d("2020-03-05"), 9, "Y9"),
      (d("2020-03-05"), 7, "Y7"))
      .toDF("d", "k", "v").createOrReplaceTempView("dml_onkey")
    spark.sql(
      s"""MERGE INTO $tbl USING dml_onkey ON $tbl.k = dml_onkey.k
         |WHEN NOT MATCHED THEN INSERT (d, k, v)
         |VALUES (dml_onkey.d, dml_onkey.k + 1000, dml_onkey.v)""".stripMargin)
    assert(readBack(path) == Seq(
      (d("2020-03-01"), 1, "a"), (d("2020-03-01"), 2, "b"),
      (d("2020-03-02"), 3, "c"), (d("2020-03-02"), 4, "dd"),
      (d("2020-03-03"), 5, "e"),
      (d("2020-03-05"), 1007, "Y7"), (d("2020-03-05"), 1009, "Y9")))
  }

  test("general MERGE: insert-if-absent (WHEN NOT MATCHED THEN INSERT " +
    "* alone) appends only new keys and rewrites NO day — the " +
    "reference's incremental append (cv.py:110)") {
    val (tbl, path, _) = freshStore()
    seed(path)
    val before01 = dayFiles(path, "2020-03-01")
    val before02 = dayFiles(path, "2020-03-02")
    // k=3 exists (on 03-02) -> skipped even though the source carries a
    // new value; k=9 is new -> inserted into ITS day
    Seq((d("2020-03-05"), 3, "IGNORED"), (d("2020-03-04"), 9, "I"))
      .toDF("d", "k", "v").createOrReplaceTempView("dml_ifa")
    spark.sql(
      s"""MERGE INTO $tbl USING dml_ifa ON $tbl.k = dml_ifa.k
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(readBack(path) == Seq(
      (d("2020-03-01"), 1, "a"), (d("2020-03-01"), 2, "b"),
      (d("2020-03-02"), 3, "c"), (d("2020-03-02"), 4, "dd"),
      (d("2020-03-03"), 5, "e"), (d("2020-03-04"), 9, "I")))
    // append-only: even the day HOLDING the matched key kept its files
    assert(dayFiles(path, "2020-03-01") == before01)
    assert(dayFiles(path, "2020-03-02") == before02)
    // idempotent by construction: re-running inserts nothing
    spark.sql(
      s"""MERGE INTO $tbl USING dml_ifa ON $tbl.k = dml_ifa.k
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(readBack(path).size == 6)
  }

  test("general MERGE: conditional partial-column UPDATE updates EACH " +
    "matched copy (no keyed-replace collapse), skips condition-false " +
    "rows, leaves unassigned columns and untouched days alone") {
    val (tbl, path, _) = freshStore()
    seed(path)
    // a second copy of k=3 on 03-03 — SQL MERGE must update BOTH
    Seq((d("2020-03-03"), 3, "c-copy")).toDF("d", "k", "v")
      .write.format("dailystore").option("path", path)
      .option("partitionCol", "d").mode("append").save()
    val before01 = dayFiles(path, "2020-03-01")
    // k=3 passes the condition; k=4's source row fails it; k=999
    // matches nothing (and there is no insert clause)
    Seq((3, "C2", true), (4, "D2", false), (999, "Z", true))
      .toDF("k", "nv", "apply").createOrReplaceTempView("dml_cond")
    spark.sql(
      s"""MERGE INTO $tbl USING dml_cond ON $tbl.k = dml_cond.k
         |WHEN MATCHED AND dml_cond.apply THEN UPDATE SET v = dml_cond.nv
         |""".stripMargin)
    assert(readBack(path) == Seq(
      (d("2020-03-01"), 1, "a"), (d("2020-03-01"), 2, "b"),
      (d("2020-03-02"), 3, "C2"), (d("2020-03-02"), 4, "dd"),
      (d("2020-03-03"), 3, "C2"), (d("2020-03-03"), 5, "e")))
    assert(dayFiles(path, "2020-03-01") == before01)
  }

  test("general MERGE: conditional UPDATE + conditional INSERT in one " +
    "statement; NULL conditions are not-applied, not errors") {
    val (tbl, path, _) = freshStore()
    seed(path)
    // k=3 matched+condition-true -> updated; k=5 matched but condition
    // NULL -> kept; k=7 unmatched+condition-true -> inserted; k=8
    // unmatched but condition false -> dropped
    Seq((d("2020-03-02"), 3, "C2", Some(true)),
      (d("2020-03-03"), 5, "E2", None),
      (d("2020-03-06"), 7, "G", Some(true)),
      (d("2020-03-06"), 8, "H", Some(false)))
      .toDF("d", "k", "v", "apply").createOrReplaceTempView("dml_both")
    spark.sql(
      s"""MERGE INTO $tbl USING dml_both ON $tbl.k = dml_both.k
         |WHEN MATCHED AND dml_both.apply THEN UPDATE SET v = dml_both.v
         |WHEN NOT MATCHED AND dml_both.apply THEN INSERT (d, k, v)
         |VALUES (dml_both.d, dml_both.k, dml_both.v)""".stripMargin)
    assert(readBack(path) == Seq(
      (d("2020-03-01"), 1, "a"), (d("2020-03-01"), 2, "b"),
      (d("2020-03-02"), 3, "C2"), (d("2020-03-02"), 4, "dd"),
      (d("2020-03-03"), 5, "e"), (d("2020-03-06"), 7, "G")))
  }

  test("general MERGE: conditional DELETE removes only matched+true " +
    "rows; an emptied day's directory is removed") {
    val (tbl, path, _) = freshStore()
    seed(path)
    Seq((3, true), (4, false), (5, true))
      .toDF("k", "kill").createOrReplaceTempView("dml_cdel")
    spark.sql(
      s"""MERGE INTO $tbl USING dml_cdel ON $tbl.k = dml_cdel.k
         |WHEN MATCHED AND dml_cdel.kill THEN DELETE""".stripMargin)
    assert(readBack(path) == Seq(
      (d("2020-03-01"), 1, "a"), (d("2020-03-01"), 2, "b"),
      (d("2020-03-02"), 4, "dd")))
    assert(!new java.io.File(path, "d=2020-03-03").exists())
  }

  test("general MERGE source contract: duplicate and null source keys " +
    "are rejected before any commit") {
    val (tbl, path, _) = freshStore()
    seed(path)
    Seq((3, "x"), (3, "y")).toDF("k", "nv")
      .createOrReplaceTempView("dml_gdup")
    val e1 = intercept[Exception] {
      spark.sql(
        s"""MERGE INTO $tbl USING dml_gdup ON $tbl.k = dml_gdup.k
           |WHEN MATCHED AND dml_gdup.nv = 'x'
           |THEN UPDATE SET v = dml_gdup.nv""".stripMargin)
    }
    assert(e1.getMessage.contains("duplicate"), e1.getMessage)
    Seq((Some(3), "x"), (None, "y")).toDF("k", "nv")
      .createOrReplaceTempView("dml_gnull")
    val e2 = intercept[Exception] {
      spark.sql(
        s"""MERGE INTO $tbl USING dml_gnull ON $tbl.k = dml_gnull.k
           |WHEN MATCHED AND dml_gnull.nv = 'x'
           |THEN UPDATE SET v = dml_gnull.nv""".stripMargin)
    }
    assert(e2.getMessage.contains("null"), e2.getMessage)
    assert(readBack(path).size == 5, "nothing committed")
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
