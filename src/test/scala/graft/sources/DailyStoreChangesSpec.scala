package graft.sources

import java.sql.Date

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Change-data reads ([[DailyStoreChanges]], r20): `changedDays` is
  * exact manifest metadata, `readChanges` is the NET row delta over
  * only the changed days, with keyed update classification (including
  * day moves) and the time-travel fronts' loud validation errors.
  */
class DailyStoreChangesSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(tag: String): String =
    new java.io.File(sys.props("java.io.tmpdir"),
      s"dsch_${tag}_${System.nanoTime()}").getPath

  private def d(s: String): Date = Date.valueOf(s)

  private def days(rows: (String, Int, String)*) =
    rows.toSeq.map { case (dt, k, s) => (d(dt), k, s) }
      .toDF("d", "k", "label")

  private def write(df: org.apache.spark.sql.DataFrame, dir: String,
                    mode: String = "append",
                    dynamic: Boolean = false): Unit = {
    val w = df.write.format("dailystore").option("path", dir).mode(mode)
    (if (dynamic) w.option("partitionOverwriteMode", "dynamic") else w).save()
  }

  private def changes(dir: String, from: Long, to: Long,
                      key: Option[String] = None): Seq[(Date, Int, String, String)] =
    DailyStoreChanges.readChanges(spark, dir, from, to, key = key)
      .select("d", "k", "label", DailyStoreChanges.ChangeTypeCol)
      .as[(Date, Int, String, String)].collect().toSeq
      .sortBy(r => (r._1.toString, r._2, r._4))

  test("changedDays: exact day set per commit range from manifests; " +
      "readChanges: net delta with multiset and keyed classification") {
    val dir = freshDir("basic")
    DailyStoreTimeTravel.enable(spark, dir, keep = 10)
    // v1: three days
    write(days(("2020-03-01", 1, "a"), ("2020-03-01", 2, "b"),
      ("2020-03-02", 3, "c"), ("2020-03-03", 4, "e")), dir)
    // v2: day-replace day 1 — k=1 updated, k=2 dropped, k=7 inserted
    write(days(("2020-03-01", 1, "a2"), ("2020-03-01", 7, "new")),
      dir, "overwrite", dynamic = true)
    // v3: append a new day
    write(days(("2020-03-04", 8, "f")), dir)

    assert(DailyStoreChanges.changedDays(spark, dir, 1, 2) ==
      Seq("2020-03-01"))
    assert(DailyStoreChanges.changedDays(spark, dir, 2, 3) ==
      Seq("2020-03-04"))
    assert(DailyStoreChanges.changedDays(spark, dir, 1, 3) ==
      Seq("2020-03-01", "2020-03-04"))
    assert(DailyStoreChanges.changedDays(spark, dir, 3, 3) == Nil)

    // multiset delta v1 -> v2: day 1 only
    assert(changes(dir, 1, 2) == Seq(
      (d("2020-03-01"), 1, "a", "delete"),
      (d("2020-03-01"), 1, "a2", "insert"),
      (d("2020-03-01"), 2, "b", "delete"),
      (d("2020-03-01"), 7, "new", "insert")))
    // keyed: k=1 reclassifies as an update pair ("update_postimage"
    // sorts before "update_preimage")
    assert(changes(dir, 1, 2, key = Some("k")) == Seq(
      (d("2020-03-01"), 1, "a2", "update_postimage"),
      (d("2020-03-01"), 1, "a", "update_preimage"),
      (d("2020-03-01"), 2, "b", "delete"),
      (d("2020-03-01"), 7, "new", "insert")))
    // spanning range composes the NET delta; day 2/3 never appear
    assert(changes(dir, 1, 3, key = Some("k")) == Seq(
      (d("2020-03-01"), 1, "a2", "update_postimage"),
      (d("2020-03-01"), 1, "a", "update_preimage"),
      (d("2020-03-01"), 2, "b", "delete"),
      (d("2020-03-01"), 7, "new", "insert"),
      (d("2020-03-04"), 8, "f", "insert")))
    // identical endpoints: empty, schema intact (the store's natural
    // read order — partition column last — plus the change column)
    val empty = DailyStoreChanges.readChanges(spark, dir, 2, 2)
    assert(empty.columns.toSeq.sorted ==
      Seq(DailyStoreChanges.ChangeTypeCol, "d", "k", "label"))
    assert(empty.columns.last == DailyStoreChanges.ChangeTypeCol)
    assert(empty.count() == 0)
  }

  test("a day MOVE classifies as an update pair across days; a day " +
      "rewritten to identical content contributes nothing (net " +
      "semantics)") {
    val dir = freshDir("move")
    DailyStoreTimeTravel.enable(spark, dir, keep = 10)
    write(days(("2020-03-01", 1, "x"), ("2020-03-02", 2, "y")), dir)
    // v2: merge moves k=1 to day 5 (both days rewritten)
    DailyStoreMerge.mergeByKey(spark, dir,
      days(("2020-03-05", 1, "x")), key = "k", pcol = "d")
    assert(DailyStoreChanges.changedDays(spark, dir, 1, 2) ==
      Seq("2020-03-01", "2020-03-05"))
    assert(changes(dir, 1, 2, key = Some("k")) == Seq(
      (d("2020-03-01"), 1, "x", "update_preimage"),
      (d("2020-03-05"), 1, "x", "update_postimage")))
    // v3: day-replace day 2 with IDENTICAL content — the day is in the
    // manifests (a physical rewrite)...
    write(days(("2020-03-02", 2, "y")), dir, "overwrite", dynamic = true)
    assert(DailyStoreChanges.changedDays(spark, dir, 2, 3) ==
      Seq("2020-03-02"))
    // ...but the NET row delta is empty
    assert(changes(dir, 2, 3) == Nil)
  }

  test("reader-option front: format(\"dailystore\").option(\"changesFrom\"...) " +
      "equals the Scala API, changesTo defaults to the newest commit, " +
      "column pruning applies after the diff") {
    val dir = freshDir("reader")
    DailyStoreTimeTravel.enable(spark, dir, keep = 10)
    write(days(("2020-03-01", 1, "a"), ("2020-03-02", 2, "b")), dir)
    write(days(("2020-03-01", 1, "a2")), dir, "overwrite", dynamic = true)
    write(days(("2020-03-03", 3, "c")), dir)
    def viaReader(extra: (String, String)*): org.apache.spark.sql.DataFrame = {
      var r = spark.read.format("dailystore")
        .option("path", dir).option("changesFrom", "1")
      extra.foreach { case (k, v) => r = r.option(k, v) }
      r.load()
    }
    // explicit range + key == the Scala API row-for-row
    val api = DailyStoreChanges
      .readChanges(spark, dir, 1, 3, key = Some("k"))
      .select("d", "k", "label", DailyStoreChanges.ChangeTypeCol)
      .as[(Date, Int, String, String)].collect().toSeq.sorted
    val rdr = viaReader("changesTo" -> "3", "changesKey" -> "k")
      .select("d", "k", "label", DailyStoreChanges.ChangeTypeCol)
      .as[(Date, Int, String, String)].collect().toSeq.sorted
    assert(rdr == api && api.nonEmpty)
    // omitted changesTo resolves to the newest commit (3)
    val latest = viaReader("changesKey" -> "k")
      .select("d", "k", "label", DailyStoreChanges.ChangeTypeCol)
      .as[(Date, Int, String, String)].collect().toSeq.sorted
    assert(latest == api)
    // column pruning: a narrow select serves just those columns
    val narrow = viaReader("changesTo" -> "2")
      .select("k", DailyStoreChanges.ChangeTypeCol)
      .as[(Int, String)].collect().toSeq.sorted
    assert(narrow == Seq((1, "delete"), (1, "insert")))
  }

  test("consumeChanges: bootstrap snapshot, incremental deltas, crash " +
      "re-delivery (cursor advances only after the handler), " +
      "independent named consumers") {
    val dir = freshDir("consume")
    DailyStoreTimeTravel.enable(spark, dir, keep = 10)
    write(days(("2020-03-01", 1, "a"), ("2020-03-02", 2, "b")), dir)
    var got: Seq[(Date, Int, String, String)] = Nil
    def collectDelta(df: org.apache.spark.sql.DataFrame): Unit =
      got = df.select("d", "k", "label", DailyStoreChanges.ChangeTypeCol)
        .as[(Date, Int, String, String)].collect().toSeq
        .sortBy(r => (r._1.toString, r._2, r._4))

    // bootstrap: full current state, all-insert, range (0, head]
    assert(DailyStoreConsumer.consumeChanges(spark, dir, "sink")(collectDelta)
      .contains((0L, 1L)))
    assert(got == Seq(
      (d("2020-03-01"), 1, "a", "insert"), (d("2020-03-02"), 2, "b", "insert")))
    // nothing new: handler not called
    got = Nil
    assert(DailyStoreConsumer.consumeChanges(spark, dir, "sink")(collectDelta)
      .isEmpty)
    assert(got == Nil)
    // two commits land; one step consumes the combined delta
    write(days(("2020-03-01", 1, "a2")), dir, "overwrite", dynamic = true)
    write(days(("2020-03-03", 3, "c")), dir)
    assert(DailyStoreConsumer.consumeChanges(spark, dir, "sink",
      key = Some("k"))(collectDelta).contains((1L, 3L)))
    assert(got == Seq(
      (d("2020-03-01"), 1, "a2", "update_postimage"),
      (d("2020-03-01"), 1, "a", "update_preimage"),
      (d("2020-03-03"), 3, "c", "insert")))
    // crash inside the handler: cursor must NOT advance — the same
    // delta re-delivers on the next call
    write(days(("2020-03-04", 4, "e")), dir)
    intercept[RuntimeException] {
      DailyStoreConsumer.consumeChanges(spark, dir, "sink") { _ =>
        throw new RuntimeException("downstream died")
      }
    }
    assert(DailyStoreConsumer.cursor(spark, dir, "sink").contains(3L))
    assert(DailyStoreConsumer.consumeChanges(spark, dir, "sink")(collectDelta)
      .contains((3L, 4L)))
    assert(got == Seq((d("2020-03-04"), 4, "e", "insert")))
    // a second named consumer is independent: bootstraps from scratch
    got = Nil
    assert(DailyStoreConsumer.consumeChanges(spark, dir, "other")(collectDelta)
      .contains((0L, 4L)))
    assert(got.map(_._2).sorted == Seq(1, 2, 3, 4))
    assert(got.forall(_._4 == "insert"))
  }

  test("consumeChanges bootstraps on an EMPTIED-but-committed store: " +
      "empty all-insert snapshot, cursor set, later commits consume " +
      "normally (r20 review)") {
    val dir = freshDir("emptied")
    DailyStoreTimeTravel.enable(spark, dir, keep = 10)
    write(days(("2020-03-01", 1, "a")), dir)
    // truncate-to-empty: static overwrite with zero rows removes the day
    spark.sql(s"DELETE FROM ${registerTbl(dir)} WHERE true")
    var n = -1L
    assert(DailyStoreConsumer.consumeChanges(spark, dir, "boot") { df =>
      n = df.count()
    }.contains((0L, 2L)))
    assert(n == 0L, "the emptied store's bootstrap snapshot is empty")
    // a later commit consumes as an ordinary delta
    write(days(("2020-03-05", 7, "x")), dir)
    var got: Seq[(Date, Int, String, String)] = Nil
    assert(DailyStoreConsumer.consumeChanges(spark, dir, "boot") { df =>
      got = df.select("d", "k", "label", DailyStoreChanges.ChangeTypeCol)
        .as[(Date, Int, String, String)].collect().toSeq
    }.contains((2L, 3L)))
    assert(got == Seq((d("2020-03-05"), 7, "x", "insert")))
  }

  private val regSeq = new java.util.concurrent.atomic.AtomicInteger(0)
  private def registerTbl(dir: String): String = {
    val f = new java.io.File(dir)
    val n = regSeq.incrementAndGet()
    DailyStoreCatalog.register(spark, s"dsch_cat$n", f.getParent)
    s"dsch_cat$n.`${f.getName}`"
  }

  test("validation is the time-travel fronts': future seq, pre-history " +
      "after vacuum, reversed range, unknown key, _change_type " +
      "collision — all loud") {
    val dir = freshDir("errs")
    DailyStoreTimeTravel.enable(spark, dir, keep = 2)
    write(days(("2020-03-01", 1, "a")), dir)
    write(days(("2020-03-02", 2, "b")), dir)
    write(days(("2020-03-03", 3, "c")), dir)

    val fut = intercept[IllegalArgumentException] {
      DailyStoreChanges.changedDays(spark, dir, 1, 9)
    }
    assert(fut.getMessage.contains("future"), fut.getMessage)
    // keep=2 pruned v1's manifest: version 1 is still the oldest
    // reconstructable STATE (maxSeq - retained = 1), version 0 is not
    val pre = intercept[IllegalArgumentException] {
      DailyStoreChanges.changedDays(spark, dir, 0, 3)
    }
    assert(pre.getMessage.contains("predates"), pre.getMessage)
    val rev = intercept[IllegalArgumentException] {
      DailyStoreChanges.changedDays(spark, dir, 3, 2)
    }
    assert(rev.getMessage.contains(">="), rev.getMessage)
    val badKey = intercept[IllegalArgumentException] {
      DailyStoreChanges.readChanges(spark, dir, 2, 3, key = Some("nope"))
    }
    assert(badKey.getMessage.contains("nope"), badKey.getMessage)
  }

  test("the diff reads ONLY the changed days: untouched days' data " +
      "files made UNREADABLE, the diff still computes (the DmlSpec " +
      "no-scan proof idiom)") {
    val dir = freshDir("prune")
    DailyStoreTimeTravel.enable(spark, dir, keep = 10)
    write(days(("2020-03-01", 1, "a"), ("2020-03-02", 2, "b"),
      ("2020-03-03", 3, "c")), dir)
    write(days(("2020-03-02", 2, "B")), dir, "overwrite", dynamic = true)
    // clobber every parquet byte of an UNTOUCHED day — any scan that
    // reaches it now throws, so success IS the pruning proof. (Only the
    // LAST-sorting day: schema inference reads the footer of the first
    // listed file, which must stay readable.)
    locally {
      val dd = new java.io.File(dir, "d=2020-03-03")
      dd.listFiles().filter(_.getName.endsWith(".parquet")).foreach { f =>
        java.nio.file.Files.write(f.toPath, "not parquet".getBytes)
      }
    }
    assert(changes(dir, 1, 2) == Seq(
      (d("2020-03-02"), 2, "b", "delete"),
      (d("2020-03-02"), 2, "B", "insert")))
  }

  test("a store column in the reserved _graft_ namespace is rejected " +
      "loudly (r21, from the r20 ADVICE: silent withColumn replacement " +
      "would corrupt the diff's multiplicities)") {
    val dir = freshDir("graftcol")
    DailyStoreTimeTravel.enable(spark, dir, keep = 10)
    Seq((d("2020-03-01"), 1, 9L)).toDF("d", "k", "_graft_side")
      .write.format("dailystore").option("path", dir).mode("append").save()
    Seq((d("2020-03-02"), 2, 9L)).toDF("d", "k", "_graft_side")
      .write.format("dailystore").option("path", dir).mode("append").save()
    val ex = intercept[IllegalArgumentException] {
      DailyStoreChanges.readChanges(spark, dir, 1, 2)
    }
    assert(ex.getMessage.contains("_graft_side"), ex.getMessage)
  }

  test("null-keyed rows on both sides classify as an update pair — " +
      "consistent with the aggregate's null-equality (r21, from the " +
      "r20 ADVICE: the plain using-join never matched nulls)") {
    val dir = freshDir("nullkey")
    DailyStoreTimeTravel.enable(spark, dir, keep = 10)
    def nrows(rs: (String, Option[Int], String)*) =
      rs.toSeq.map { case (dt, k, s) => (d(dt), k, s) }
        .toDF("d", "k", "label")
    write(nrows(("2020-03-01", None, "a"), ("2020-03-01", Some(1), "b")), dir)
    write(nrows(("2020-03-01", None, "a2"), ("2020-03-01", Some(1), "b")),
      dir, "overwrite", dynamic = true)
    val got = DailyStoreChanges.readChanges(spark, dir, 1, 2,
        key = Some("k"))
      .select("d", "k", "label", DailyStoreChanges.ChangeTypeCol)
      .as[(Date, Option[Int], String, String)].collect().toSeq
      .sortBy(r => (r._3, r._4))
    assert(got == Seq(
      (d("2020-03-01"), None, "a", "update_preimage"),
      (d("2020-03-01"), None, "a2", "update_postimage")))
  }

  test("multiplicity restoration is chunk-bounded: a net far above the " +
      "per-row chunk cap expands to exactly net rows (r21, from the " +
      "r20 ADVICE: one sequence array per net row was an OOM risk)") {
    val dir = freshDir("chunk")
    DailyStoreTimeTravel.enable(spark, dir, keep = 10)
    write(days(("2020-03-01", 1, "seed")), dir)
    // 70_001 IDENTICAL rows in one appended day: the net aggregate
    // collapses them to ONE row with _graft_net = 70_001 > the 65_536
    // chunk cap, so restoration must span two chunks
    val n = 70001
    spark.range(n).select(lit(d("2020-03-02")).as("d"), lit(7).as("k"),
        lit("dup").as("label"))
      .write.format("dailystore").option("path", dir).mode("append").save()
    val delta = DailyStoreChanges.readChanges(spark, dir, 1, 2)
    assert(delta.count() == n.toLong)
    assert(delta.select("d", "k", "label", DailyStoreChanges.ChangeTypeCol)
      .distinct().as[(Date, Int, String, String)].collect().toSeq ==
      Seq((d("2020-03-02"), 7, "dup", "insert")))
  }
}
