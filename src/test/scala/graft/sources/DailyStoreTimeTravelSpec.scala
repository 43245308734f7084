package graft.sources

import java.sql.Date

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Time-travel-lite (r16): retention-enabled stores archive condemned
  * files per commit, retain manifests, prune beyond `keep`, and
  * [[DailyStoreTimeTravel.readVersion]] reconstructs any retained
  * state exactly — including through a crash-torn commit window.
  */
class DailyStoreTimeTravelSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(tag: String): String =
    new java.io.File(sys.props("java.io.tmpdir"),
      s"dstt_${tag}_${System.nanoTime()}").getPath

  private def d(s: String): Date = Date.valueOf(s)

  private def days(rows: (String, Int, String)*) =
    rows.toSeq.map { case (dt, n, s) => (d(dt), n, s) }
      .toDF("d", "n", "label")

  private def write(df: org.apache.spark.sql.DataFrame, dir: String,
                    mode: String = "append",
                    dynamic: Boolean = false): Unit = {
    val w = df.write.format("dailystore").option("path", dir).mode(mode)
    (if (dynamic) w.option("partitionOverwriteMode", "dynamic") else w).save()
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[(Date, Int, String)] =
    df.select("d", "n", "label").orderBy("d", "n")
      .as[(Date, Int, String)].collect().toSeq

  private def readV(dir: String, back: Int) =
    rows(DailyStoreTimeTravel.readVersion(spark, dir, back))

  test("retention: every commit is a version; readVersion walks back " +
      "exactly through append, day-replace, and truncate") {
    val dir = freshDir("walk")
    DailyStoreTimeTravel.enable(spark, dir, keep = 10)
    // v1: append days 1+2
    write(days(("2020-03-01", 1, "a"), ("2020-03-02", 2, "b")), dir)
    val s1 = rows(spark.read.parquet(dir))
    // v2: day-replace day 1
    write(days(("2020-03-01", 9, "fix")), dir, "overwrite", dynamic = true)
    val s2 = rows(spark.read.parquet(dir))
    assert(s2 == Seq((d("2020-03-01"), 9, "fix"), (d("2020-03-02"), 2, "b")))
    // v3: append day 3
    write(days(("2020-03-03", 3, "c")), dir)
    val s3 = rows(spark.read.parquet(dir))
    // v4: TRUNCATE (static overwrite)
    write(days(("2020-03-09", 99, "reset")), dir, "overwrite")
    val s4 = rows(spark.read.parquet(dir))
    assert(s4 == Seq((d("2020-03-09"), 99, "reset")))

    assert(readV(dir, 0) == s4)
    assert(readV(dir, 1) == s3, "one back = pre-truncate")
    assert(readV(dir, 2) == s2, "two back = pre-append")
    assert(readV(dir, 3) == s1, "three back = pre-day-replace")
    assert(readV(dir, 4) == Nil, "four back = before anything")
    val e = intercept[IllegalArgumentException] { readV(dir, 5) }
    assert(e.getMessage.contains("version"), e.getMessage)

    // the DESCRIBE-HISTORY analogue: newest first, versions_back maps
    // straight onto readVersion, day sets name what each commit did
    val h = DailyStoreTimeTravel.history(spark, dir)
      .select("versions_back", "replaced_partitions", "written_days",
        "n_files_written")
      .as[(Int, Seq[String], Seq[String], Int)].collect().toSeq
    assert(h.map(_._1) == Seq(1, 2, 3, 4))
    assert(h.head._2.nonEmpty, "the truncate names its replaced partitions")
    assert(h.head._3 == Seq("2020-03-09"))
    assert(h(2)._2 == Seq("d=2020-03-01"), "the day-replace condemned day 1")
    assert(h(3)._2.isEmpty && h(3)._3 == Seq("2020-03-01", "2020-03-02"),
      "the first append condemned nothing")

    // vacuum tightens the horizon after the fact
    assert(DailyStoreTimeTravel.vacuum(spark, dir, keep = 2) == 2)
    assert(readV(dir, 2) == s2)
    intercept[IllegalArgumentException] { readV(dir, 3) }
  }

  test("retention: prune keeps only the newest `keep` versions; reads " +
      "past the horizon fail loudly") {
    val dir = freshDir("prune")
    DailyStoreTimeTravel.enable(spark, dir, keep = 2)
    (1 to 4).foreach { i =>
      write(days(("2020-03-01", i, s"r$i")), dir, "overwrite", dynamic = true)
    }
    val vdir = new java.io.File(dir, "_versions")
    assert(vdir.listFiles().count(_.isDirectory) == 2,
      "only keep=2 versions retained")
    assert(readV(dir, 1) == Seq((d("2020-03-01"), 3, "r3")))
    assert(readV(dir, 2) == Seq((d("2020-03-01"), 2, "r2")))
    intercept[IllegalArgumentException] { readV(dir, 3) }
  }

  test("retention: a crash-torn commit window still archives — replay " +
      "converges to the committed state AND the version restores the old") {
    import org.apache.hadoop.fs.Path
    val hconf = spark.sessionState.newHadoopConf()
    val dir = freshDir("crash")
    DailyStoreTimeTravel.enable(spark, dir, keep = 5)
    write(days(("2020-03-01", 1, "old"), ("2020-03-02", 2, "keep")), dir)
    val fs = new Path(dir).getFileSystem(hconf)
    // stage a replacement for day 1, write a RETENTION manifest, crash
    // before any archive/rename happened
    val stagingName = "__stage_crash-tt"
    val src = freshDir("crashsrc")
    write(days(("2020-03-01", 10, "new")), src)
    val staged = new java.io.File(s"$src/d=2020-03-01").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    fs.mkdirs(new Path(s"$dir/$stagingName/d=2020-03-01"))
    fs.rename(new Path(staged.getPath),
      new Path(s"$dir/$stagingName/d=2020-03-01/part-0-cccc.parquet"))
    val rel = DailyStoreTimeTravel.versionDirName(
      DailyStoreTimeTravel.nextSeq(fs, new Path(dir)), "crash-tt")
    DailyStoreRecovery.writeManifest(fs,
      DailyStoreRecovery.manifestPath(new Path(dir), "crash-tt"),
      "d", stagingName, Seq("d=2020-03-01"),
      Seq(("2020-03-01", "part-0-cccc.parquet")), Some(rel))
    // a TORN store must fail the rollback reader loudly, not
    // reconstruct without the un-replayed commit's day (r16 review)
    val torn = intercept[IllegalArgumentException] {
      DailyStoreTimeTravel.readVersion(spark, dir, 1)
    }
    assert(torn.getMessage.contains("pending commit manifest"),
      torn.getMessage)
    DailyStoreRecovery.recoverPendingCommits(dir, hconf)
    // committed end state
    assert(rows(spark.read.parquet(dir)) == Seq(
      (d("2020-03-01"), 10, "new"), (d("2020-03-02"), 2, "keep")))
    // the torn commit's archive holds the condemned old file + manifest
    assert(readV(dir, 1) == Seq(
      (d("2020-03-01"), 1, "old"), (d("2020-03-02"), 2, "keep")))
    // replay idempotent
    DailyStoreRecovery.recoverPendingCommits(dir, hconf)
    assert(readV(dir, 1) == Seq(
      (d("2020-03-01"), 1, "old"), (d("2020-03-02"), 2, "keep")))
  }

  test("retention: rolling back a truncate-to-EMPTY store works — the " +
      "schema comes from the newest archive when no live parquet exists") {
    val dir = freshDir("empty")
    DailyStoreTimeTravel.enable(spark, dir, keep = 5)
    write(days(("2020-03-01", 1, "a"), ("2020-03-02", 2, "b")), dir)
    // truncate to EMPTY: static overwrite with zero rows condemns every
    // day and writes none — the exact state a rollback reader exists for
    write(days().filter(lit(false)), dir, "overwrite")
    intercept[Exception] { spark.read.parquet(dir).collect() }
    assert(readV(dir, 1) == Seq(
      (d("2020-03-01"), 1, "a"), (d("2020-03-02"), 2, "b")),
      "one back = the pre-truncate table")
    assert(readV(dir, 2) == Nil, "two back = before anything")
    // restore through the ordinary write path brings the store back
    write(DailyStoreTimeTravel.readVersion(spark, dir, 1), dir, "overwrite")
    assert(rows(spark.read.parquet(dir)) == Seq(
      (d("2020-03-01"), 1, "a"), (d("2020-03-02"), 2, "b")))
  }

  test("retention: restore is an ordinary (itself versioned) write; " +
      "plain stores keep exact r15 behavior (no _versions, no marker)") {
    val dir = freshDir("restore")
    DailyStoreTimeTravel.enable(spark, dir, keep = 5)
    write(days(("2020-03-01", 1, "good"), ("2020-03-02", 2, "good")), dir)
    val good = rows(spark.read.parquet(dir))
    // a bad re-ingest day-replaces both days
    write(days(("2020-03-01", 7, "bad"), ("2020-03-02", 8, "bad")),
      dir, "overwrite", dynamic = true)
    assert(rows(spark.read.parquet(dir)).forall(_._3 == "bad"))
    // restore: read the prior version, day-replace it back (tracked
    // checkpoint: the write targets the store being read, and the
    // blocks must not outlive the test — a leaked localCheckpoint
    // perturbs the registry-counting CheckpointsSpec)
    val restored = graft.util.Checkpoints.tracked(
      DailyStoreTimeTravel.readVersion(spark, dir, 1))
    try write(restored.df, dir, "overwrite", dynamic = true)
    finally restored.release()
    assert(rows(spark.read.parquet(dir)) == good)
    // the restore is itself a version: one back is the bad state
    assert(readV(dir, 1).forall(_._3 == "bad"))

    // and a store WITHOUT the marker never grows an archive
    val plain = freshDir("plain")
    write(days(("2020-03-01", 1, "x")), plain)
    write(days(("2020-03-01", 2, "y")), plain, "overwrite", dynamic = true)
    assert(!new java.io.File(plain, "_versions").exists())
    assert(!new java.io.File(plain, "_retention.json").exists())
    intercept[IllegalArgumentException] {
      DailyStoreTimeTravel.readVersion(spark, plain, 1)
    }
  }

  test("SQL time travel: VERSION AS OF <seq> / TIMESTAMP AS OF resolve " +
      "through the catalog to the readVersion reconstruction; errors " +
      "are loud; pushed filters flow into the inner plan") {
    val root = freshDir("sqltt")
    DailyStoreCatalog.register(spark, "dstore_sqltt", root)
    try {
      spark.sql("CREATE TABLE dstore_sqltt.cases (d date, n int, " +
        "label string) USING dailystore PARTITIONED BY (d)")
      val tdir = s"$root/cases"
      DailyStoreTimeTravel.enable(spark, tdir, keep = 10)
      // v1: append two days; v2: day-replace day 1; v3: append day 3
      write(days(("2020-03-01", 1, "a"), ("2020-03-02", 2, "b")), tdir)
      val s1 = rows(spark.read.parquet(tdir))
      write(days(("2020-03-01", 9, "fix")), tdir, "overwrite", dynamic = true)
      val s2 = rows(spark.read.parquet(tdir))
      write(days(("2020-03-03", 3, "c")), tdir)
      val s3 = rows(spark.read.parquet(tdir))

      def sqlV(v: Int) = rows(spark.sql(
        s"SELECT d, n, label FROM dstore_sqltt.cases VERSION AS OF $v"))
      assert(sqlV(3) == s3, "version 3 = the current state")
      assert(sqlV(2) == s2, "version 2 = pre-append")
      assert(sqlV(1) == s1, "version 1 = pre-day-replace")
      // the Scala API and the SQL front share one reconstruction
      assert(sqlV(1) == readV(tdir, 2))

      // version 0 = the state before ANY retained commit: empty, valid
      assert(sqlV(0) == Nil, "version 0 = before anything was committed")

      // errors: future version, junk version (pre-history below, after
      // vacuum shrinks the horizon)
      val fut = intercept[Exception] { sqlV(9) }
      assert(fut.getMessage.contains("future"), fut.getMessage)
      val junk = intercept[Exception] {
        spark.sql("SELECT * FROM dstore_sqltt.cases VERSION AS OF 'xy'")
          .collect()
      }
      assert(junk.getMessage.contains("history") ||
        junk.getMessage.contains("numeric"), junk.getMessage)

      // TIMESTAMP AS OF: between v2 and v3 resolves to v2's state; the
      // dir mtimes of this test's commits are seconds apart, so pick
      // the instant just after v2's version-dir mtime
      import org.apache.hadoop.fs.Path
      val fs = new Path(tdir).getFileSystem(spark.sessionState.newHadoopConf())
      val vs = DailyStoreTimeTravel.versions(fs, new Path(tdir))
      val v2Mtime = fs.getFileStatus(vs(1).dir).getModificationTime
      val tsLit = new java.sql.Timestamp(v2Mtime).toString
      val gotTs = rows(spark.sql("SELECT d, n, label FROM " +
        s"dstore_sqltt.cases TIMESTAMP AS OF '$tsLit'"))
      assert(gotTs == s2, s"timestamp at v2's commit = v2's state; got $gotTs")
      val preHist = intercept[Exception] {
        spark.sql("SELECT * FROM dstore_sqltt.cases TIMESTAMP AS OF " +
          "'2000-01-01 00:00:00'").collect()
      }
      assert(preHist.getMessage.contains("predates"), preHist.getMessage)

      // pushdown: a day-equality predicate reaches the version scan
      // (pushed list) and the result stays exact
      val q = spark.sql("SELECT n FROM dstore_sqltt.cases VERSION AS OF 1 " +
        "WHERE d = DATE'2020-03-01'")
      assert(q.as[Int].collect().toSeq == Seq(1))
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("DailyStoreVersionScan") &&
        plan.contains("EqualTo(d,2020-03-01)") &&
        plan.contains("ReadSchema: struct<n:int>"),
        s"expected the pushed day filter + pruned read schema:\n$plan")

      // a VERSIONED read of an EMPTY required schema (count star) works
      assert(spark.sql(
        "SELECT COUNT(*) FROM dstore_sqltt.cases VERSION AS OF 1")
        .head().getLong(0) == 2L)

      // vacuum tightens the horizon: version 0/1 now predate retention
      assert(DailyStoreTimeTravel.vacuum(spark, tdir, keep = 2) == 1)
      val old = intercept[Exception] { sqlV(0) }.getMessage
      assert(old.contains("predates"), old)
      assert(sqlV(1) == s1, "version 1 still reconstructable with keep=2")
    } finally {
      spark.conf.unset("spark.sql.catalog.dstore_sqltt")
      spark.conf.unset("spark.sql.catalog.dstore_sqltt.root")
      spark.conf.unset("spark.sql.catalog.dstore_sqltt.partitionCol")
    }
  }

  test("time-travel gap safety: an out-of-order-removed version dir " +
      "fails BOTH resolution overloads loudly; huge version deltas " +
      "don't wrap the Int narrowing") {
    val root = freshDir("gap")
    DailyStoreCatalog.register(spark, "dstore_gap", root)
    try {
      spark.sql("CREATE TABLE dstore_gap.cases (d date, n int, " +
        "label string) USING dailystore PARTITIONED BY (d)")
      val tdir = s"$root/cases"
      DailyStoreTimeTravel.enable(spark, tdir, keep = 10)
      (1 to 5).foreach { i =>
        write(days(("2020-03-01", i, s"r$i")), tdir, "overwrite",
          dynamic = true)
      }
      // sabotage: remove v3's dir (prune never does this — it deletes
      // oldest-first — so this models manual/interop damage)
      import org.apache.hadoop.fs.Path
      val fs = new Path(tdir).getFileSystem(spark.sessionState.newHadoopConf())
      val vs = DailyStoreTimeTravel.versions(fs, new Path(tdir))
      val v3 = vs.find(_.seq == 3L).get
      val v2Mtime = fs.getFileStatus(vs.find(_.seq == 2L).get.dir)
        .getModificationTime
      fs.delete(v3.dir, true)
      // VERSION AS OF 2 must walk THROUGH the missing v3: loud error
      val e1 = intercept[Exception] {
        spark.sql("SELECT * FROM dstore_gap.cases VERSION AS OF 2")
          .collect()
      }
      assert(e1.getMessage.contains("gap"), e1.getMessage)
      // TIMESTAMP AS OF an instant at v2's commit: the boundary version
      // below the walk is v2, not the expected v3 — loud error
      val e2 = intercept[Exception] {
        spark.sql("SELECT * FROM dstore_gap.cases TIMESTAMP AS OF " +
          s"'${new java.sql.Timestamp(v2Mtime)}'").collect()
      }
      assert(e2.getMessage.contains("gap"), e2.getMessage)
      // versions ABOVE the gap stay readable
      assert(rows(spark.sql(
        "SELECT d, n, label FROM dstore_gap.cases VERSION AS OF 4"))
        == Seq((d("2020-03-01"), 4, "r4")))

      // Int-wrap guard: a seq 2^32 below maxSeq must be "predates", not
      // a silently-wrapped k=0 read of the current state
      val vsNow = DailyStoreTimeTravel.versions(fs, new Path(tdir))
      val huge = intercept[IllegalArgumentException] {
        DailyStoreVersionRead.versionsBackFor(
          vsNow, vsNow.head.seq - (1L << 32), tdir)
      }
      assert(huge.getMessage.contains("predates"), huge.getMessage)
    } finally {
      spark.conf.unset("spark.sql.catalog.dstore_gap")
      spark.conf.unset("spark.sql.catalog.dstore_gap.root")
      spark.conf.unset("spark.sql.catalog.dstore_gap.partitionCol")
    }
  }

  test("r18 head-gap: a retention-OFF commit after the newest version " +
      "is DETECTED via the _last_commit sidecar — time travel refuses " +
      "loudly instead of silently including the untracked commit, and " +
      "heals forward once retention is back on") {
    val root = freshDir("headgap")
    DailyStoreCatalog.register(spark, "dstore_hg", root)
    try {
      spark.sql("CREATE TABLE dstore_hg.cases (d date, n int, " +
        "label string) USING dailystore PARTITIONED BY (d)")
      val tdir = s"$root/cases"
      DailyStoreTimeTravel.enable(spark, tdir, keep = 10)
      write(days(("2020-03-01", 1, "a")), tdir)                    // seq 1
      write(days(("2020-03-02", 2, "b")), tdir)                    // seq 2
      assert(readV(tdir, 1) == Seq((d("2020-03-01"), 1, "a")))
      // the untracked commit: retention OFF, no version dir — before
      // r18 every reconstruction silently KEPT its changes
      DailyStoreTimeTravel.disable(spark, tdir)
      write(days(("2020-03-01", 9, "junk")), tdir,
        "overwrite", dynamic = true)                               // seq 3
      val e1 = intercept[IllegalArgumentException] { readV(tdir, 1) }
      assert(e1.getMessage.contains("retention OFF"), e1.getMessage)
      val e2 = intercept[Exception] {
        spark.sql("SELECT * FROM dstore_hg.cases VERSION AS OF 2").collect()
      }
      assert(e2.getMessage.contains("retention OFF"), e2.getMessage)
      val e3 = intercept[Exception] {
        spark.sql("SELECT * FROM dstore_hg.cases TIMESTAMP AS OF " +
          s"'${new java.sql.Timestamp(System.currentTimeMillis())}'")
          .collect()
      }
      assert(e3.getMessage.contains("retention OFF"), e3.getMessage)
      // current-state reads are unaffected
      assert(readV(tdir, 0).exists(_._3 == "junk"))

      // heal forward: retention back on, a new commit lands as seq 4
      // (the sidecar keeps seqs monotone across the toggle) — the
      // state BEFORE it (i.e. after the untracked commit) becomes
      // reconstructable, states across the untracked commit stay loud
      DailyStoreTimeTravel.enable(spark, tdir, keep = 10)
      write(days(("2020-03-03", 3, "c")), tdir)                    // seq 4
      assert(readV(tdir, 1) ==
        Seq((d("2020-03-01"), 9, "junk"), (d("2020-03-02"), 2, "b")),
        "one back = the state after the untracked commit")
      assert(rows(spark.sql(
        "SELECT d, n, label FROM dstore_hg.cases VERSION AS OF 3"))
        == Seq((d("2020-03-01"), 9, "junk"), (d("2020-03-02"), 2, "b")))
      val e4 = intercept[Exception] { readV(tdir, 2) }
      assert(e4.getMessage.contains("gap"), e4.getMessage)
      val e5 = intercept[Exception] {
        spark.sql("SELECT * FROM dstore_hg.cases VERSION AS OF 2").collect()
      }
      assert(e5.getMessage.contains("gap"), e5.getMessage)
    } finally {
      spark.conf.unset("spark.sql.catalog.dstore_hg")
      spark.conf.unset("spark.sql.catalog.dstore_hg.root")
      spark.conf.unset("spark.sql.catalog.dstore_hg.partitionCol")
    }
  }

  test("retention: a corrupt _retention.json fails the commit LOUDLY " +
      "instead of silently flipping the store to delete-mode") {
    val dir = freshDir("corrupt")
    DailyStoreTimeTravel.enable(spark, dir, keep = 3)
    write(days(("2020-03-01", 1, "a")), dir)
    // corrupt the marker: retention is ON but unreadable
    val f = new java.io.FileOutputStream(
      new java.io.File(dir, "_retention.json"))
    try f.write("{not json".getBytes("UTF-8")) finally f.close()
    // a day-replace condemns files; it must throw, not delete them
    val e = intercept[Exception] {
      write(days(("2020-03-01", 9, "fix")), dir, "overwrite", dynamic = true)
    }
    def rootCauses(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: rootCauses(t.getCause)
    assert(rootCauses(e).exists(c =>
      c.isInstanceOf[java.io.IOException] &&
        c.getMessage.contains("_retention.json")),
      s"expected the loud unreadable-retention IOException, got: $e")
    // the store is untouched: v1's data survives intact
    assert(rows(spark.read.parquet(dir)) == Seq((d("2020-03-01"), 1, "a")))
    // restoring a valid marker lets commits proceed again
    DailyStoreTimeTravel.enable(spark, dir, keep = 3)
    write(days(("2020-03-01", 9, "fix")), dir, "overwrite", dynamic = true)
    assert(rows(spark.read.parquet(dir)) == Seq((d("2020-03-01"), 9, "fix")))
    // an ABSENT marker is plain delete-mode — None, no error
    val plainDir = freshDir("absent")
    write(days(("2020-03-01", 1, "x")), plainDir)
    val fs = new org.apache.hadoop.fs.Path(plainDir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    assert(DailyStoreTimeTravel.retentionOf(fs,
      new org.apache.hadoop.fs.Path(plainDir)).isEmpty)
  }

  test("integration: the streaming daily re-ingest loop composes with " +
      "retention — a garbage micro-batch is rolled back via history + " +
      "readVersion + an ordinary day-replace") {
    val root = freshDir("stream_tt")
    DailyStoreCatalog.register(spark, "dstore_tt", root)
    try {
      spark.sql("CREATE TABLE dstore_tt.cases (d date, n int, " +
        "label string) USING dailystore PARTITIONED BY (d)")
      val tdir = s"$root/cases"
      DailyStoreTimeTravel.enable(spark, tdir, keep = 5)
      val ingest = graft.streaming.StreamingOps
        .dailyReplaceEachBatch("dstore_tt.cases") _
      // two good daily batches through the STREAMING loop's writer
      ingest(days(("2020-03-01", 1, "good"), ("2020-03-01", 2, "good")), 0L)
      ingest(days(("2020-03-02", 3, "good")), 1L)
      val goodState = rows(spark.read.parquet(tdir))
      // the garbage re-ingest day-replaces day 1 with junk
      ingest(days(("2020-03-01", 99, "garbage")), 2L)
      assert(rows(spark.read.parquet(tdir)).exists(_._3 == "garbage"))
      // operator: history names the culprit commit and its day...
      val h = DailyStoreTimeTravel.history(spark, tdir)
        .select("versions_back", "replaced_partitions")
        .as[(Int, Seq[String])].collect().toSeq
      assert(h.head == ((1, Seq("d=2020-03-01"))),
        s"newest history row must be the garbage day-replace: $h")
      // ...and restores the pre-garbage state with an ordinary write
      val t = graft.util.Checkpoints.tracked(
        DailyStoreTimeTravel.readVersion(spark, tdir, 1)
          .filter(col("d") === d("2020-03-01")))
      try t.df.writeTo("dstore_tt.cases").overwritePartitions()
      finally t.release()
      assert(rows(spark.read.parquet(tdir)) == goodState)
      // the stream keeps running on the healed store
      ingest(days(("2020-03-03", 4, "good")), 3L)
      assert(rows(spark.read.parquet(tdir)).map(_._2) == Seq(1, 2, 3, 4))
    } finally {
      spark.conf.unset("spark.sql.catalog.dstore_tt")
      spark.conf.unset("spark.sql.catalog.dstore_tt.root")
      spark.conf.unset("spark.sql.catalog.dstore_tt.partitionCol")
    }
  }
}
