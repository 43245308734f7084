package graft.sources

import java.sql.Date

import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.SparkSpec

class DailyStoreSinkSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(tag: String): String =
    new java.io.File(sys.props("java.io.tmpdir"),
      s"dailystore_${tag}_${System.nanoTime()}").getPath

  private def d(s: String): Date = Date.valueOf(s)

  private def days(tag: String, rows: (String, Int, String)*) =
    rows.toSeq.map { case (dt, n, s) => (d(dt), n, s) }
      .toDF("d", "n", "label")

  private def readBack(dir: String) =
    spark.read.parquet(dir).select("d", "n", "label").orderBy("d", "n")
      .as[(Date, Int, String)].collect().toSeq

  test("append mode accumulates; partition column reads back as date") {
    val dir = freshDir("append")
    days("a1", ("2020-03-01", 1, "x"), ("2020-03-02", 2, "y"))
      .write.format("dailystore").option("path", dir).option("partitionCol", "d")
      .mode("append").save()
    days("a2", ("2020-03-02", 3, "z"))
      .write.format("dailystore").option("path", dir).option("partitionCol", "d")
      .mode("append").save()
    assert(readBack(dir) == Seq(
      (d("2020-03-01"), 1, "x"), (d("2020-03-02"), 2, "y"),
      (d("2020-03-02"), 3, "z")))
  }

  test("static overwrite is truncate-and-reload (S9)") {
    val dir = freshDir("trunc")
    days("t1", ("2020-03-01", 1, "x"), ("2020-03-02", 2, "y"))
      .write.format("dailystore").option("path", dir)
      .mode("append").save()
    days("t2", ("2020-03-03", 3, "z"))
      .write.format("dailystore").option("path", dir)
      .mode("overwrite").save()
    assert(readBack(dir) == Seq((d("2020-03-03"), 3, "z")))
  }

  test("dynamic overwrite replaces exactly the incoming days") {
    val dir = freshDir("dyn")
    days("d1", ("2020-03-01", 1, "x"), ("2020-03-02", 2, "y"),
        ("2020-03-03", 3, "z"))
      .write.format("dailystore").option("path", dir)
      .mode("append").save()
    val prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try days("d2", ("2020-03-02", 9, "new"))
      .write.format("dailystore").option("path", dir)
      .mode("overwrite").save()
    finally spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    assert(readBack(dir) == Seq(
      (d("2020-03-01"), 1, "x"), (d("2020-03-02"), 9, "new"),
      (d("2020-03-03"), 3, "z")))
  }

  test("clustered distribution: one file per day per write job") {
    val dir = freshDir("onefile")
    // 4 input partitions all holding day-1 rows: without the declared
    // clustered distribution each task would write its own file
    spark.range(100).repartition(4)
      .select(lit(d("2020-03-01")).as("d"), col("id").cast("int").as("n"),
        lit("w").as("label"))
      .write.format("dailystore").option("path", dir)
      .mode("append").save()
    val files = new java.io.File(dir, "d=2020-03-01")
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(files == 1, s"expected 1 clustered file, got $files")
    assert(spark.read.parquet(dir).count() == 100)
  }

  test("catalog front: writeTo append / overwritePartitions / " +
      "overwrite(condition) drive the connector engine-natively") {
    val root = freshDir("catalog")
    DailyStoreCatalog.register(spark, "dstore_spec", root)
    try {
      spark.sql("CREATE TABLE dstore_spec.cases (d date, n int, " +
        "label string) USING dailystore PARTITIONED BY (d)")
      val tdir = s"$root/cases"
      days("c1", ("2020-03-01", 1, "x"), ("2020-03-02", 2, "y"),
          ("2020-03-03", 3, "z"))
        .writeTo("dstore_spec.cases").append()
      assert(readBack(tdir).map(_._2) == Seq(1, 2, 3))
      // dynamic: replace exactly the incoming days, via the engine's
      // own OverwritePartitionsDynamic plan (no conf needed)
      days("c2", ("2020-03-02", 9, "new"))
        .writeTo("dstore_spec.cases").overwritePartitions()
      assert(readBack(tdir) == Seq(
        (d("2020-03-01"), 1, "x"), (d("2020-03-02"), 9, "new"),
        (d("2020-03-03"), 3, "z")))
      // filtered: replace one named day via OverwriteByExpression
      days("c3", ("2020-03-01", 7, "rep"))
        .writeTo("dstore_spec.cases")
        .overwrite(col("d") === lit(d("2020-03-01")))
      assert(readBack(tdir) == Seq(
        (d("2020-03-01"), 7, "rep"), (d("2020-03-02"), 9, "new"),
        (d("2020-03-03"), 3, "z")))
      // catalog hygiene
      assert(spark.sql("SHOW TABLES IN dstore_spec").count() == 1)
      spark.sql("DROP TABLE dstore_spec.cases")
      assert(!new java.io.File(tdir).exists())
    } finally {
      spark.conf.unset("spark.sql.catalog.dstore_spec")
      spark.conf.unset("spark.sql.catalog.dstore_spec.root")
      spark.conf.unset("spark.sql.catalog.dstore_spec.partitionCol")
    }
  }

  test("catalog front: overwrite(true) TRUNCATES even when the session " +
      "conf says dynamic (DSv2 contract beats the V1 conf)") {
    val root = freshDir("catdyn")
    DailyStoreCatalog.register(spark, "dstore_dyn", root)
    val prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      spark.sql("CREATE TABLE dstore_dyn.cases (d date, n int, " +
        "label string) USING dailystore PARTITIONED BY (d)")
      val tdir = s"$root/cases"
      days("y1", ("2020-03-01", 1, "x"), ("2020-03-02", 2, "y"))
        .writeTo("dstore_dyn.cases").append()
      // a literal-true overwrite through the catalog front: the DSv2
      // contract is "replace ALL rows"; before the viaCatalog flag this
      // silently became a day-replace and 03-01 survived
      days("y2", ("2020-03-02", 9, "only"))
        .writeTo("dstore_dyn.cases").overwrite(lit(true))
      assert(readBack(tdir) == Seq((d("2020-03-02"), 9, "only")),
        "catalog-front overwrite(true) must not retain days absent " +
          "from the incoming frame")
      // the PATH-based writer keeps V1 parity: same conf, same store,
      // mode("overwrite") day-replaces
      days("y3", ("2020-03-03", 3, "z"))
        .write.format("dailystore").option("path", tdir)
        .mode("overwrite").save()
      assert(readBack(tdir) == Seq(
        (d("2020-03-02"), 9, "only"), (d("2020-03-03"), 3, "z")))
    } finally {
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
      spark.conf.unset("spark.sql.catalog.dstore_dyn")
      spark.conf.unset("spark.sql.catalog.dstore_dyn.root")
      spark.conf.unset("spark.sql.catalog.dstore_dyn.partitionCol")
    }
  }

  test("filtered overwrite treats the filter array as a CONJUNCTION") {
    val dir = freshDir("conj")
    days("j1", ("2020-03-01", 1, "x"), ("2020-03-02", 2, "y"))
      .write.format("dailystore").option("path", dir)
      .mode("append").save()
    import org.apache.spark.sql.sources.{EqualTo, Filter, In}
    val rowSchema = days("s", ("2020-03-01", 0, "s")).schema
    val builder = new DailyStoreWriteBuilder(dir, "d",
      new org.apache.spark.sql.connector.write.LogicalWriteInfo {
        override def options(): CaseInsensitiveStringMap =
          new CaseInsensitiveStringMap(java.util.Map.of("path", dir))
        override def queryId(): String = s"conj-${System.nanoTime()}"
        override def schema(): org.apache.spark.sql.types.StructType =
          rowSchema
      })
    // d = 03-01 AND d IN (03-01, 03-02) selects ONLY 03-01: a union
    // reading would also condemn (and here destroy) 03-02
    val bw = builder.overwrite(Array[Filter](
        EqualTo("d", "2020-03-01"),
        In("d", Array("2020-03-01", "2020-03-02"))))
      .build().toBatch
    bw.commit(Array.empty) // no new rows: pure partition delete
    assert(readBack(dir) == Seq((d("2020-03-02"), 2, "y")))
  }

  test("read front (r15): SELECT through the catalog and format().load() " +
      "serve the store with pruning and scan statistics") {
    val root = freshDir("read")
    DailyStoreCatalog.register(spark, "dstore_read", root)
    try {
      spark.sql("CREATE TABLE dstore_read.cases (d date, n int, " +
        "label string) USING dailystore PARTITIONED BY (d)")
      days("r1", ("2020-03-01", 1, "x"), ("2020-03-02", 2, "y"),
          ("2020-03-03", 3, "z"))
        .writeTo("dstore_read.cases").append()
      // catalog front reads: spark.table and SQL
      val t = spark.table("dstore_read.cases")
        .select("d", "n", "label").orderBy("d")
        .as[(Date, Int, String)].collect().toSeq
      assert(t == Seq((d("2020-03-01"), 1, "x"), (d("2020-03-02"), 2, "y"),
        (d("2020-03-03"), 3, "z")))
      assert(spark.sql(
        "SELECT SUM(n) AS s FROM dstore_read.cases").head().getLong(0) == 6L)
      // read-after-write through the SAME catalog table name
      days("r2", ("2020-03-02", 9, "new")).writeTo("dstore_read.cases")
        .overwritePartitions()
      assert(spark.sql(
        "SELECT SUM(n) AS s FROM dstore_read.cases").head().getLong(0) == 13L)
      // partition pruning reaches the scan
      val pruned = spark.table("dstore_read.cases")
        .filter(col("d") === lit(d("2020-03-03")))
      val physical = pruned.queryExecution.executedPlan.toString
      assert(physical.contains("PartitionFilters"), physical)
      assert(pruned.count() == 1)
      // the delegate reports statistics (AQE's size source)
      val scan = pruned.queryExecution.optimizedPlan.collectFirst {
        case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
          r.scan
      }
      assert(scan.exists {
        case s: org.apache.spark.sql.connector.read.SupportsReportStatistics =>
          s.estimateStatistics().sizeInBytes().isPresent
        case _ => false
      }, "scan must report statistics")
      // path-based read front
      val got = spark.read.format("dailystore").option("path", s"$root/cases")
        .load().select("d", "n", "label").orderBy("d", "n")
        .as[(Date, Int, String)].collect().toSeq
      assert(got.map(_._2).sorted == Seq(1, 3, 9))
    } finally {
      spark.conf.unset("spark.sql.catalog.dstore_read")
      spark.conf.unset("spark.sql.catalog.dstore_read.root")
      spark.conf.unset("spark.sql.catalog.dstore_read.partitionCol")
    }
  }

  test("commit manifest: a crash anywhere in the delete-rename window " +
      "replays to the committed end state") {
    import org.apache.hadoop.fs.Path
    val hconf = spark.sessionState.newHadoopConf()

    // builds a store with days 1+2, stages a replacement file for day 1,
    // writes the manifest, then stops at the requested crash point
    def tornStore(tag: String, crashAfterDelete: Boolean,
                  alsoRenameFirst: Boolean = false): (String, String) = {
      val dir = freshDir(s"recov$tag")
      days(tag, ("2020-03-01", 1, "old"), ("2020-03-02", 2, "keep"))
        .write.format("dailystore").option("path", dir)
        .mode("append").save()
      val fs = new Path(dir).getFileSystem(hconf)
      // stage two replacement files for day 1 (as two tasks would)
      val stagingName = s"__stage_crash-$tag"
      val names = Seq("part-0-aaaa.parquet", "part-1-bbbb.parquet")
      names.zipWithIndex.foreach { case (n, i) =>
        val src = freshDir(s"recovsrc$tag$i")
        days(s"$tag$i", ("2020-03-01", 10 + i, "new"))
          .write.format("dailystore").option("path", src)
          .mode("append").save()
        val f = new java.io.File(s"$src/d=2020-03-01").listFiles()
          .filter(_.getName.endsWith(".parquet")).head
        fs.mkdirs(new Path(s"$dir/$stagingName/d=2020-03-01"))
        fs.rename(new Path(f.getPath),
          new Path(s"$dir/$stagingName/d=2020-03-01/$n"))
      }
      DailyStoreRecovery.writeManifest(fs,
        DailyStoreRecovery.manifestPath(new Path(dir), s"crash-$tag"),
        "d", stagingName, Seq("d=2020-03-01"),
        names.map(n => ("2020-03-01", n)))
      if (crashAfterDelete)
        fs.delete(new Path(s"$dir/d=2020-03-01"), true)
      if (alsoRenameFirst) {
        fs.mkdirs(new Path(s"$dir/d=2020-03-01"))
        fs.rename(new Path(s"$dir/$stagingName/d=2020-03-01/${names.head}"),
          new Path(s"$dir/d=2020-03-01/${names.head}"))
      }
      (dir, stagingName)
    }
    def assertHealed(dir: String, stagingName: String): Unit = {
      assert(readBack(dir) == Seq(
        (d("2020-03-01"), 10, "new"), (d("2020-03-01"), 11, "new"),
        (d("2020-03-02"), 2, "keep")))
      assert(!new java.io.File(dir, stagingName).exists(), "staging remains")
      assert(new java.io.File(dir).listFiles()
        .forall(!_.getName.startsWith("_commit-")), "manifest remains")
    }

    // crash BEFORE the delete: old day-1 files still present
    val (a, sa) = tornStore("a", crashAfterDelete = false)
    DailyStoreRecovery.recoverPendingCommits(a, hconf)
    assertHealed(a, sa)
    // crash AFTER the delete, before any rename
    val (b, sb) = tornStore("b", crashAfterDelete = true)
    DailyStoreRecovery.recoverPendingCommits(b, hconf)
    assertHealed(b, sb)
    // crash MID-rename (one of two staged files already in place) —
    // recovered not by an explicit call but by the next WRITE's
    // self-heal (the commit() preamble)
    val (c, sc) = tornStore("c", crashAfterDelete = true,
      alsoRenameFirst = true)
    days("heal", ("2020-03-05", 5, "later"))
      .write.format("dailystore").option("path", c)
      .mode("append").save()
    assert(readBack(c) == Seq(
      (d("2020-03-01"), 10, "new"), (d("2020-03-01"), 11, "new"),
      (d("2020-03-02"), 2, "keep"), (d("2020-03-05"), 5, "later")))
    assert(!new java.io.File(c, sc).exists())
    assert(new java.io.File(c).listFiles()
      .forall(!_.getName.startsWith("_commit-")))
    // replay is idempotent
    DailyStoreRecovery.recoverPendingCommits(a, hconf)
    assertHealed(a, sa)
  }

  test("a crash MID-manifest-write (torn .tmp) rolls back instead of " +
      "poisoning every later commit") {
    import org.apache.hadoop.fs.Path
    val hconf = spark.sessionState.newHadoopConf()
    val dir = freshDir("torntmp")
    days("tt", ("2020-03-01", 1, "keep")).write.format("dailystore")
      .option("path", dir).mode("append").save()
    val fs = new Path(dir).getFileSystem(hconf)
    // simulate the writer dying inside writeManifest: a partial .tmp
    // plus its staging dir, but NO durable manifest — nothing was
    // condemned yet, so the correct recovery is rollback
    fs.mkdirs(new Path(s"$dir/__stage_tornq/d=2020-03-02"))
    val out = fs.create(new Path(s"$dir/_commit-tornq.json.tmp"), true)
    try out.write("{\"pcol\":\"d\",\"stag".getBytes) finally out.close()
    // the next WRITE's recovery preamble sweeps both and proceeds
    days("tt2", ("2020-03-03", 3, "later")).write.format("dailystore")
      .option("path", dir).mode("append").save()
    assert(readBack(dir) == Seq(
      (d("2020-03-01"), 1, "keep"), (d("2020-03-03"), 3, "later")))
    val names = new java.io.File(dir).listFiles().map(_.getName)
    assert(!names.exists(_.startsWith("_commit-")), "tmp manifest remains")
    assert(!names.exists(_.startsWith("__stage")), "staging remains")
  }

  test("an unparseable durable manifest is treated as UNDECIDED: " +
      "rollback, not a thrown replay") {
    import org.apache.hadoop.fs.Path
    val hconf = spark.sessionState.newHadoopConf()
    val dir = freshDir("badmanifest")
    days("bm", ("2020-03-01", 1, "keep")).write.format("dailystore")
      .option("path", dir).mode("append").save()
    val fs = new Path(dir).getFileSystem(hconf)
    fs.mkdirs(new Path(s"$dir/__stage_badq/d=2020-03-02"))
    val out = fs.create(new Path(s"$dir/_commit-badq.json"), true)
    try out.write("not json at all".getBytes) finally out.close()
    DailyStoreRecovery.recoverPendingCommits(dir, hconf)
    assert(readBack(dir) == Seq((d("2020-03-01"), 1, "keep")))
    val names = new java.io.File(dir).listFiles().map(_.getName)
    assert(!names.exists(_.startsWith("_commit-")))
    assert(!names.exists(_.startsWith("__stage")))
  }

  test("replay of a truncate-condemned day removes the DIRECTORY, " +
      "not just its files") {
    import org.apache.hadoop.fs.Path
    val hconf = spark.sessionState.newHadoopConf()
    val dir = freshDir("emptydir")
    days("ed", ("2020-03-01", 1, "old"), ("2020-03-02", 2, "gone"))
      .write.format("dailystore").option("path", dir)
      .mode("append").save()
    val fs = new Path(dir).getFileSystem(hconf)
    // truncate-shaped manifest: day 1 is replaced (one staged file),
    // day 2 is condemned with NO replacement
    val src = freshDir("edsrc")
    days("eds", ("2020-03-01", 9, "new")).write.format("dailystore")
      .option("path", src).mode("append").save()
    val f = new java.io.File(s"$src/d=2020-03-01").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    fs.mkdirs(new Path(s"$dir/__stage_edq/d=2020-03-01"))
    fs.rename(new Path(f.getPath),
      new Path(s"$dir/__stage_edq/d=2020-03-01/part-0-cccc.parquet"))
    DailyStoreRecovery.writeManifest(fs,
      DailyStoreRecovery.manifestPath(new Path(dir), "edq"),
      "d", "__stage_edq", Seq("d=2020-03-01", "d=2020-03-02"),
      Seq(("2020-03-01", "part-0-cccc.parquet")))
    // crash before any delete; recover
    DailyStoreRecovery.recoverPendingCommits(dir, hconf)
    assert(readBack(dir) == Seq((d("2020-03-01"), 9, "new")))
    assert(!new java.io.File(dir, "d=2020-03-02").exists(),
      "condemned day dir must be gone, not left empty")
  }

  test("compact rewrites crowded days to one file through the connector " +
      "itself; untouched days keep their files") {
    val dir = freshDir("compact")
    // three append runs crowd day 1 with three files; day 2 gets one
    days("c1", ("2020-03-01", 1, "a"), ("2020-03-02", 9, "keep"))
      .write.format("dailystore").option("path", dir).mode("append").save()
    days("c2", ("2020-03-01", 2, "b"))
      .write.format("dailystore").option("path", dir).mode("append").save()
    days("c3", ("2020-03-01", 3, "c"))
      .write.format("dailystore").option("path", dir).mode("append").save()
    def fileCount(day: String): Int = new java.io.File(dir, s"d=$day")
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(fileCount("2020-03-01") == 3 && fileCount("2020-03-02") == 1)
    val before = readBack(dir)
    assert(DailyStoreRecovery.compact(spark, dir) == 1)
    assert(fileCount("2020-03-01") == 1, "crowded day must compact to 1 file")
    assert(fileCount("2020-03-02") == 1)
    assert(readBack(dir) == before, "compaction must not change content")
    // second run: nothing crowded, no work
    assert(DailyStoreRecovery.compact(spark, dir) == 0)
    assert(readBack(dir) == before)
    // no staging or manifest debris
    assert(new java.io.File(dir).listFiles().forall(f =>
      !f.getName.startsWith("__stage") && !f.getName.startsWith("_commit-")))
  }

  test("compact handles digit-like STRING partition values (no " +
      "partition-type inference on the rewrite read)") {
    val dir = freshDir("compactstr")
    // string pcol whose values would infer as integers
    def batch(n: Int, s: String) =
      Seq(("20240101", n, s)).toDF("d", "n", "label")
    batch(1, "a").write.format("dailystore").option("path", dir)
      .mode("append").save()
    batch(2, "b").write.format("dailystore").option("path", dir)
      .mode("append").save()
    def files(): Int = new java.io.File(dir, "d=20240101")
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(files() == 2)
    assert(DailyStoreRecovery.compact(spark, dir) == 1)
    assert(files() == 1)
    assert(spark.read.parquet(dir)
      .select(col("d").cast("string"), col("n"), col("label"))
      .orderBy("n").as[(String, Int, String)].collect().toSeq ==
      Seq(("20240101", 1, "a"), ("20240101", 2, "b")))
  }

  test("path-unsafe string partition values are rejected loudly") {
    val dir = freshDir("unsafe")
    val e = intercept[Exception] {
      Seq(("2020/03/01", 1)).toDF("d", "n")
        .write.format("dailystore").option("path", dir)
        .mode("append").save()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => String.valueOf(x.getMessage) +: msgs(x.getCause))
    assert(msgs(e).exists(_.contains("path-unsafe")))
  }

  test("catalog: namespaced identifiers get no-such-table semantics") {
    val root = freshDir("ns")
    DailyStoreCatalog.register(spark, "dstore_ns", root)
    try {
      // must no-op, not abort with IllegalArgumentException
      spark.sql("DROP TABLE IF EXISTS dstore_ns.some.nested")
      intercept[Exception] {
        spark.sql("CREATE TABLE dstore_ns.t (d date, n int) " +
          "USING dailystore PARTITIONED BY (n)") // wrong partition col
      }
    } finally {
      spark.conf.unset("spark.sql.catalog.dstore_ns")
      spark.conf.unset("spark.sql.catalog.dstore_ns.root")
      spark.conf.unset("spark.sql.catalog.dstore_ns.partitionCol")
    }
  }

  test("filtered overwrite (= / IN on the day) replaces named days; " +
      "row-level conditions are rejected") {
    val dir = freshDir("filt")
    days("f1", ("2020-03-01", 1, "x"), ("2020-03-02", 2, "y"))
      .write.format("dailystore").option("path", dir)
      .mode("append").save()
    // drive the connector surface directly (the catalog/SQL front is
    // what normally produces these filters)
    val rowSchema = days("s", ("2020-03-01", 0, "s")).schema
    def builder() = new DailyStoreWriteBuilder(dir, "d",
      new org.apache.spark.sql.connector.write.LogicalWriteInfo {
        override def options(): CaseInsensitiveStringMap =
          new CaseInsensitiveStringMap(java.util.Map.of("path", dir))
        override def queryId(): String = s"spec-${System.nanoTime()}"
        override def schema(): org.apache.spark.sql.types.StructType = rowSchema
      })
    import org.apache.spark.sql.sources.{EqualTo, In}
    intercept[IllegalArgumentException] {
      builder().overwrite(Array[org.apache.spark.sql.sources.Filter](EqualTo("n", 1)))
    }
    val bw = builder()
      .overwrite(Array[org.apache.spark.sql.sources.Filter](In("d", Array("2020-03-01"))))
      .build().toBatch
    val w = bw.createBatchWriterFactory(
        new org.apache.spark.sql.connector.write.PhysicalWriteInfo {
          override def numPartitions(): Int = 1
        }).createWriter(0, 0L)
    val day1 = d("2020-03-01").toLocalDate.toEpochDay.toInt
    w.write(org.apache.spark.sql.catalyst.InternalRow(
      day1, 7, org.apache.spark.unsafe.types.UTF8String.fromString("rep")))
    bw.commit(Array(w.commit()))
    assert(readBack(dir) == Seq(
      (d("2020-03-01"), 7, "rep"), (d("2020-03-02"), 2, "y")))
  }

  private def storeFs(dir: String) =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())

  test("writer lease (r16): a live peer's _writer.lock makes a second " +
      "writer's commit fail loudly; release unblocks it") {
    val dir = freshDir("lease")
    days("l1", ("2020-03-01", 1, "x"))
      .write.format("dailystore").option("path", dir)
      .mode("append").save()
    // simulate writer A mid-commit-window: its lease is live at the
    // moment writer B's commit() tries to enter
    val fs = storeFs(dir)
    val live = new org.apache.hadoop.fs.Path(dir)
    WriterLease.acquire(fs, live, "writer-A", WriterLease.DefaultTtlMs)
    val e = intercept[Exception] {
      days("l2", ("2020-03-02", 2, "y"))
        .write.format("dailystore").option("path", dir)
        .mode("append").save()
    }
    def chain(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10).toSeq
    assert(chain(e).exists(_.isInstanceOf[DailyStoreConcurrentWriteException]),
      s"expected DailyStoreConcurrentWriteException in ${chain(e)}")
    // the failed writer aborted cleanly: no staging dirs or torn files
    assert(!fs.listStatus(live).exists(_.getPath.getName.startsWith("__stage_")))
    assert(readBack(dir) == Seq((d("2020-03-01"), 1, "x")))
    // writer A finishes and releases: writer B's retry succeeds
    WriterLease.release(fs, live, "writer-A")
    days("l3", ("2020-03-02", 2, "y"))
      .write.format("dailystore").option("path", dir)
      .mode("append").save()
    assert(readBack(dir) == Seq(
      (d("2020-03-01"), 1, "x"), (d("2020-03-02"), 2, "y")))
    assert(!fs.exists(WriterLease.lockPath(live)), "lease released after commit")
  }

  test("writer lease (r16): an EXPIRED lock (crashed writer) is taken " +
      "over by the next commit and swept by recovery") {
    val dir = freshDir("lease_exp")
    days("e1", ("2020-03-01", 1, "x"))
      .write.format("dailystore").option("path", dir)
      .mode("append").save()
    val fs = storeFs(dir)
    val live = new org.apache.hadoop.fs.Path(dir)
    val lock = WriterLease.lockPath(live)
    WriterLease.acquire(fs, live, "crashed-writer", WriterLease.DefaultTtlMs)
    // age the lock past the TTL (mtime is the expiry clock)
    fs.setTimes(lock, System.currentTimeMillis() - 2 * WriterLease.DefaultTtlMs, -1)
    // a new write takes the lease over instead of failing
    days("e2", ("2020-03-02", 2, "y"))
      .write.format("dailystore").option("path", dir)
      .mode("append").save()
    assert(readBack(dir) == Seq(
      (d("2020-03-01"), 1, "x"), (d("2020-03-02"), 2, "y")))
    assert(!fs.exists(lock))
    // standalone recovery also self-heals an expired leftover
    WriterLease.acquire(fs, live, "crashed-writer", WriterLease.DefaultTtlMs)
    fs.setTimes(lock, System.currentTimeMillis() - 2 * WriterLease.DefaultTtlMs, -1)
    DailyStoreRecovery.recoverPendingCommits(dir,
      spark.sessionState.newHadoopConf())
    assert(!fs.exists(lock), "recovery sweeps an expired lease")
  }

  test("read cache (r16): commit-state key serves cached listings but " +
      "EVERY write front invalidates — read-after-write stays exact") {
    val root = freshDir("readcache")
    DailyStoreCatalog.register(spark, "dstore_rc", root)
    try {
      spark.sql("CREATE TABLE dstore_rc.cases (d date, n int, " +
        "label string) USING dailystore PARTITIONED BY (d)")
      def readCat() = spark.table("dstore_rc.cases")
        .select("d", "n", "label").orderBy("d", "n")
        .as[(Date, Int, String)].collect().toSeq
      days("rc1", ("2020-03-01", 1, "x"), ("2020-03-02", 2, "y"))
        .writeTo("dstore_rc.cases").append()
      assert(readCat() == Seq(
        (d("2020-03-01"), 1, "x"), (d("2020-03-02"), 2, "y")))
      // no write between reads -> the delegate (and its leaf listing)
      // is REUSED: rebuild count stays flat
      val before = DelegateCache.rebuilds
      readCat(); readCat()
      assert(DelegateCache.rebuilds == before,
        "repeat reads on an unchanged store must hit the cache")
      // append through the catalog front -> next read sees it
      days("rc2", ("2020-03-03", 3, "z")).writeTo("dstore_rc.cases").append()
      assert(readCat().map(_._2) == Seq(1, 2, 3))
      // day-replace -> next read sees the replacement
      days("rc3", ("2020-03-02", 9, "new"))
        .writeTo("dstore_rc.cases").overwritePartitions()
      assert(readCat() == Seq(
        (d("2020-03-01"), 1, "x"), (d("2020-03-02"), 9, "new"),
        (d("2020-03-03"), 3, "z")))
      // path-based writer on the same store -> same invalidation
      days("rc4", ("2020-03-04", 4, "w"))
        .write.format("dailystore").option("path", s"$root/cases")
        .mode("append").save()
      assert(readCat().map(_._2) == Seq(1, 9, 3, 4))
      // OUT-OF-BAND write (plain parquet into a day dir, bypassing the
      // connector) still flips the key: dir mtimes are the signal
      days("rc5", ("2020-03-04", 5, "oob")).drop("d")
        .write.mode("append").parquet(s"$root/cases/d=2020-03-04")
      assert(readCat().map(_._2) == Seq(1, 9, 3, 4, 5))
      // catalog truncate-and-reload (overwrite(true)) -> old days gone
      days("rc_t", ("2020-03-06", 1, "only"))
        .writeTo("dstore_rc.cases").overwrite(lit(true))
      assert(readCat() == Seq((d("2020-03-06"), 1, "only")))
      // conf off -> every resolution rebuilds (the r15 behavior)
      spark.conf.set("spark.sql.dailystore.readCache", "false")
      try {
        days("rc6", ("2020-03-05", 6, "q")).writeTo("dstore_rc.cases").append()
        val b2 = DelegateCache.rebuilds
        readCat(); readCat()
        assert(DelegateCache.rebuilds >= b2 + 2,
          "cache off must rebuild per resolution")
      } finally spark.conf.unset("spark.sql.dailystore.readCache")
    } finally {
      spark.conf.unset("spark.sql.catalog.dstore_rc")
      spark.conf.unset("spark.sql.catalog.dstore_rc.root")
      spark.conf.unset("spark.sql.catalog.dstore_rc.partitionCol")
    }
  }

  test("writer lease (r16): standalone recovery refuses to replay under " +
      "a LIVE foreign lease (a mid-window peer's manifest is not touched)") {
    val dir = freshDir("lease_rec")
    days("r1", ("2020-03-01", 1, "x"))
      .write.format("dailystore").option("path", dir)
      .mode("append").save()
    val fs = storeFs(dir)
    val live = new org.apache.hadoop.fs.Path(dir)
    WriterLease.acquire(fs, live, "live-peer", WriterLease.DefaultTtlMs)
    try intercept[DailyStoreConcurrentWriteException] {
      DailyStoreRecovery.recoverPendingCommits(dir,
        spark.sessionState.newHadoopConf())
    }
    finally WriterLease.release(fs, live, "live-peer")
    // standalone recovery HOLDS the lease while it works (r16 review:
    // inspect-only was a TOCTOU against an entering writer) and
    // releases it after
    DailyStoreRecovery.recoverPendingCommits(dir,
      spark.sessionState.newHadoopConf())
    assert(!fs.exists(WriterLease.lockPath(live)),
      "recovery releases its own lease")
  }

  test("writer lease (r16): a commit that lost its lease mid-window " +
      "(post-TTL takeover) fails loudly via assertHeld") {
    val dir = freshDir("lease_mid")
    days("m1", ("2020-03-01", 1, "x"))
      .write.format("dailystore").option("path", dir)
      .mode("append").save()
    val fs = storeFs(dir)
    val live = new org.apache.hadoop.fs.Path(dir)
    WriterLease.acquire(fs, live, "writer-A", WriterLease.DefaultTtlMs)
    WriterLease.assertHeld(fs, live, "writer-A") // held: no-op
    // simulate the takeover: A's lock expired and B claimed it
    fs.delete(WriterLease.lockPath(live), false)
    WriterLease.acquire(fs, live, "writer-B", WriterLease.DefaultTtlMs)
    val e = intercept[DailyStoreConcurrentWriteException] {
      WriterLease.assertHeld(fs, live, "writer-A")
    }
    assert(e.getMessage.contains("writer-B"), e.getMessage)
    WriterLease.release(fs, live, "writer-B")
  }
}
