package graft.sources

import java.sql.Date

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.TestSession

/** ScalaCheck pin of the dailystore connector's replace semantics: for
  * ANY sequence of writes (append / static overwrite / dynamic day
  * overwrite) over ANY day/row batches, the store's contents equal a
  * trivial in-memory model applying the declared semantics —
  *   append:  model ++= batch
  *   static:  model := batch
  *   dynamic: model := model -- batch.days ++ batch
  * The property holds regardless of batch partitioning (each write runs
  * through the engine's clustered-distribution plan), multi-day batches,
  * repeated days inside a batch, and interleavings of the three modes.
  */
object DailyStorePropertySpec extends Properties("DailyStore") {
  private lazy val spark = TestSession.spark
  import spark.implicits._

  // 8 random sequences per CI run keeps the suite fast; deeper soaks
  // (bug hunts, post-refactor confidence) set GRAFT_PROP_N — the r20
  // emptied-store wedge was found by exactly this kind of repetition
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(
      sys.env.get("GRAFT_PROP_N").map(_.toInt).getOrElse(8))

  private val seq = new java.util.concurrent.atomic.AtomicInteger(0)

  private val day0 = Date.valueOf("2020-03-01").toLocalDate

  sealed private trait Op { def rows: Seq[(Int, Int)] } // (dayOffset, n)
  private case class Append(rows: Seq[(Int, Int)]) extends Op
  private case class Static(rows: Seq[(Int, Int)]) extends Op
  private case class Dynamic(rows: Seq[(Int, Int)]) extends Op

  private val rowGen: Gen[(Int, Int)] = for {
    d <- Gen.chooseNum(0, 5) // six days in play
    n <- Gen.chooseNum(0, 1000)
  } yield (d, n)

  private val opGen: Gen[Op] = for {
    k <- Gen.chooseNum(1, 8)
    rows <- Gen.listOfN(k, rowGen)
    op <- Gen.oneOf[Seq[(Int, Int)] => Op](Append(_), Static(_), Dynamic(_))
  } yield op(rows)

  private def toDf(rows: Seq[(Int, Int)]) =
    rows.map { case (d, n) =>
      (Date.valueOf(day0.plusDays(d.toLong)), n)
    }.toDF("d", "n").repartition(3) // multi-partition input every time

  /** r15 recovery property: for ANY seeded store, ANY staged
    * replacement write, ANY condemned-day set, and a crash after ANY
    * number of the deletes and ANY number of the renames have run, the
    * manifest replay lands on exactly the committed end state:
    *   final = seed minus condemned-day rows ++ staged rows.
    * (Stricter than the real commit, which orders all deletes before
    * any rename — the replay rule is order-independent, so the
    * property interleaves them arbitrarily.)
    */
  property("manifest replay from ANY crash point = the committed state") =
    forAll(for {
      seedRows <- Gen.listOfN(6, rowGen)
      stagedRows <- Gen.listOfN(4, rowGen)
      condemned <- Gen.listOf(Gen.chooseNum(0, 5)).map(_.toSet)
      k <- Gen.chooseNum(0, 6) // deletes executed before the crash
      m <- Gen.chooseNum(0, 4) // renames executed before the crash
    } yield (seedRows, stagedRows, condemned, k, m)) {
      case (seedRows, stagedRows, condemned, k, m) =>
        val hconf = spark.sessionState.newHadoopConf()
        val dir = new java.io.File(sys.props("java.io.tmpdir"),
          s"dailystore_recov_${seq.incrementAndGet()}_${System.nanoTime()}")
          .getPath
        val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(hconf)
        def dayStr(d: Int) = day0.plusDays(d.toLong).toString
        // seed the live store and a source for the staged files
        toDf(seedRows).write.format("dailystore").option("path", dir)
          .mode("append").save()
        val src = dir + "_src"
        toDf(stagedRows).write.format("dailystore").option("path", src)
          .mode("append").save()
        // move the source's per-day files into this commit's staging
        val stagingName = "__stage_prop"
        val files: Seq[(String, String)] =
          stagedRows.map(_._1).distinct.sorted.zipWithIndex.map {
            case (d, i) =>
              val pv = dayStr(d)
              val f = new java.io.File(s"$src/d=$pv").listFiles()
                .filter(_.getName.endsWith(".parquet")).head
              val name = s"part-prop-$i.parquet"
              fs.mkdirs(new org.apache.hadoop.fs.Path(s"$dir/$stagingName/d=$pv"))
              fs.rename(new org.apache.hadoop.fs.Path(f.getPath),
                new org.apache.hadoop.fs.Path(s"$dir/$stagingName/d=$pv/$name"))
              (pv, name)
          }
        val condemnedDirs = condemned.toSeq.sorted.map(d => s"d=${dayStr(d)}")
        DailyStoreRecovery.writeManifest(fs,
          DailyStoreRecovery.manifestPath(
            new org.apache.hadoop.fs.Path(dir), "prop"),
          "d", stagingName, condemnedDirs, files)
        // crash simulation: k deletes, then m renames, then nothing
        condemnedDirs.take(k).foreach(cd =>
          fs.delete(new org.apache.hadoop.fs.Path(s"$dir/$cd"), true))
        files.take(m).foreach { case (pv, name) =>
          val from = new org.apache.hadoop.fs.Path(
            s"$dir/$stagingName/d=$pv/$name")
          if (fs.exists(from)) {
            fs.mkdirs(new org.apache.hadoop.fs.Path(s"$dir/d=$pv"))
            fs.rename(from,
              new org.apache.hadoop.fs.Path(s"$dir/d=$pv/$name"))
          }
        }
        DailyStoreRecovery.recoverPendingCommits(dir, hconf)
        val got = spark.read.parquet(dir)
          .select(datediff(col("d"), lit(Date.valueOf(day0))).as("d"), col("n"))
          .as[(Int, Int)].collect().sorted.toSeq
        val want = (seedRows.filterNot(r => condemned(r._1)) ++ stagedRows)
          .sorted.toSeq
        val manifestsLeft = new java.io.File(dir).listFiles()
          .count(_.getName.startsWith("_commit-"))
        val stagingLeft = new java.io.File(dir, stagingName).exists()
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(src))
        if (got != want || manifestsLeft != 0 || stagingLeft)
          println(s"[dailystore-recov] condemned=$condemned k=$k m=$m\n" +
            s" got=$got\nwant=$want manifests=$manifestsLeft staging=$stagingLeft")
        got == want && manifestsLeft == 0 && !stagingLeft
    }

  property("any append/static/dynamic sequence matches the model") =
    forAll(Gen.listOfN(5, opGen)) { ops =>
      val dir = new java.io.File(sys.props("java.io.tmpdir"),
        s"dailystore_prop_${seq.incrementAndGet()}_${System.nanoTime()}")
        .getPath
      var model = Vector.empty[(Int, Int)]
      ops.foreach { op =>
        val w = toDf(op.rows).write.format("dailystore").option("path", dir)
        op match {
          case Append(rows) =>
            w.mode("append").save()
            model = model ++ rows
          case Static(rows) =>
            w.mode("overwrite").save()
            model = rows.toVector
          case Dynamic(rows) =>
            w.option("partitionOverwriteMode", "dynamic")
              .mode("overwrite").save()
            val touched = rows.map(_._1).toSet
            model = model.filterNot(r => touched(r._1)) ++ rows
        }
      }
      val got = spark.read.parquet(dir)
        .select(datediff(col("d"), lit(Date.valueOf(day0))).as("d"), col("n"))
        .as[(Int, Int)].collect().sorted.toSeq
      val want = model.sorted.toSeq
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
      if (got != want)
        println(s"[dailystore-prop] ops=$ops\n got=$got\nwant=$want")
      got == want
    }

  /** r16 time-travel property: on a retention-enabled store, for ANY
    * sequence of append/static/dynamic commits, `readVersion(n)` equals
    * the model's snapshot n commits back, for EVERY n from 0 (current)
    * to the full history — the manifest set algebra (remove each rolled
    * commit's added files, restore its archived ones) reconstructs
    * every retained state exactly, across mode interleavings, multi-day
    * batches, and repeated days.
    */
  property("time travel: readVersion(n) = the model n commits back") =
    forAll(Gen.listOfN(4, opGen)) { ops =>
      val dir = new java.io.File(sys.props("java.io.tmpdir"),
        s"dailystore_tt_${seq.incrementAndGet()}_${System.nanoTime()}")
        .getPath
      DailyStoreTimeTravel.enable(spark, dir, keep = 16)
      var model = Vector.empty[(Int, Int)]
      var snapshots = Vector(model) // snapshots(i) = state after i commits
      ops.foreach { op =>
        val w = toDf(op.rows).write.format("dailystore").option("path", dir)
        op match {
          case Append(rows) =>
            w.mode("append").save()
            model = model ++ rows
          case Static(rows) =>
            w.mode("overwrite").save()
            model = rows.toVector
          case Dynamic(rows) =>
            w.option("partitionOverwriteMode", "dynamic")
              .mode("overwrite").save()
            val touched = rows.map(_._1).toSet
            model = model.filterNot(r => touched(r._1)) ++ rows
        }
        snapshots :+= model
      }
      val results = (0 to ops.length).map { back =>
        val got = DailyStoreTimeTravel.readVersion(spark, dir, back)
          .select(datediff(col("d"), lit(Date.valueOf(day0))).as("d"),
            col("n"))
          .as[(Int, Int)].collect().sorted.toSeq
        val want = snapshots(snapshots.length - 1 - back).sorted.toSeq
        (back, got, want)
      }
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
      val bad = results.filter(r => r._2 != r._3)
      if (bad.nonEmpty)
        println(s"[dailystore-tt] ops=$ops\n bad=$bad")
      bad.isEmpty
    }

  // ---- r19: copy-on-write mergeByKey ------------------------------
  // rows are (day, key, value); the store may hold a key on ANY day,
  // and an update may MOVE a key to a new day — the case the
  // discovery scan exists for.
  private val mergeRowGen: Gen[(Int, Int, Int)] = for {
    d <- Gen.chooseNum(0, 5)
    k <- Gen.chooseNum(0, 15)
    v <- Gen.chooseNum(0, 1000)
  } yield (d, k, v)

  private def toKeyedDf(rows: Seq[(Int, Int, Int)]) =
    rows.map { case (d, k, v) =>
      (Date.valueOf(day0.plusDays(d.toLong)), k, v)
    }.toDF("d", "k", "v").repartition(3)

  private def readKeyed(dir: String): Seq[(Int, Int, Int)] =
    spark.read.parquet(dir)
      .select(datediff(col("d"), lit(Date.valueOf(day0))).as("d"),
        col("k"), col("v"))
      .as[(Int, Int, Int)].collect().sorted.toSeq

  /** r19 merge property: for ANY seeded store (keys may repeat across
    * days — a bag store) and ANY update batch (one row per key; keys
    * may keep their day, move days, or be brand new), mergeByKey lands
    * on exactly the keyed-replace model:
    *   final = store rows whose key is not updated ++ updates.
    * This covers in-place replaces, cross-day moves (every old copy
    * must vanish, found by the discovery scan), inserts into new days,
    * and days emptied by moves (condemned, not left stale).
    */
  property("mergeByKey = keyed-replace model for ANY store and updates") =
    forAll(for {
      seedRows <- Gen.listOfN(8, mergeRowGen)
      updRows <- Gen.listOfN(5, mergeRowGen)
    } yield (seedRows, updRows)) { case (seedRows, updRows0) =>
      // one row per key in the updates (the merge contract)
      val updRows = updRows0.groupBy(_._2).values.map(_.head).toSeq
      val dir = new java.io.File(sys.props("java.io.tmpdir"),
        s"dailystore_merge_${seq.incrementAndGet()}_${System.nanoTime()}")
        .getPath
      toKeyedDf(seedRows).write.format("dailystore").option("path", dir)
        .mode("append").save()
      DailyStoreMerge.mergeByKey(spark, dir, toKeyedDf(updRows), key = "k")
      val got = readKeyed(dir)
      val updKeys = updRows.map(_._2).toSet
      val want = (seedRows.filterNot(r => updKeys(r._2)) ++ updRows)
        .sorted.toSeq
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
      if (got != want)
        println(s"[dailystore-merge] seed=$seedRows upd=$updRows\n" +
          s" got=$got\nwant=$want")
      got == want
    }

  /** r19 merge crash-replay property: a merge commit's decided state is
    * (manifest: condemned = the touched days — including days the
    * OUTPUT never mentions, emptied by key moves — plus the staged
    * per-day files of the merged content). For ANY (seed, updates) and
    * a crash after ANY number of the deletes and ANY number of the
    * renames, replay lands on exactly the completed merge's
    * keyed-replace state. This is the manifest-replay property
    * specialized to the merge SHAPE: condemned days with zero staged
    * files (all rows moved out) and staged files landing in days the
    * condemned set never names (pure inserts).
    */
  property("merge-shaped manifest replay from ANY crash point = " +
    "the merged state") =
    forAll(for {
      seedRows <- Gen.listOfN(8, mergeRowGen)
      updRows <- Gen.listOfN(5, mergeRowGen)
      k <- Gen.chooseNum(0, 6)
      m <- Gen.chooseNum(0, 5)
    } yield (seedRows, updRows, k, m)) { case (seedRows, updRows0, k, m) =>
      val updRows = updRows0.groupBy(_._2).values.map(_.head).toSeq
      val hconf = spark.sessionState.newHadoopConf()
      val dir = new java.io.File(sys.props("java.io.tmpdir"),
        s"dailystore_mergecrash_${seq.incrementAndGet()}_${System.nanoTime()}")
        .getPath
      val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(hconf)
      def dayStr(dd: Int) = day0.plusDays(dd.toLong).toString
      toKeyedDf(seedRows).write.format("dailystore").option("path", dir)
        .mode("append").save()
      // the merge's decided state, built from the model exactly as
      // mergeByKey's ValuesMode commit builds it: touched = days where
      // updated keys live ∪ the updates' days; staged = merged rows of
      // the touched days
      val updKeys = updRows.map(_._2).toSet
      val touched = (seedRows.filter(r => updKeys(r._2)).map(_._1) ++
        updRows.map(_._1)).distinct.sorted
      val stagedRows = (seedRows.filterNot(r => updKeys(r._2)) ++ updRows)
        .filter(r => touched.contains(r._1))
      val src = dir + "_src"
      if (stagedRows.nonEmpty)
        toKeyedDf(stagedRows).write.format("dailystore").option("path", src)
          .mode("append").save()
      val stagingName = "__stage_mergeprop"
      val files: Seq[(String, String)] =
        stagedRows.map(_._1).distinct.sorted.zipWithIndex.map {
          case (dd, i) =>
            val pv = dayStr(dd)
            val f = new java.io.File(s"$src/d=$pv").listFiles()
              .filter(_.getName.endsWith(".parquet")).head
            val name = s"part-mergeprop-$i.parquet"
            fs.mkdirs(new org.apache.hadoop.fs.Path(
              s"$dir/$stagingName/d=$pv"))
            fs.rename(new org.apache.hadoop.fs.Path(f.getPath),
              new org.apache.hadoop.fs.Path(s"$dir/$stagingName/d=$pv/$name"))
            (pv, name)
        }
      val condemnedDirs = touched.map(dd => s"d=${dayStr(dd)}")
      DailyStoreRecovery.writeManifest(fs,
        DailyStoreRecovery.manifestPath(
          new org.apache.hadoop.fs.Path(dir), "mergeprop"),
        "d", stagingName, condemnedDirs, files)
      // crash: k of the deletes ran, then m of the renames, then nothing
      condemnedDirs.take(k).foreach(cd =>
        fs.delete(new org.apache.hadoop.fs.Path(s"$dir/$cd"), true))
      files.take(m).foreach { case (pv, name) =>
        val from = new org.apache.hadoop.fs.Path(
          s"$dir/$stagingName/d=$pv/$name")
        if (fs.exists(from)) {
          fs.mkdirs(new org.apache.hadoop.fs.Path(s"$dir/d=$pv"))
          fs.rename(from, new org.apache.hadoop.fs.Path(s"$dir/d=$pv/$name"))
        }
      }
      DailyStoreRecovery.recoverPendingCommits(dir, hconf)
      val got = readKeyed(dir)
      val want = (seedRows.filterNot(r => updKeys(r._2)) ++ updRows)
        .sorted.toSeq
      val manifestsLeft = new java.io.File(dir).listFiles()
        .count(_.getName.startsWith("_commit-"))
      val stagingLeft = new java.io.File(dir, stagingName).exists()
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(src))
      if (got != want || manifestsLeft != 0 || stagingLeft)
        println(s"[dailystore-mergecrash] seed=$seedRows upd=$updRows " +
          s"k=$k m=$m\n got=$got\nwant=$want manifests=$manifestsLeft " +
          s"staging=$stagingLeft")
      got == want && manifestsLeft == 0 && !stagingLeft
    }
}
