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

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

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
}
