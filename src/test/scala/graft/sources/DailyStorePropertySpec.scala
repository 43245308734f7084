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
}
