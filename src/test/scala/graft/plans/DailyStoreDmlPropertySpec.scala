package graft.plans

import java.sql.Date

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.TestSession

/** ScalaCheck pin of the SQL DML surface ([[DailyStoreDml]]): for ANY
  * sequence of INSERT / MERGE-replace / UPDATE (value or day-move) /
  * keyed MERGE-DELETE / whole-day DELETE statements against a catalog
  * dailystore table, the store's contents equal a trivial in-memory
  * model applying the declared semantics, and the on-disk day
  * directories equal the model's day set (emptied days are REMOVED,
  * never left stale). Every mutation goes through `spark.sql` — the
  * analyzer rule, the copy-on-write commits, and their interleavings
  * are what's under test, across multi-day batches, duplicate keys
  * introduced by plain INSERT, and day moves.
  */
object DailyStoreDmlPropertySpec extends Properties("DailyStoreDml") {
  private lazy val spark = TestSession.spark
  import spark.implicits._

  // 8 random sequences per CI run keeps the suite fast; deeper soaks
  // (bug hunts, post-refactor confidence) set GRAFT_PROP_N — the r20
  // emptied-store wedge was found by exactly this kind of repetition
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(
      sys.env.get("GRAFT_PROP_N").map(_.toInt).getOrElse(8))

  private val seq = new java.util.concurrent.atomic.AtomicInteger(0)
  private val day0 = Date.valueOf("2021-06-01").toLocalDate
  private def dayStr(d: Int) = day0.plusDays(d.toLong).toString

  private type R = (Int, Int, Int) // (dayOffset, k, v)

  sealed private trait Op
  private case class Insert(rows: Seq[R]) extends Op
  private case class MergeReplace(rows: Seq[R]) extends Op
  private case class MergeGeneral(rows: Seq[R]) extends Op
  private case class UpdateVal(k: Int, dv: Int) extends Op
  private case class UpdateDay(k: Int, d: Int) extends Op
  private case class DeleteKeys(ks: Seq[Int]) extends Op
  private case class DeleteDay(d: Int) extends Op

  private val rowGen: Gen[R] = for {
    d <- Gen.chooseNum(0, 3)
    k <- Gen.chooseNum(0, 8)
    v <- Gen.chooseNum(0, 999)
  } yield (d, k, v)

  private val opGen: Gen[Op] = Gen.oneOf(
    Gen.listOfN(3, rowGen).map(Insert(_)),
    // one row per key: the merge contract
    Gen.listOfN(4, rowGen)
      .map(rs => MergeReplace(rs.groupBy(_._2).values.map(_.head).toSeq)),
    // the r20 general shape: conditional partial UPDATE + conditional
    // INSERT (one row per key, same cardinality contract)
    Gen.listOfN(4, rowGen)
      .map(rs => MergeGeneral(rs.groupBy(_._2).values.map(_.head).toSeq)),
    for { k <- Gen.chooseNum(0, 8); dv <- Gen.chooseNum(1, 50) }
      yield UpdateVal(k, dv),
    for { k <- Gen.chooseNum(0, 8); d <- Gen.chooseNum(0, 3) }
      yield UpdateDay(k, d),
    Gen.listOfN(2, Gen.chooseNum(0, 8)).map(DeleteKeys(_)),
    Gen.chooseNum(0, 3).map(DeleteDay(_)))

  property("any SQL DML sequence matches the model; day dirs match " +
    "the model's day set") =
    forAll(for {
      seed <- Gen.listOfN(4, rowGen)
      ops <- Gen.listOfN(5, opGen)
    } yield (seed, ops)) { case (seed, ops) =>
      val n = seq.incrementAndGet()
      val root = new java.io.File(sys.props("java.io.tmpdir"),
        s"dsdmlprop_${n}_${System.nanoTime()}").getPath
      new java.io.File(root, "t").mkdirs()
      val path = s"$root/t"
      graft.sources.DailyStoreCatalog.register(spark, s"dmlprop$n", root)
      val tbl = s"dmlprop$n.t"
      def toDf(rs: Seq[R]) = rs.map { case (d, k, v) =>
        (Date.valueOf(day0.plusDays(d.toLong)), k, v)
      }.toDF("d", "k", "v").repartition(2)
      // seed so the catalog table resolves (an empty store has no schema)
      toDf(seed).write.format("dailystore").option("path", path)
        .option("partitionCol", "d").mode("append").save()
      var model: Vector[R] = seed.toVector
      ops.zipWithIndex.foreach { case (op, i) =>
        op match {
          case Insert(rows) =>
            val values = rows.map { case (d, k, v) =>
              s"($k, $v, DATE'${dayStr(d)}')" }.mkString(", ")
            spark.sql(s"INSERT INTO $tbl VALUES $values")
            model = model ++ rows
          case MergeReplace(rows) =>
            toDf(rows).createOrReplaceTempView(s"dmlprop_src_${n}_$i")
            val ks = rows.map(_._2).toSet
            // the SQL front's cardinality guard (r20): a matched target
            // key with same-key copies in the store fails the statement
            // LOUDLY (keyed replace would collapse the copies, diverging
            // from SQL MERGE's update-each-copy rule) — and a failed
            // statement must leave the store untouched, which the final
            // model comparison then verifies
            val dupMatched = model.groupBy(_._2)
              .exists { case (k, copies) => ks(k) && copies.size > 1 }
            def run() = spark.sql(
              s"""MERGE INTO $tbl USING dmlprop_src_${n}_$i s
                 |ON $tbl.k = s.k
                 |WHEN MATCHED THEN UPDATE SET *
                 |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
            if (dupMatched) {
              val msg = try { run(); "" }
                catch { case e: Throwable => String.valueOf(e.getMessage) }
              require(msg.contains("same-key copies"),
                s"expected the loud duplicate-copy failure, got: '$msg'")
              // model unchanged: the guarded statement must not commit
            } else {
              run()
              model = model.filterNot(r => ks(r._2)) ++ rows
            }
          case MergeGeneral(rows) =>
            // WHEN MATCHED AND s.v even -> partial UPDATE SET v = s.v
            // (updates EACH same-key copy, copies keep their day);
            // WHEN NOT MATCHED AND s.v % 3 = 0 -> INSERT * — the r20
            // general path: discovery, per-column IF rewrite, source-key
            // anti-joined insert, all under the same commit machinery
            toDf(rows).createOrReplaceTempView(s"dmlprop_gen_${n}_$i")
            spark.sql(
              s"""MERGE INTO $tbl USING dmlprop_gen_${n}_$i s
                 |ON $tbl.k = s.k
                 |WHEN MATCHED AND s.v % 2 = 0 THEN UPDATE SET v = s.v
                 |WHEN NOT MATCHED AND s.v % 3 = 0 THEN INSERT *""".stripMargin)
            val byKey = rows.map(r => r._2 -> r).toMap
            val matched = model.map(_._2).toSet
            model = model.map { r =>
              byKey.get(r._2) match {
                case Some((_, _, v)) if v % 2 == 0 => (r._1, r._2, v)
                case _ => r
              }
            } ++ rows.filter(r => !matched(r._2) && r._3 % 3 == 0)
          case UpdateVal(k, dv) =>
            spark.sql(s"UPDATE $tbl SET v = v + $dv WHERE k = $k")
            model = model.map(r =>
              if (r._2 == k) (r._1, r._2, r._3 + dv) else r)
          case UpdateDay(k, d) =>
            spark.sql(
              s"UPDATE $tbl SET d = DATE'${dayStr(d)}' WHERE k = $k")
            model = model.map(r =>
              if (r._2 == k) (d, r._2, r._3) else r)
          case DeleteKeys(ks) =>
            ks.distinct.toDF("k")
              .createOrReplaceTempView(s"dmlprop_del_${n}_$i")
            spark.sql(
              s"""MERGE INTO $tbl USING dmlprop_del_${n}_$i s
                 |ON $tbl.k = s.k
                 |WHEN MATCHED THEN DELETE""".stripMargin)
            val del = ks.toSet
            model = model.filterNot(r => del(r._2))
          case DeleteDay(d) =>
            spark.sql(s"DELETE FROM $tbl WHERE d = DATE'${dayStr(d)}'")
            model = model.filterNot(_._1 == d)
        }
      }
      val got: Seq[R] =
        if (model.isEmpty) Nil
        else spark.read.parquet(path)
          .select(datediff(col("d"), lit(Date.valueOf(day0))).as("d"),
            col("k"), col("v"))
          .as[(Int, Int, Int)].collect().toSeq
      val want = model
      val dirsOnDisk = Option(new java.io.File(path).listFiles())
        .getOrElse(Array.empty)
        .filter(f => f.isDirectory && f.getName.startsWith("d="))
        .map(_.getName.stripPrefix("d=")).toSet
      val modelDays = model.map(r => dayStr(r._1)).toSet
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
      val ok = got.sorted == want.sorted && dirsOnDisk == modelDays
      if (!ok)
        println(s"[dml-prop] seed=$seed ops=$ops\n got=${got.sorted}\n" +
          s"want=${want.sorted}\n dirs=$dirsOnDisk modelDays=$modelDays")
      ok
    }
}
