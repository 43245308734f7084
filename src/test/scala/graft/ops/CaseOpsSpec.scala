package graft.ops

import java.sql.Date

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CaseOpsSpec extends SparkSpec {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column, input: (String, String)*): Seq[Any] = {
    val df = input.toSeq.toDF("k", "v")
    df.select(c.as("out")).collect().map(_.get(0)).toSeq
  }

  test("P2 digitsToInt strips non-digits; null when no digits (not crash)") {
    val got = Seq("Case 123", "#45a6", "NA", "").toDF("v")
      .select(CaseOps.digitsToInt(col("v"))).collect().map(r => Option(r.get(0)))
    assert(got.toSeq == Seq(Some(123), Some(456), None, None))
  }

  test("P3 splitTrimTitle: title-case only tokens >2 chars; NA -> null") {
    val got = Seq("canada; NY ;united kingdom", "NA", " ", "fl")
      .toDF("v").select(CaseOps.splitTrimTitle(col("v"))).collect()
    assert(got(0).getSeq[String](0) == Seq("Canada", "NY", "United Kingdom"))
    assert(got(1).isNullAt(0))
    assert(got(2).isNullAt(0))
    assert(got(3).getSeq[String](0) == Seq("fl")) // 2 chars: untouched
  }

  test("P5 naTo / emptyToUnknown sentinel table") {
    val vals = Seq("NA", "Yes", "", "  ").toDF("v")
    val na = vals.select(CaseOps.naTo(col("v"), lit("No"))).as[String].collect()
    assert(na.toSeq == Seq("No", "Yes", "", "  "))
    val unk = vals.select(CaseOps.emptyToUnknown(col("v"))).as[String].collect()
    assert(unk.toSeq == Seq("NA", "Yes", "Unknown", "Unknown"))
  }

  test("P6 epochMsToDate truncates to the UTC day") {
    // 2020-03-26 23:59:59.999 UTC
    val ms = 1585267199999L
    val got = Seq(ms).toDF("v")
      .select(CaseOps.epochMsToDate(col("v"))).as[Date].head()
    assert(got == Date.valueOf("2020-03-26"))
  }

  test("P7 parseDateMdy handles 1- and 2-digit fields, 20xx years") {
    val got = Seq("3/13/20", "03/07/20", "12/1/20").toDF("v")
      .select(CaseOps.parseDateMdy(col("v"))).as[Date].collect()
    assert(got.toSeq == Seq(Date.valueOf("2020-03-13"),
      Date.valueOf("2020-03-07"), Date.valueOf("2020-12-01")))
  }

  test("P8 parseDateYmd parses int-encoded dates") {
    val got = Seq(20200326).toDF("v")
      .select(CaseOps.parseDateYmd(col("v"))).as[Date].head()
    assert(got == Date.valueOf("2020-03-26"))
  }

  test("P9 guardedRatio: total/prev when prev>0 else 0") {
    val df = Seq((10, 5), (10, 0), (3, 2)).toDF("total", "prev")
    val got = df.select(CaseOps.guardedRatio(col("total"), col("prev")))
      .as[Double].collect()
    assert(got.toSeq == Seq(2.0, 0.0, 1.5))
  }

  test("P10 per1000: round(count/(pop/1000), 2)") {
    val df = Seq((127L, 21477737L)).toDF("count", "pop")
    val got = df.select(CaseOps.per1000(col("count"), col("pop")))
      .as[Double].head()
    assert(got == 0.01) // 127 / 21477.737 = 0.005912... -> rounds to 0.01
  }

  test("P4 titleCase matches Python str.title for plain words") {
    val got = Seq("yes", "UNKNOWN", "no").toDF("v")
      .select(CaseOps.titleCase(col("v"))).as[String].collect()
    assert(got.toSeq == Seq("Yes", "Unknown", "No"))
  }
}
