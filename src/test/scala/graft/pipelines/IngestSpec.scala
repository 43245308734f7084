package graft.pipelines

import java.sql.Date

import graft.SparkSpec
import graft.schemas.Schemas

class IngestSpec extends SparkSpec {

  private def res(name: String): String =
    getClass.getResource(s"/fixtures/$name").getPath

  private lazy val counties = Ingest.readCounties(spark, res("counties.json"))
  private lazy val cases = Ingest.normalizeCases(
    Ingest.readRawCasesCsv(spark, res("raw_cases.csv")), counties)

  test("S5 county dimension loads with the pinned schema") {
    assert(counties.count() == 3)
    val alachua = counties.filter("county = 'Alachua'").head()
    assert(alachua.getAs[Int]("population") == 269043)
    assert(alachua.getAs[org.apache.spark.sql.Row]("location")
      .getAs[String]("type") == "Point")
  }

  test("normalized cases match the unified case-record schema") {
    assert(cases.columns.toSeq == Schemas.caseRecord.fieldNames.toSeq)
    assert(cases.count() == 5)
  }

  test("P2/P7: case_number digit-strip and M/d/yy parse") {
    val r = cases.filter("case_number = 5").head()
    assert(r.getAs[Date]("date_added") == Date.valueOf("2020-03-16"))
    val r1 = cases.filter("case_number = 2").head()
    assert(r1.getAs[Date]("date_added") == Date.valueOf("2020-03-14"))
  }

  test("P3: travel_detail split/trim/title with short-token rule; NA -> null") {
    val r1 = cases.filter("case_number = 1").head()
    assert(r1.getSeq[String](r1.fieldIndex("travel_detail")) ==
      Seq("Canada", "NY", "Mexico"))
    val r2 = cases.filter("case_number = 2").head()
    assert(r2.isNullAt(r2.fieldIndex("travel_detail")))
    val r5 = cases.filter("case_number = 5").head()
    assert(r5.getSeq[String](r5.fieldIndex("travel_detail")) == Seq("fl", "ca"))
  }

  test("P5: empty contact -> Unknown; empty/non-numeric age -> null") {
    val r2 = cases.filter("case_number = 2").head()
    assert(r2.getAs[String]("contact_with_confirmed_case") == "Unknown")
    assert(r2.isNullAt(r2.fieldIndex("age")))
    val r5 = cases.filter("case_number = 5").head()
    assert(r5.isNullAt(r5.fieldIndex("age")))
  }

  test("J1/P15: county location broadcast lookup, missing county -> null") {
    val r1 = cases.filter("case_number = 1").head()
    assert(!r1.isNullAt(r1.fieldIndex("location")))
    val r4 = cases.filter("case_number = 4").head() // county 'Nowhere'
    assert(r4.isNullAt(r4.fieldIndex("location")))
  }

  test("S4/W4: daily stats CSV with lag-derived new_tests (first row lag=0)") {
    import spark.implicits._
    val stats = Ingest.readDailyStatsCsv(spark, res("daily_stats.csv"))
    val got = stats.orderBy("date").select("new_tests").as[Int].collect()
    assert(got.toSeq == Seq(100, 50, 110))
  }

  test("S3: covidtracking daily stats -> other_stats (cv-api.py:141-181)") {
    import spark.implicits._
    val daily = Seq(
      ("FL", 20200326, 1000, 200, 50, 10, 300, 30),
      ("FL", 20200325, 800, 150, 40, 40, 270, 270), // prev deaths/hosp = 0
      ("NY", 20200326, 9999, 999, 99, 9, 999, 99) // filtered out
    ).toDF("state", "date", "totalTestResults", "totalTestResultsIncrease",
      "death", "deathIncrease", "hospitalized", "hospitalizedIncrease")
    val got = Ingest.normalizeOtherStats(daily).orderBy("date")
    assert(got.count() == 2)
    val r26 = got.filter("tests = 1000").head()
    assert(r26.getAs[Date]("date") == Date.valueOf("2020-03-26"))
    assert(r26.getAs[Double]("deaths_growth") == 50.0 / 40.0)
    assert(r26.getAs[Double]("hospitalized_growth") == 300.0 / 270.0)
    val r25 = got.filter("tests = 800").head()
    assert(r25.getAs[Double]("deaths_growth") == 0.0) // prev 0 -> guarded
    assert(r25.getAs[Double]("hospitalized_growth") == 0.0)
  }

  test("S2: JSON pages union + API field mapping (cv-api.py:103-121)") {
    val page1 =
      """{"features":[{"attributes":{"ObjectId":1,"County":"Alachua",
        |"Age":"31","Gender":"Male","Travel_related":"Yes",
        |"Origin":"canada; NY","Contact":"NA","Case_":"Case 1",
        |"Case1":1584057600000,"Died":"NA","Hospitalized":"YES",
        |"EDvisit":"NA"}}]}""".stripMargin.replace("\n", "")
    val page2 =
      """{"features":[
        |{"attributes":{"ObjectId":2,"County":"Broward","Age":"NA",
        |"Gender":"Female","Travel_related":"No","Origin":"NA",
        |"Contact":"yes","Case_":"NA-bad","Case1":1584057600000,
        |"Died":"Yes","Hospitalized":"NA","EDvisit":"yes"}},
        |{"attributes":{"ObjectId":3,"County":"Dade","Age":"52",
        |"Gender":"Female","Travel_related":"No","Origin":"NA",
        |"Contact":"yes","Case_":"Case 3","Case1":1584144000000,
        |"Died":"Yes","Hospitalized":"NA","EDvisit":"yes"}}]}""".stripMargin.replace("\n", "")
    val got = Ingest.fromJsonPages(spark, Seq(page1, page2), counties)
    // ObjectId 2 is dropped by the Case_ NOT LIKE 'NA%' server filter (P14)
    assert(got.count() == 2)
    val r1 = got.filter("case_number = 1").head()
    assert(r1.getAs[Date]("date_added") == Date.valueOf("2020-03-13"))
    assert(r1.getAs[String]("hospitalized") == "Yes") // YES -> title case
    assert(r1.getAs[String]("deceased") == "No") // NA -> No
    assert(r1.getAs[String]("contact_with_confirmed_case") == "No")
    assert(r1.isNullAt(r1.fieldIndex("ed_visit"))) // NA -> null
    val r3 = got.filter("case_number = 3").head()
    assert(r3.getAs[Date]("date_added") == Date.valueOf("2020-03-14"))
    assert(r3.getAs[String]("contact_with_confirmed_case") == "Yes")
    assert(r3.getAs[String]("ed_visit") == "Yes")
    assert(r3.isNullAt(r3.fieldIndex("age")) == false)
  }
}
