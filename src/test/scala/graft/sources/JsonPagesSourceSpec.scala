package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.pipelines.Ingest

class JsonPagesSourceSpec extends SparkSpec {

  private def attrs(id: Int, county: String, case_ : String, ms: Long) =
    s"""{"attributes":{"ObjectId":$id,"County":"$county","Age":"3$id",
       |"Gender":"Male","Travel_related":"No","Origin":"NA",
       |"Contact":"NA","Case_":"$case_","Case1":$ms,"Died":"No",
       |"Hospitalized":"NA","EDvisit":"NA"}}""".stripMargin.replace("\n", "")

  private lazy val pagesDir: String = {
    val dir = Files.createTempDirectory("graft-pages")
    Files.writeString(dir.resolve("page-000.json"),
      s"""{"features":[${attrs(1, "Alachua", "Case 1", 1584057600000L)},
         |${attrs(2, "Broward", "NA-x", 1584057600000L)}]}""".stripMargin.replace("\n", ""))
    Files.writeString(dir.resolve("page-001.json"),
      s"""{"features":[${attrs(3, "Dade", "Case 3", 1584144000000L)}]}""")
    dir.toString
  }

  private lazy val df = spark.read.format("jsonpages").load(pagesDir)

  test("pages read in parallel partitions and union to one table") {
    assert(df.count() == 3)
    assert(df.rdd.getNumPartitions == 2) // one per page file
    assert(df.select("ObjectId").orderBy("ObjectId")
      .collect().map(_.getInt(0)).toSeq == Seq(1, 2, 3))
  }

  test("column pruning reaches the reader (outFields analog)") {
    val plan = df.select("County").queryExecution.executedPlan.toString
    // BatchScan output pruned to the single required column
    assert(plan.contains("[County#"))
    assert(!plan.contains("ObjectId#"))
  }

  test("NOT LIKE 'NA%' pushes into the source (where analog)") {
    val filtered = df.filter(!col("Case_").like("NA%"))
    val scan = filtered.queryExecution.executedPlan.toString
    assert(scan.contains("StringStartsWith(Case_,NA)"))
    assert(filtered.count() == 2) // ObjectId 2 dropped inside the reader
  }

  test("numeric comparison pushdown (incremental watermark shape)") {
    val got = df.filter(col("ObjectId") > 1).select("ObjectId")
      .orderBy("ObjectId").collect().map(_.getInt(0))
    assert(got.toSeq == Seq(2, 3))
  }

  test("end-to-end: DSv2 pages -> normalized case records") {
    val counties = Ingest.readCounties(spark,
      getClass.getResource("/fixtures/counties.json").getPath)
    val cases = Ingest.fromJsonPagesDir(spark, pagesDir, counties)
      .orderBy("case_number")
    val rows = cases.collect()
    assert(rows.map(_.getAs[Int]("case_number")).toSeq == Seq(1, 3))
    assert(rows.head.getAs[java.sql.Date]("date_added") ==
      java.sql.Date.valueOf("2020-03-13"))
  }
}
