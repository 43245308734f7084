package graft.schemas

import org.apache.spark.sql.types._

/** Fixed explicit schemas for the reference-parity pipelines (SURVEY.md §1).
  * The reference's schemas are implicit dict shapes (cv-api.py:107-120,
  * cv-csv.py:48-60, cv.py:60-67); we pin them as `StructType`s — the Spark
  * idiom — with nullable columns for every NA-able field. `age`
  * standardizes on nullable int (cv-api.py:110 semantics; the 'Unknown'
  * sentinel of cv.py:63 becomes null — documented lossy cast).
  */
object Schemas {

  /** GeoJSON Point (datasets/json/florida_counties.json:4-8). */
  val geoPoint: StructType = StructType(Seq(
    StructField("type", StringType, nullable = false),
    StructField("coordinates", ArrayType(DoubleType, containsNull = false),
      nullable = false)))

  /** Normalized case record (cv-api.py:107-120; FIXTURES.md F2). */
  val caseRecord: StructType = StructType(Seq(
    StructField("case_number", IntegerType, nullable = false),
    StructField("county", StringType, nullable = true),
    StructField("age", IntegerType, nullable = true),
    StructField("sex", StringType, nullable = true),
    StructField("travel", StringType, nullable = true),
    StructField("travel_detail", ArrayType(StringType, containsNull = true),
      nullable = true),
    StructField("contact_with_confirmed_case", StringType, nullable = true),
    StructField("jurisdiction", StringType, nullable = true),
    StructField("date_added", DateType, nullable = true),
    StructField("deceased", StringType, nullable = true),
    StructField("location", geoPoint, nullable = true),
    StructField("hospitalized", StringType, nullable = true),
    StructField("ed_visit", StringType, nullable = true)))

  /** Raw 10-column scrape shape, read positionally (cv-csv.py:46-60;
    * FIXTURES.md F1). All strings at the boundary; typing happens in the
    * normalize step.
    */
  val rawCaseCsv: StructType = StructType(
    Seq("case_number", "county", "age", "sex", "travel", "travel_detail",
      "contact_with_confirmed_case", "jurisdiction", "date_added", "deceased")
      .map(StructField(_, StringType, nullable = true)))

  /** Daily stats time series, 3-column CSV variant (cv-csv.py:88-93). */
  val rawStatsCsv: StructType = StructType(Seq(
    StructField("date", StringType, nullable = true),
    StructField("hospitalized", StringType, nullable = true),
    StructField("tests", StringType, nullable = true)))

  /** Daily stats, API variant (cv-api.py:155-165). */
  val dailyStats: StructType = StructType(Seq(
    StructField("date", DateType, nullable = false),
    StructField("tests", IntegerType, nullable = true),
    StructField("new_tests", IntegerType, nullable = true),
    StructField("deaths", IntegerType, nullable = true),
    StructField("new_deaths", IntegerType, nullable = true),
    StructField("deaths_growth", DoubleType, nullable = true),
    StructField("hospitalized", IntegerType, nullable = true),
    StructField("new_hospitalized", IntegerType, nullable = true),
    StructField("hospitalized_growth", DoubleType, nullable = true)))

  /** County dimension (florida_counties.json; FIXTURES.md F4). */
  val county: StructType = StructType(Seq(
    StructField("county", StringType, nullable = false),
    StructField("population", IntegerType, nullable = true),
    StructField("location", geoPoint, nullable = true)))
}
