package graft.catalog

import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.CaseOps

/** Scalar/projection operator coverage (SURVEY.md §2.2 P-ops) exercised on
  * the harness tables. All expressions are codegen'd builtins (no UDFs),
  * so they stay inside WholeStageCodegen and reach the parquet scan as
  * pushed filters where applicable.
  */
object ScalarQueries {

  val all: Map[String, Q] = Map(

    // ----- P2: regex digit extraction (cv.py:61, cv-csv.py:49) -----
    "q20_regex_extract" -> Q(
      (s, dir) => Tables(s, dir, "orders")
        .select(col("o_orderkey"),
          CaseOps.digitsToInt(col("o_orderpriority")).as("prio"))
        .orderBy("o_orderkey"),
      // DuckDB needs the 'g' flag to match Spark's replace-all semantics.
      Some(
        """SELECT o_orderkey,
          |  CAST(NULLIF(REGEXP_REPLACE(o_orderpriority, '[^0-9]', '', 'g'), '') AS INTEGER) AS prio
          |FROM orders ORDER BY o_orderkey""".stripMargin),
      "P2 strip non-digits -> int"),

    // ----- P3+P4: split/trim/title-case array (cv-api.py:106) -----
    // Synthesizes a ';'-separated value (the COVID travel_detail shape) from
    // part columns; the <=2-char token keeps its case ("NY" rule). The array
    // is serialized with array_join so Spark arrays and DuckDB lists hash
    // identically.
    "q21_split_title" -> Q(
      (s, dir) => Tables(s, dir, "part")
        .select(col("p_partkey"),
          array_join(CaseOps.splitTrimTitle(
            concat_ws(";", col("p_brand"), col("p_type"), lit("ab"))), "|")
            .as("detail"))
        .orderBy("p_partkey"),
      // initcap emulated portably: upper(first) || lower(rest) per token
      // (tokens contain no inner spaces here).
      Some(
        """SELECT p_partkey,
          |  ARRAY_TO_STRING(LIST_TRANSFORM(
          |    STRING_SPLIT(CONCAT(p_brand, ';', p_type, ';', 'ab'), ';'),
          |    x -> CASE WHEN LENGTH(TRIM(x)) > 2
          |              THEN UPPER(SUBSTRING(TRIM(x), 1, 1)) || LOWER(SUBSTRING(TRIM(x), 2))
          |              ELSE TRIM(x) END), '|') AS detail
          |FROM part ORDER BY p_partkey""".stripMargin),
      "P3 split+trim+conditional initcap"),

    // ----- P5: sentinel normalization (cv-api.py:110-119) -----
    "q22_sentinels" -> Q(
      (s, dir) => Tables(s, dir, "orders")
        .select(col("o_orderkey"),
          when(col("o_orderstatus") === "O", lit("Open"))
            .when(col("o_orderstatus") === "F", lit("Filled"))
            .otherwise(lit("Unknown")).as("status"))
        .orderBy("o_orderkey"),
      Some(
        """SELECT o_orderkey,
          |  CASE WHEN o_orderstatus = 'O' THEN 'Open'
          |       WHEN o_orderstatus = 'F' THEN 'Filled'
          |       ELSE 'Unknown' END AS status
          |FROM orders ORDER BY o_orderkey""".stripMargin),
      "P5 sentinel -> canonical value mapping"),

    // ----- P8: string-date parse yyyyMMdd (cv-api.py:156) -----
    "q23_date_parse" -> Q(
      (s, dir) => Tables(s, dir, "orders")
        .select(col("o_orderkey"),
          CaseOps.parseDateYmd(date_format(col("o_orderdate"), "yyyyMMdd"))
            .as("parsed"))
        .orderBy("o_orderkey"),
      Some(
        """SELECT o_orderkey,
          |  CAST(STRPTIME(STRFTIME(o_orderdate, '%Y%m%d'), '%Y%m%d') AS DATE) AS parsed
          |FROM orders ORDER BY o_orderkey""".stripMargin),
      "P8 round-trip parse of int-encoded date"),

    // ----- P9: guarded growth ratio (cv-api.py:161,164) -----
    "q24_guarded_ratio" -> Q(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val daily = graft.ops.Analytics.dailyCounts(
          Tables(s, dir, "orders"), col("o_orderdate"))
        daily
          .withColumn("prev", lag(col("n"), 1, 0).over(Window.orderBy("d")))
          .select(col("d"),
            CaseOps.guardedRatio(col("n"), col("prev")).as("growth"))
          .orderBy("d")
      },
      Some(
        """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS d, COUNT(*) AS n FROM orders GROUP BY 1),
          |lagged AS (SELECT d, n, LAG(n, 1, 0) OVER (ORDER BY d) AS prev FROM daily)
          |SELECT d, CASE WHEN prev > 0 THEN n / prev ELSE CAST(0 AS DOUBLE) END AS growth
          |FROM lagged ORDER BY d""".stripMargin),
      "P9 total/prev guarded by prev>0"),

    // ----- P12/P13: equality + date-range filters (cv-stats.py:34-35) -----
    "q25_filter_range" -> Q(
      (s, dir) => Tables(s, dir, "orders")
        .filter(to_date(col("o_orderdate")) >= lit("2000-01-01").cast("date") &&
          to_date(col("o_orderdate")) < lit("2001-01-01").cast("date"))
        .select("o_orderkey").orderBy("o_orderkey"),
      Some(
        """SELECT o_orderkey FROM orders
          |WHERE CAST(o_orderdate AS DATE) >= DATE '2000-01-01'
          |  AND CAST(o_orderdate AS DATE) < DATE '2001-01-01'
          |ORDER BY o_orderkey""".stripMargin),
      "P13 partial-interval exclusion filter"),

    // ----- P14: NOT LIKE (cv-api.py:77) -----
    "q26_not_like" -> Q(
      (s, dir) => Tables(s, dir, "part")
        .filter(!col("p_type").like("ECO%"))
        .select("p_partkey", "p_type").orderBy("p_partkey"),
      Some(
        """SELECT p_partkey, p_type FROM part
          |WHERE p_type NOT LIKE 'ECO%' ORDER BY p_partkey""".stripMargin),
      "P14 NOT LIKE pushdown filter"),

    // ----- P6 on the events stream table (1-day tumbling window shape) ----
    "q27_events_daily" -> Q(
      (s, dir) => Tables.events(s, dir)
        .groupBy(col("event_type"), to_date(col("ts")).as("d"))
        .agg(count(lit(1)).as("n"))
        .orderBy("event_type", "d"),
      Some(
        """SELECT event_type, CAST(ts AS DATE) AS d, COUNT(*) AS n
          |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
      "P6 midnight truncation == 1-day tumbling window on events")
  )
}
