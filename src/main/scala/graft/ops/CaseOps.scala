package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar/projection operators (SURVEY.md §2.2) — the reference's per-row
  * Python transforms re-expressed as codegen'd Catalyst column expressions
  * (no UDFs; every lambda in the reference maps to a built-in — SURVEY §2.9).
  */
object CaseOps {

  /** P2 — strip non-digits and cast to int (reference: cv.py:61,63,
    * cv-csv.py:49,51 `re.sub("[^0-9]","",s)` then `int()`). Null when no
    * digits remain (reference would throw; we degrade to null).
    */
  def digitsToInt(c: Column): Column =
    nullif(regexp_replace(c, "[^0-9]", ""), lit("")).cast("int")

  /** P4 — Python `str.title()` per token (reference: cv-api.py:114,118,119).
    */
  def titleCase(c: Column): Column = initcap(c)

  /** P3 — split on `;`, trim, title-case only tokens longer than 2 chars
    * (keeps state codes like "NY" uppercase); whole value null for the
    * "NA"/empty sentinel (reference: cv-api.py:106, cv-csv.py:54).
    */
  def splitTrimTitle(c: Column, sep: String = ";"): Column =
    when(c.isNull || c === "NA" || trim(c) === "", lit(null))
      .otherwise(transform(split(c, sep), x =>
        when(length(trim(x)) > 2, initcap(trim(x))).otherwise(trim(x))))

  /** P5 — sentinel normalization: `"NA"` -> replacement (reference:
    * cv-api.py:110,114,116,118,119).
    */
  def naTo(c: Column, replacement: Column): Column =
    when(c === "NA", replacement).otherwise(c)

  /** P5 — empty string -> 'Unknown' (reference: cv-csv.py:55). */
  def emptyToUnknown(c: Column): Column =
    when(c.isNull || trim(c) === "", lit("Unknown")).otherwise(c)

  /** P6 — epoch-millis to midnight-truncated date (reference:
    * cv-api.py:115 `fromtimestamp(ms/1000).replace(hour=0, ...)`).
    *
    * Divergence note: the reference's `fromtimestamp` truncates in the
    * PROCESS-LOCAL zone, so its output shifts with the host's TZ. Here
    * truncation happens in `spark.sql.session.timeZone` — deterministic
    * cluster-wide and pinned to UTC in this project's sessions. Dates
    * within ±TZ-offset of midnight differ from a non-UTC reference host.
    */
  def epochMsToDate(c: Column): Column = to_date(timestamp_millis(c))

  /** P7 — two-digit-year date parse `%m/%d/%y` (reference: cv-csv.py:57,89).
    */
  def parseDateMdy(c: Column): Column = to_date(c, "M/d/yy")

  /** P8 — int-encoded date parse `%Y%m%d` (reference: cv-api.py:156). */
  def parseDateYmd(c: Column): Column = to_date(c.cast("string"), "yyyyMMdd")

  /** P9 — guarded growth ratio: `total / prev` when `prev > 0` else 0
    * (reference: cv-api.py:161,164).
    */
  def guardedRatio(total: Column, prev: Column): Column =
    when(prev > 0, total / prev).otherwise(lit(0.0))

  /** P10 — per-1000-capita normalization, 2-decimal rounding (reference:
    * cv-county-stats.py:66 `round(count / (population/1000), 2)`).
    */
  def per1000(count: Column, population: Column): Column =
    round(count / (population / lit(1000.0)), 2)
}
