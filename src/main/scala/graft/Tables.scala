package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the harness parquet tables (TESTDATA.md / FIXTURES.md §F6).
  *
  * All loads go through `spark.read.parquet` so Catalyst's predicate
  * pushdown / column pruning reach the scan (verified via
  * `.explain("formatted")` — `PushedFilters` / `ReadSchema`). At cluster
  * scale these would be partitioned/bucketed tables; the loaders are the
  * single place to swap in a catalog.
  */
object Tables {
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Column dtypes the engine's operators assume, pinned per table so a
    * driver-side testdata regeneration that narrows or widens a physical
    * type (the round-11 events `ts` drift, but for the volume tables)
    * degrades to a free no-op cast instead of an AnalysisException or a
    * silent semantic change. Casts to the already-scanned type are
    * removed by Catalyst (`SimplifyCasts`), and upcast comparisons are
    * still pushed to parquet (`UnwrapCastInBinaryComparison`), so the
    * common path costs nothing.
    */
  private val pinnedTypes: Map[String, Seq[(String, String)]] = Map(
    "documents" -> Seq("doc_id" -> "bigint", "n_chars" -> "bigint"),
    "embeddings" -> Seq("vec_id" -> "bigint", "embedding" -> "array<float>"))

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    pinnedTypes.getOrElse(name, Nil).foldLeft(df) { case (d, (c, t)) =>
      if (d.columns.contains(c)) d.withColumn(c, col(c).cast(t)) else d
    }
  }

  /** Schema-adaptive load of the `events` table.
    *
    * The harness has regenerated `events.parquet` across rounds with three
    * physical encodings for `ts`, and the loader must tolerate all of them
    * (the round-11 regression was exactly this drift):
    *
    *   - parquet TIMESTAMP(MICROS/MILLIS) — Spark infers a real timestamp
    *     (NTZ or LTZ depending on isAdjustedToUTC); pass through unchanged.
    *     Session timezone is pinned to UTC by every entrypoint, so NTZ vs
    *     LTZ is value-identical downstream.
    *   - plain INT64 epoch-nanos — surfaces as LongType; truncate to
    *     microseconds (`ts div 1000`, matching DuckDB's ns→us truncation)
    *     and convert with `timestamp_micros`.
    *   - parquet TIMESTAMP(NANOS) — Spark's schema converter rejects the
    *     footer outright unless `spark.sql.legacy.parquet.nanosAsLong` is
    *     set, under which the column arrives as epoch-nanos LongType and
    *     takes the same div-1000 path. The conf must stay set for the
    *     lifetime of the returned plan (the vectorized reader re-reads it
    *     from the session at execution), so it is mutated ONLY on this
    *     branch — the common paths never touch session state.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.LongType
    val path = s"$dir/events.parquet"
    // The probe catch is NARROW (r13): only the schema converter's
    // illegal-Parquet-type rejection of TIMESTAMP(NANOS) routes to the
    // legacy branch. Any other AnalysisException — file missing,
    // permissions, corrupt footer — propagates as itself instead of
    // masquerading as a nanos file and leaking the session conf on the
    // doomed retry. Spark 4.1.2 raises PARQUET_TYPE_ILLEGAL for this
    // rejection (verified against a pyarrow-written timestamp[ns] file).
    val inferred =
      try Some(spark.read.parquet(path).schema("ts").dataType)
      catch {
        // BOTH the condition AND the type name (r15): PARQUET_TYPE_ILLEGAL
        // covers every illegal-Parquet-type rejection (unannotated fixed
        // types, odd INT96 variants, ...), so the condition alone would
        // route a non-nanos illegal file here, mutate the session conf,
        // and retry a doomed read. The "NANOS" token comes from
        // parquet-mr's LogicalTypeAnnotation.toString — stable where
        // Spark's sentence wording is not; the condition-null arm stays
        // as a fallback for a hypothetical classless rethrow.
        case e: org.apache.spark.sql.AnalysisException
            if e.getMessage != null && e.getMessage.contains("NANOS") &&
              (e.getCondition == "PARQUET_TYPE_ILLEGAL" ||
                e.getCondition == null) =>
          None
      }
    inferred match {
      case Some(LongType) =>
        spark.read.parquet(path)
          .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case Some(_) =>
        spark.read.parquet(path) // real timestamp column — no rewrite needed
      case None => // TIMESTAMP(NANOS) footer: legacy long-surfacing read
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.read.parquet(path)
          .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    }
  }
}
