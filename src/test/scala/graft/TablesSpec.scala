package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Pins `Tables.events` against every physical encoding the harness has
  * shipped for `events.parquet`'s `ts` column, so a driver-side testdata
  * regeneration can never silently break the events queries again
  * (round-11 regression: q27/q28/q55 fell out of CORRECTNESS when the
  * data moved from TIMESTAMP(NANOS) to TIMESTAMP(MICROS)).
  */
class TablesSpec extends SparkSpec {

  private val nanosKey = "spark.sql.legacy.parquet.nanosAsLong"
  private val nanosFixtureDir = "src/test/resources/events_shapes/nanos"

  /** Run `body` with the legacy nanos conf removed, restoring it after.
    * The shared test session pins the conf globally; the adaptive loader
    * must work without it (production entrypoints never set it).
    */
  private def withoutNanosConf[A](body: => A): A = {
    val prev = spark.conf.getOption(nanosKey)
    spark.conf.unset(nanosKey)
    try body
    finally prev.foreach(spark.conf.set(nanosKey, _))
  }

  test("events: TIMESTAMP(MICROS) data (current testdata) passes through as a timestamp") {
    withoutNanosConf {
      val df = Tables.events(spark, sf)
      val dt = df.schema("ts").dataType
      assert(dt == TimestampNTZType || dt == TimestampType,
        s"expected a timestamp dtype, got $dt")
      // Sanity: values are in a plausible epoch range (not mis-scaled nanos).
      val yr = df.select(min(year(col("ts"))), max(year(col("ts")))).head()
      assert(yr.getInt(0) >= 1990 && yr.getInt(1) <= 2100,
        s"ts years out of range: $yr — a nanos/micros mis-scale would land far outside")
    }
  }

  test("events: plain INT64 epoch-nanos data is converted via div-1000") {
    withoutNanosConf {
      val dir = s"/tmp/graft-test-events-long-${System.nanoTime()}"
      // 2024-03-01T00:00:00Z plus 7-minute steps, as epoch-NANOS longs.
      val baseNs = 1709251200L * 1000000000L
      spark.range(20)
        .select((col("id") % 3).cast("int").as("user_id"),
          (lit(baseNs) + col("id") * lit(420L * 1000000000L)).as("ts"),
          concat(lit("{\"k\":"), col("id"), lit("}")).as("props"),
          concat(lit("et"), col("id") % 2).as("event_type"))
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      val df = Tables.events(spark, dir)
      assert(df.schema("ts").dataType == TimestampType)
      val first = df.orderBy("ts").select(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss")).head().getString(0)
      assert(first == "2024-03-01 00:00:00", s"got $first")
      assert(df.count() == 20)
    }
  }

  test("events: legacy TIMESTAMP(NANOS) footer is read via the nanosAsLong fallback") {
    withoutNanosConf {
      // Without the conf, Spark rejects the NANOS footer at inference; the
      // loader must detect that and fall back (setting the conf itself).
      val df = Tables.events(spark, nanosFixtureDir)
      assert(df.schema("ts").dataType == TimestampType)
      val first = df.orderBy("ts").select(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss")).head().getString(0)
      assert(first == "2024-03-01 00:00:00", s"got $first")
      assert(df.count() == 20)
    }
  }

  test("events: NANOS footer with the conf already set surfaces as LongType and converts") {
    // The shared test session sets the conf; inference then yields LongType
    // and the same div-1000 branch as plain INT64 applies.
    spark.conf.set(nanosKey, "true")
    val df = Tables.events(spark, nanosFixtureDir)
    assert(df.schema("ts").dataType == TimestampType)
    assert(df.count() == 20)
  }

  test("volume tables: drifted integer/float widths normalize to the pinned dtypes") {
    val dir = s"/tmp/graft-test-drift-${System.nanoTime()}"
    // narrow doc_id/n_chars to int32 and widen the embedding to double —
    // the classes of drift a regeneration could introduce
    spark.range(10)
      .select(col("id").cast("int").as("doc_id"), lit("t x").as("text"),
        lit("en").as("lang"), lit("web").as("source"),
        lit(3).cast("int").as("n_chars"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    spark.range(10)
      .select(col("id").cast("int").as("vec_id"),
        array(lit(1.0), lit(2.0)).as("embedding"),
        lit(0).as("label"))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val docs = Tables(spark, dir, "documents")
    assert(docs.schema("doc_id").dataType.typeName == "long")
    assert(docs.schema("n_chars").dataType.typeName == "long")
    val emb = Tables(spark, dir, "embeddings")
    assert(emb.schema("vec_id").dataType.typeName == "long")
    assert(emb.schema("embedding").dataType.sql == "ARRAY<FLOAT>")
  }

  test("volume tables: already-pinned dtypes stay a plain pruned scan") {
    val docs = Tables(spark, sf, "documents")
    assert(docs.schema("doc_id").dataType.typeName == "long")
    // the no-op cast must not block filter pushdown to the parquet scan
    val plan = docs.filter(col("doc_id") < 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(doc_id), LessThan(doc_id,10)]"),
      s"expected pushed filter in:\n$plan")
  }

  test("events: a missing file surfaces as missing-file, conf untouched") {
    withoutNanosConf {
      val e = intercept[org.apache.spark.sql.AnalysisException] {
        Tables.events(spark, "/tmp/graft-no-such-dir")
      }
      // the narrowed probe catch must not re-route arbitrary analysis
      // errors into the nanos fallback (which would both confuse the
      // error and leak the legacy conf into the session)
      assert(e.getMessage.contains("graft-no-such-dir"), e.getMessage)
      assert(!spark.conf.getOption(nanosKey).contains("true"),
        "a failed probe must not flip the legacy conf")
    }
  }

  test("events: the common (timestamp) path never mutates session state") {
    withoutNanosConf {
      Tables.events(spark, sf).count()
      // unset() surfaces the registered default ("false"); the loader must
      // not have flipped it to "true" on the common path.
      assert(!spark.conf.getOption(nanosKey).contains("true"),
        "loader must not set the legacy conf when the data doesn't need it")
    }
  }
}
