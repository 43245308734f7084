package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Evidence generator (r15): the skew doctrine in `graft.ops.Skew`
  * measured on a synthetic hot-key frame — 90% of rows carry ONE key,
  * the rest spread over 1M keys.
  *
  * Shapes timed (medians over reps, full materialization):
  *  - `count_naive` vs `count_salted`: groupBy-count of the frame.
  *    Decomposable aggregates carry map-side partial aggregation, so
  *    the hot key reaches the exchange as one row per task — the naive
  *    form is EXPECTED to be fine, and that expectation deserves a
  *    number (salting is for the exchange-bound forms: collect_list,
  *    exact distinct, windows over the hot key).
  *  - `join_naive_noaqe` / `join_naive_aqe` / `join_salted`: the fact
  *    frame joined to a 1M-row dimension with broadcast DISABLED (the
  *    salted join exists precisely for when the dim can't broadcast).
  *    Naive shuffle join sends 90% of fact rows to one task; AQE's
  *    skew-join split is the engine's own fix; `Skew.saltedJoin` is
  *    the plan-level fix when AQE can't see the join (non-sort-merge
  *    paths, pre-AQE Spark).
  *
  *   sbt "runMain graft.tools.SkewAb 20000000 3"
  */
object SkewAb {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(20000000L)
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // 90%-one-key fact, materialized so generation is untimed
    val fact = spark.range(rows).select(
      when(pmod(col("id"), lit(10L)) < 9, lit("hot"))
        .otherwise(concat(lit("k"),
          pmod(xxhash64(col("id")), lit(1000000L)))).as("k"),
      col("id").as("v")).localCheckpoint()
    val dim = spark.range(1000000L)
      .select(concat(lit("k"), col("id")).as("k"), (col("id") * 7).as("pay"))
      .unionByName(spark.range(1).select(lit("hot").as("k"), lit(0L).as("pay")))
      .localCheckpoint()

    def med(f: () => DataFrame): Double = Timing.medianDf(reps)(f)
    def withConf[T](kvs: (String, String)*)(body: => T): T = {
      val prev = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
      kvs.foreach { case (k, v) => spark.conf.set(k, v) }
      try body finally prev.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }

    val countNaive = med(() =>
      fact.groupBy("k").agg(count(lit(1)).as("cnt")))
    val countSalted = med(() => graft.ops.Skew.saltedCount(fact, col("k")))

    val noBroadcast = "spark.sql.autoBroadcastJoinThreshold" -> "-1"
    val joinNaiveNoAqe = withConf(noBroadcast,
      "spark.sql.adaptive.enabled" -> "false") {
      med(() => fact.join(dim, "k"))
    }
    val joinNaiveAqe = withConf(noBroadcast) { med(() => fact.join(dim, "k")) }
    // AQE sizes skew by COMPRESSED shuffle bytes: a single-key partition
    // compresses far below the 256 MB default threshold while its row
    // count still straggles one task — lowering the threshold is the
    // tuning that lets AQE see it
    val joinNaiveAqeTuned = withConf(noBroadcast,
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16MB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8MB") {
      med(() => fact.join(dim, "k"))
    }
    val joinSalted = withConf(noBroadcast,
      "spark.sql.adaptive.enabled" -> "false") {
      med(() => graft.ops.Skew.saltedJoin(fact, dim, "k"))
    }

    println(f"""{"rows":$rows,"count_naive_sec":$countNaive%.3f,"count_salted_sec":$countSalted%.3f,"join_naive_noaqe_sec":$joinNaiveNoAqe%.3f,"join_naive_aqe_sec":$joinNaiveAqe%.3f,"join_naive_aqe_tuned_sec":$joinNaiveAqeTuned%.3f,"join_salted_sec":$joinSalted%.3f}""")
    spark.stop()
  }
}
