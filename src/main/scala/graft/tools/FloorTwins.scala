package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Evidence generator (r15): scan-only / structure-only TWINS for the
  * bench's residual-ratio queries (q51/q89, q84), timed solo in one JVM
  * so each query's ratio splits into "parquet decode + join/exchange
  * floor" vs "cost the operator itself adds". The q50 twin lives in
  * [[PercentileAb]] (same session as its surface A/B).
  *
  *  - q5189_twin: q51/q89's exact input shape — orders⋈customer
  *    (shuffle-hash) ⋈ broadcast nation, then a trivial codegen
  *    aggregate instead of the rank window / top-k aggregate. The
  *    delta q51−twin is what row_number+filter really costs; q89−twin
  *    what the k-slot aggregate costs.
  *  - q84_twin_scan: the gated batch's text decode alone (odd docs,
  *    sum(length(text))) — the irreducible read.
  *  - q84_twin_nostore: the full segment gate against a nonexistent
  *    store — segment hashing, winner exchange, kept-pairs regroup and
  *    text rebuild, WITHOUT the store probe. q84−this is the store
  *    join's true incremental cost; this−scan is the gate's own
  *    exchange/rebuild cost.
  *
  * r16 additions — the two remaining unattributed headline ratios,
  * with their FULL queries timed in the SAME JVM as the twins so the
  * split is not polluted by cross-JVM variance (the README's ±10-15%
  * bar):
  *
  *  - q97_full / q97_twin_count / q97_twin_scan: the weighted-histogram
  *    percentile; its codegen count phase alone (same two groupBys,
  *    trivial fold instead of the weighted aggregate); the bare
  *    3-column scan + one tiny exchange. full−count is the typed
  *    aggregate's cost over ≤66 rows (expected ~zero); count−scan is
  *    the distinct-count phase's cost.
  *  - q90_full / q90_twin_scan: sliding-window chunking; the documents
  *    text decode alone (sum(length(text))). full−scan is the
  *    expansion+substr projection plus the ~10x-row materialization —
  *    the operator's declared work, zero shuffle either way.
  *
  *   sbt "runMain graft.tools.FloorTwins data/sf1 5"
  */
object FloorTwins {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(5)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def q5189Twin(): DataFrame =
      graft.Tables(spark, dir, "orders")
        .join(graft.Tables(spark, dir, "customer").hint("shuffle_hash"),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(graft.Tables(spark, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("n_name").as("nation"), col("o_orderkey"),
          col("o_totalprice"))
        .groupBy("nation")
        .agg(count(lit(1)).as("n"), sum("o_totalprice").as("s"))
        .orderBy("nation")

    def oddDocs(): DataFrame = graft.Tables(spark, dir, "documents")
      .filter(pmod(col("doc_id"), lit(2)) === 1)

    def q84TwinScan(): DataFrame =
      oddDocs().agg(sum(length(col("text"))).as("chars"))

    def q84TwinNostore(): DataFrame =
      graft.ops.Segments.segmentGate(oddDocs(), 16,
          "graft_floortwins_no_such_store")
        .orderBy("doc_id")

    def li() = graft.Tables(spark, dir, "lineitem")

    def q97Full(): DataFrame =
      graft.SparkEntry.queries("q97_weighted_percentiles")(spark, dir)

    // the codegen count phase + exchange, with a trivial fold in place
    // of the weighted percentile aggregate
    def q97TwinCount(): DataFrame =
      li().groupBy(col("l_returnflag"), col("l_linestatus"),
          col("l_discount").as("v"))
        .agg(count(col("l_discount")).as("n"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(sum(col("n")).as("total"), sum(col("v") * col("n")).as("wsum"))
        .orderBy("l_returnflag", "l_linestatus")

    // the 3-column scan floor: same columns, one tiny exchange, no
    // per-distinct-value grouping
    def q97TwinScan(): DataFrame =
      li().groupBy("l_returnflag", "l_linestatus")
        .agg(sum(col("l_discount")).as("s"), count(lit(1)).as("n"))
        .orderBy("l_returnflag", "l_linestatus")

    def q90Full(): DataFrame =
      graft.SparkEntry.queries("q90_chunk_overlap")(spark, dir)

    // the documents text decode alone — q90's irreducible read
    def q90TwinScan(): DataFrame =
      graft.Tables(spark, dir, "documents")
        .agg(sum(length(col("text"))).as("chars"))

    def med(f: () => DataFrame): Double = Timing.medianDf(reps)(f)

    val ((j, s84, n84, f97, c97, s97, f90, s90), foreign) =
      Timing.withForeignCores {
        (med(q5189Twin _), med(q84TwinScan _), med(q84TwinNostore _),
          med(q97Full _), med(q97TwinCount _), med(q97TwinScan _),
          med(q90Full _), med(q90TwinScan _))
      }
    println(f"""{"q5189_twin_sec":$j%.3f,"q84_twin_scan_sec":$s84%.3f,"q84_twin_nostore_sec":$n84%.3f,"q97_full_sec":$f97%.3f,"q97_twin_count_sec":$c97%.3f,"q97_twin_scan_sec":$s97%.3f,"q90_full_sec":$f90%.3f,"q90_twin_scan_sec":$s90%.3f,"foreign_cores":$foreign%.2f,"dir":"$dir"}""")
    spark.stop()
  }
}
