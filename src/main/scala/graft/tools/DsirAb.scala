package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Evidence generator: times the TWO shapes of q108's DSIR selection on
  * the same documents frame in one JVM — the general two-model form
  * (train target + train raw separately, double shuffle_hash join) and
  * the sliced fast path (one flagged count table, one fused-model join;
  * `Dsir.selectTopNSliced`). Result equality is asserted here and pinned
  * by DsirSpec; the structural claim (one fewer tokenize scan, one fewer
  * vocabulary-scale exchange, one fewer stream join) is what the
  * interleaved medians price.
  *
  *   sbt "runMain graft.tools.DsirAb data/sf1 5"
  */
object DsirAb {
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

    def docs = graft.Tables(spark, dir, "documents")
    def twoModel() = graft.text.Dsir.selectTopN(
      target = docs.filter(col("lang") === "en"),
      raw = docs, candidates = docs, n = 25)
    def sliced() = graft.text.Dsir.selectTopNSliced(
      docs, col("lang") === "en", n = 25)

    val a = twoModel().collect().toSeq
    val b = sliced().collect().toSeq
    require(a == b, s"shapes disagree:\n$a\nvs\n$b")

    val (tTwo, tSliced) = (
      Timing.medianDf(reps)(() => twoModel()),
      Timing.medianDf(reps)(() => sliced()))
    println(s"""{"two_model_sec":$tTwo,"sliced_sec":$tSliced,"reps":$reps}""")
  }
}
