package graft.tools

import org.apache.spark.sql.SparkSession

/** Time a single catalog query (1 warm-up + n timed runs) — the focused
  * companion to graft.Bench for attributing a regression to one query:
  *   sbt "runMain graft.tools.TimeQuery q37_minhash_lsh data/sf1 3"
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries(name)
    fn(spark, dir).count() // warm-up
    val times = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      val rows = fn(spark, dir).count()
      val t = (System.nanoTime() - t0) / 1e9
      println(f"[timequery] $name $dir rows=$rows%d ${t}%.3f s")
      t
    }
    println(f"[timequery] MEDIAN ${times.sorted.apply(reps / 2)}%.3f s")
    spark.stop()
  }
}
