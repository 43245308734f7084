package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object ScratchProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("data/sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(tag: String)(f: => Unit): Unit = {
      f
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
      println(f"[probe] $tag%-36s ${ts.sorted.apply(2)}%.3f s")
    }
    def consume(df: org.apache.spark.sql.DataFrame): Unit =
      df.queryExecution.toRdd.foreach(_ => ())
    val li = graft.Tables(spark, dir, "lineitem")
    time("agg (string, double) price") { consume(li.groupBy(col("l_returnflag"), col("l_extendedprice")).agg(count(lit(1)))) }
    time("agg (int, double) price") { consume(li.groupBy(ascii(col("l_returnflag")), col("l_extendedprice")).agg(count(lit(1)))) }
    time("agg (int, long-cents) price") { consume(li.groupBy(ascii(col("l_returnflag")), floor(col("l_extendedprice")*100+0.5)).agg(count(lit(1)))) }
    spark.stop()
  }
}
