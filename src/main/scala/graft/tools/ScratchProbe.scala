package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.text.TextAnalysis

object ScratchProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("data/sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(tag: String)(f: => Unit): Unit = {
      f
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
      println(f"[probe] $tag%-30s ${ts.sorted.apply(1)}%.3f s")
    }
    def consume(df: org.apache.spark.sql.DataFrame): Unit =
      df.queryExecution.toRdd.foreach(_ => ())
    val docs = graft.Tables(spark, dir, "documents")
    val w = 16
    time("tokenize only") { consume(docs.select(col("doc_id"), TextAnalysis.wsTokens(col("text")).as("t"))) }
    time("segment keys (md5)") { consume(docs.withColumn("__toks", TextAnalysis.wsTokens(col("text")))
      .select(col("doc_id"), posexplode_outer(graft.ops.Segments.segmentsCol(col("text"), w)).as(Seq("seg_no","seg")))
      .withColumn("h", unhex(md5(col("seg")))).select("doc_id","seg_no","h")) }
    time("full dedupSegments") { consume(graft.ops.Segments.dedupSegments(docs, w)) }
    spark.stop()
  }
}
