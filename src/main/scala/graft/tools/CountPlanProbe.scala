import org.apache.spark.sql.SparkSession
object CountPlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- Seq("q90_chunk_overlap", "q92_quality_classifier", "q93_embedding_centroids")) {
      val df = graft.SparkEntry.queries(n)(spark, "/root/testdata/sf0.001")
      // what .count() actually executes:
      val counted = df.groupBy().count()
      val plan = counted.queryExecution.executedPlan.toString
      println(s"=== $n count-plan tokens: substr=${plan.contains("substr")} md5=${plan.contains("md5")} vec_centroid=${plan.contains("vec_centroid")} explode=${plan.contains("Generate")} aggScore=${plan.contains("aggregate")}")
    }
    spark.stop()
  }
}
