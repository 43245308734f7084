package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: dump schemas + a sample row of every testdata table. */
object SchemaDump {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    tables.foreach { t =>
      try {
        val df = spark.read.parquet(s"$dir/$t.parquet")
        println(s"=== $t  rows=${df.count()}")
        println(df.schema.treeString)
        df.show(2, 60, vertical = true)
      } catch {
        case e: Throwable => println(s"=== $t FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
