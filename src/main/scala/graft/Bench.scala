package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // events.parquet uses TIMESTAMP(NANOS); see graft.Tables.events.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warm-up pass: JIT + codegen-cache + parquet-footer warm, so
    // the timed numbers reflect steady-state plan cost (what a long-running
    // cluster sees), not first-query JVM warm-up. Its duration is reported
    // separately as warmup_sec for transparency.
    val w0 = System.nanoTime()
    SparkEntry.queries.foreach { case (_, fn) =>
      try fn(spark, sfDir).count() catch { case _: Throwable => () }
    }
    val warmup = (System.nanoTime() - w0) / 1e9
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    // spark time over ONLY the oracle-checked queries, so the duckdb
    // yardstick below compares the same query set (the rows-only queries
    // have no duckdb counterpart to time)
    val oracleTotal = results.collect {
      case (k, v) if SparkEntry.oracleSql.contains(k) => v }.sum
    // DuckDB yardstick: time the same oracle SQLs single-node so the
    // "within 2x of a tuned single-node engine" gate is a number, not a
    // guess. Best-effort — duckdb lives driver-side (python3) only, so a
    // cluster without it just reports null.
    val duckTotal: String = try {
      val script = new java.io.File("tools/duckbench.py")
      if (!script.isFile) "null"
      else {
        val tmp = java.nio.file.Files.createTempFile("oracle_sql", ".json")
        val om = new com.fasterxml.jackson.databind.ObjectMapper()
        om.writeValue(tmp.toFile,
          new java.util.TreeMap[String, String](
            scala.jdk.CollectionConverters.MapHasAsJava(
              SparkEntry.oracleSql).asJava))
        val out = scala.sys.process.Process(
          Seq("python3", script.getPath, tmp.toString, sfDir)).!!.trim
        java.nio.file.Files.deleteIfExists(tmp)
        om.readTree(out).get("total").asDouble(-1.0).toString
      }
    } catch { case _: Throwable => "null" }
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"warmup_sec":$warmup,"spark_total_sec":$total,"spark_oracle_total_sec":$oracleTotal,"duckdb_total_sec":$duckTotal,"sf":"$sfDir"}""")
    spark.stop()
  }
}
