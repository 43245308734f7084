package graft.tools

import java.nio.file.{Files, Path}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.streaming.StreamingOps

/** End-to-end Structured Streaming demo on a real file source (the
  * production shape: a spool directory that an ingest process appends to).
  * Demonstrates the §2.8 semantics live: watermarked 1-day tumbling
  * counts in append mode, plus a foreachBatch keyed upsert sink receiving
  * a late correction. Usage: sbt "runMain graft.tools.StreamingDemo"
  */
object StreamingDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val in: Path = Files.createTempDirectory("graft-stream-in")
    val sink = Files.createTempDirectory("graft-stream-out").resolve("cases").toString

    def writeBatch(name: String, lines: String*): Unit =
      Files.writeString(in.resolve(name), lines.mkString("\n"))

    val stream = spark.readStream
      .schema("ts timestamp, case_number int, travel string")
      .json(in.toString)

    // surface 1: watermarked daily counts (append mode)
    val counts = StreamingOps.dailyCounts(stream, "ts")
      .writeStream.format("memory").queryName("daily").outputMode("append")
      .start()
    // surface 2: late-data upsert into a keyed parquet sink
    val upsert = stream
      .select("case_number", "travel")
      .writeStream
      .foreachBatch(StreamingOps.upsertEachBatch(sink, "case_number") _)
      .outputMode("update").start()

    writeBatch("b0.json",
      """{"ts":"2024-01-01T10:00:00","case_number":1,"travel":"Under Investigation"}""",
      """{"ts":"2024-01-01T11:00:00","case_number":2,"travel":"No"}""",
      """{"ts":"2024-01-02T09:00:00","case_number":3,"travel":"Yes"}""")
    counts.processAllAvailable(); upsert.processAllAvailable()

    // late correction for case 1 + watermark-advancing traffic
    writeBatch("b1.json",
      """{"ts":"2024-01-05T00:00:00","case_number":4,"travel":"No"}""",
      """{"ts":"2024-01-05T00:30:00","case_number":1,"travel":"Yes"}""")
    counts.processAllAvailable(); upsert.processAllAvailable()
    writeBatch("b2.json",
      """{"ts":"2024-01-05T01:00:00","case_number":5,"travel":"No"}""")
    counts.processAllAvailable(); upsert.processAllAvailable()

    println("=== finalized daily windows (Jan 1-2 closed; Jan 5 still open):")
    spark.table("daily").orderBy("d").show()
    println("=== upserted sink (case 1 corrected to travel=Yes):")
    spark.read.parquet(sink).orderBy("case_number").show()

    counts.stop(); upsert.stop(); spark.stop()
  }
}
