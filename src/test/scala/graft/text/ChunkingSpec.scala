package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ChunkingSpec extends SparkSpec {
  import spark.implicits._

  private def chunksOf(text: String, size: Int, stride: Int): Seq[(Long, Long, String)] =
    Chunking.chunkFixed(Seq((1L, text)).toDF("doc_id", "text"),
        "doc_id", "text", size, stride)
      .select("chunk_id", "start_pos", "chunk")
      .as[(Long, Long, String)].collect().toSeq.sortBy(_._1)

  test("short doc: exactly one whole-text chunk") {
    assert(chunksOf("hello", 256, 200) == Seq((0L, 1L, "hello")))
    assert(chunksOf("x" * 256, 256, 200) == Seq((0L, 1L, "x" * 256)))
  }

  test("overlap: consecutive chunks share size - stride chars") {
    val text = (0 until 500).map(i => ('a' + i % 26).toChar).mkString
    val cs = chunksOf(text, 256, 200)
    assert(cs.map(_._1) == Seq(0L, 1L, 2L))
    assert(cs.map(_._2) == Seq(1L, 201L, 401L))
    assert(cs(0)._3 == text.substring(0, 256))
    assert(cs(1)._3 == text.substring(200, 456))
    assert(cs(2)._3 == text.substring(400, 500)) // short tail, reaches the end
    assert(cs(0)._3.takeRight(56) == cs(1)._3.take(56)) // the overlap
  }

  test("chunk count: n = max(1, ceil((len - size) / stride) + 1); tail reaches end") {
    for ((len, size, stride) <- Seq((1000, 256, 200), (1000, 100, 100),
                                    (257, 256, 200), (456, 256, 200),
                                    (457, 256, 200), (12, 5, 3))) {
      val text = "ab" * ((len + 1) / 2) take len
      val cs = chunksOf(text, size, stride)
      val expected = math.max(1, math.ceil((len - size).toDouble / stride).toInt + 1)
      assert(cs.size == expected, s"len=$len size=$size stride=$stride")
      // last chunk covers the document tail
      val (lastId, lastStart, lastChunk) = cs.last
      assert(lastStart + lastChunk.length - 1 == len)
      // every char of the doc appears in some chunk
      assert(cs.map(_._3.length).sum >= len)
    }
  }

  test("stride == size degenerates to a non-overlapping partition of the text") {
    val text = "ab" * 500 // 1000 chars
    val cs = chunksOf(text, 100, 100)
    assert(cs.size == 10)
    assert(cs.map(_._3).mkString == text)
  }

  test("plan: zero exchanges — pure scan-side expansion") {
    val out = Chunking.chunkFixed(graft.Tables(spark, sf, "documents"),
      "doc_id", "text", 256, 200)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.linesIterator.take(12).mkString("\n"))
  }

  test("invalid size/stride rejected") {
    val df = Seq((1L, "abc")).toDF("doc_id", "text")
    intercept[IllegalArgumentException](Chunking.chunkFixed(df, "doc_id", "text", 0, 1))
    intercept[IllegalArgumentException](Chunking.chunkFixed(df, "doc_id", "text", 10, 11))
    intercept[IllegalArgumentException](Chunking.chunkFixed(df, "doc_id", "text", 10, 0))
  }
}
