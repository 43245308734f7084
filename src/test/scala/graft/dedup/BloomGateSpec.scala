package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.Blooms

class BloomGateSpec extends SparkSpec {
  import spark.implicits._

  private def freshStore(tag: String): (String, String) = {
    val t = s"bloomgate_${tag}_${System.nanoTime()}"
    (t, new java.io.File(sys.props("java.io.tmpdir"), t).getPath)
  }

  test("bloom filter over inserted keys has no false negatives") {
    val keys = spark.range(1000).select(xxhash64(col("id")).as("h"))
    val bf = keys.agg(Blooms.bloomAgg(col("h"), 10000, 80000).as("bf"))
      .head().getAs[Array[Byte]]("bf")
    val misses = keys
      .filter(!Blooms.bloomMightContain(lit(bf), col("h"))).count()
    assert(misses == 0)
  }

  test("bloom filter prunes most non-members at 8 bits/item") {
    val keys = spark.range(1000).select(xxhash64(col("id")).as("h"))
    val bf = keys.agg(Blooms.bloomAgg(col("h"), 10000, 80000).as("bf"))
      .head().getAs[Array[Byte]]("bf")
    val nonMembers = spark.range(1000000, 1010000)
      .select(xxhash64(col("id")).as("h"))
    val falsePos = nonMembers
      .filter(Blooms.bloomMightContain(lit(bf), col("h"))).count()
    assert(falsePos < 500) // ~2% expected at 8 bits/item; 5% margin
  }

  test("exactGateBloom output is identical to exactGate") {
    val docs = graft.Tables(spark, sf, "documents").limit(200)
      .select("doc_id", "text").localCheckpoint()
    val (table, path) = freshStore("equiv")
    Dedup.exactIncremental(
      docs.filter(pmod(col("doc_id"), lit(2)) === 0), "doc_id", "text",
      table, path)
    // batch: odd ids (novel) + copies of even ids (corpus dups)
    val batch = docs.filter(pmod(col("doc_id"), lit(2)) === 1)
      .unionByName(docs.filter(pmod(col("doc_id"), lit(2)) === 0)
        .select((col("doc_id") + 5000).as("doc_id"), col("text")))
    val bloom = Dedup.storeBloom(spark, table, expectedItems = 10000).get
    val exact = Dedup.exactGate(batch, "doc_id", "text", table)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Array[Byte]]("text_hash").toSeq).toSet
    val bloomed = Dedup.exactGateBloom(batch, "doc_id", "text", table, bloom)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Array[Byte]]("text_hash").toSeq).toSet
    assert(bloomed == exact)
    assert(bloomed.nonEmpty)
    // every corpus dup was gated (copies share even-id text)
    assert(bloomed.forall(_._1 % 2 == 1))
  }

  test("storeBloom is None for a missing store; gate falls back") {
    assert(Dedup.storeBloom(spark, "bloomgate_nope", 1000).isEmpty)
    val docs = graft.Tables(spark, sf, "documents").limit(20)
      .select("doc_id", "text")
    val viaMissing = Dedup.exactGateBloom(docs, "doc_id", "text",
      "bloomgate_nope", Array.emptyByteArray).count()
    assert(viaMissing == 20)
  }
}
