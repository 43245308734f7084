package graft.multimodal

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media = Multimodal.withFakeMedia(
    graft.Tables(spark, sf, "documents").limit(20), "doc_id", "text")

  test("binary content round-trips utf8 and metadata is well-formed") {
    val r = media.head()
    val meta = r.getStruct(r.fieldIndex("media_meta"))
    assert(new String(r.getAs[Array[Byte]]("content"), "UTF-8") ==
      r.getAs[String]("text"))
    assert(meta.getAs[String]("format") == "fake/raw")
    assert(meta.getAs[Int]("width") >= 16 && meta.getAs[Int]("height") >= 16)
  }

  test("encodeBatched compresses and decodeBatched restores exact bytes") {
    val raw = media.select("doc_id", "content")
      .as[(Long, Array[Byte])].collect().toMap
    val enc = Multimodal.encodeBatched(media, "doc_id").collect()
      .map(e => e.doc_id -> e.content).toMap
    // real DEFLATE output: a different, shorter stream than the input
    // (the texts are compressible prose), never a pass-through
    assert(enc.keySet == raw.keySet)
    assert(enc.forall { case (id, bytes) => !bytes.sameElements(raw(id)) })
    assert(enc.map(_._2.length).sum < raw.map(_._2.length).sum)
    val dec = Multimodal.decodeBatched(
        Multimodal.encodeBatched(media, "doc_id").toDF(), "doc_id")
      .collect().map(d => d.doc_id -> d.content).toMap
    assert(dec.keySet == raw.keySet)
    assert(dec.forall { case (id, bytes) => bytes.sameElements(raw(id)) })
  }

  test("decodeBatched batching never changes results") {
    val enc = Multimodal.encodeBatched(media, "doc_id", batchSize = 3).toDF()
    val a = Multimodal.mediaFeatures(Multimodal.decodeBatched(enc, "doc_id"))
      .collect().map(f => f.doc_id -> f).toMap
    val b = Multimodal.mediaFeatures(
        Multimodal.decodeBatched(enc, "doc_id", batchSize = 7))
      .collect().map(f => f.doc_id -> f).toMap
    assert(a.keySet.size == 20)
    assert(a == b) // batch size never changes results
    assert(a.values.forall(_.n_bytes > 0))
  }

  test("decodeBatched fails loudly on a corrupt stream") {
    val corrupt = Seq((1L, Array[Byte](1, 2, 3))).toDF("doc_id", "content")
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.decodeBatched(corrupt, "doc_id").collect()
    }
    assert(e.getMessage != null)
  }

  test("mediaFeatures: CRC32 of decoded bytes matches a reference") {
    val f = Multimodal.mediaFeatures(
        Multimodal.decodeBatched(
          Multimodal.encodeBatched(media.filter("doc_id = 0"), "doc_id").toDF(),
          "doc_id"))
      .head()
    val raw = media.filter("doc_id = 0").select("content")
      .as[Array[Byte]].head()
    val crc = new java.util.zip.CRC32()
    crc.update(raw)
    assert(f.n_bytes == raw.length)
    assert(f.checksum == crc.getValue)
  }

  test("fakeFeatures: 8 doubles in [0,1], stable") {
    val feats = Multimodal.fakeFeatures(media)
      .select("features").as[Seq[Double]].collect()
    assert(feats.forall(f => f.length == 8 && f.forall(v => v >= 0 && v <= 1)))
  }

  test("sampleFrames: one row per everyMs tick up to duration") {
    val r = media.filter("doc_id = 0").head()
    val dur = r.getStruct(r.fieldIndex("media_meta")).getAs[Long]("duration_ms")
    val n = Multimodal.sampleFrames(media.filter("doc_id = 0"), "doc_id").count()
    assert(n == dur / 1000 + 1)
  }
}
