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

  test("decodeBatched (mapPartitions batching) is deterministic and total") {
    val f1 = Multimodal.decodeBatched(media, "doc_id").collect()
      .map(f => f.doc_id -> f).toMap
    val f2 = Multimodal.decodeBatched(media, "doc_id", batchSize = 3).collect()
      .map(f => f.doc_id -> f).toMap
    assert(f1.keySet.size == 20)
    assert(f1 == f2) // batch size never changes results
    assert(f1.values.forall(_.n_bytes > 0))
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
