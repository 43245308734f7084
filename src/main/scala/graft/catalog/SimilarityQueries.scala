package graft.catalog

import org.apache.spark.sql.functions._

import graft.Tables
import graft.similarity.Similarity

/** Similarity-search coverage over `embeddings` (64-dim float vectors).
  * The oracle query mirrors an explode+sum plan whose double arithmetic is
  * identical on both engines after ROUND(6); the LSH variant has no SQL
  * oracle (xxhash64-derived planes) and is pinned by SimilaritySpec's
  * recall test instead.
  */
object SimilarityQueries {

  /** Shared oracle for exact cosine top-10 vs vec_id 0 — both the
    * explode-based plan (q39) and the native-Expression plan (q43) must
    * reproduce it after ROUND(6).
    */
  private val cosineTopkSql =
    """WITH q AS (
      |  SELECT generate_subscripts(embedding, 1) AS i,
      |         CAST(UNNEST(embedding) AS DOUBLE) AS qx
      |  FROM embeddings WHERE vec_id = 0),
      |e AS (
      |  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
      |         CAST(UNNEST(embedding) AS DOUBLE) AS x
      |  FROM embeddings),
      |dots AS (
      |  SELECT e.vec_id, SUM(e.x * q.qx) AS dot, SUM(e.x * e.x) AS n2
      |  FROM e JOIN q USING (i) GROUP BY e.vec_id),
      |qn AS (SELECT SUM(qx * qx) AS qn2 FROM q)
      |SELECT vec_id, ROUND(dot / (SQRT(n2) * SQRT(qn2)), 6) AS cosine
      |FROM dots, qn WHERE vec_id <> 0
      |ORDER BY cosine DESC, vec_id LIMIT 10""".stripMargin

  val all: Map[String, Q] = Map(

    // ----- brute-force cosine top-10 vs vec_id 0 (exact baseline) -----
    "q39_cosine_topk" -> Q(
      (s, dir) => {
        val e = Tables(s, dir, "embeddings")
          .select(col("vec_id"), posexplode(col("embedding")).as(Seq("i", "x")))
          .select(col("vec_id"), col("i"), col("x").cast("double").as("x"))
        val q = e.filter(col("vec_id") === 0)
          .select(col("i"), col("x").as("qx"))
        val qn = q.agg(sum(col("qx") * col("qx")).as("qn2"))
        e.join(q, "i")
          .groupBy("vec_id")
          .agg(sum(col("x") * col("qx")).as("dot"),
            sum(col("x") * col("x")).as("n2"))
          .crossJoin(broadcast(qn))
          .filter(col("vec_id") =!= 0)
          .select(col("vec_id"),
            round(col("dot") / (sqrt(col("n2")) * sqrt(col("qn2"))), 6)
              .as("cosine"))
          .orderBy(desc("cosine"), col("vec_id")).limit(10)
      },
      Some(cosineTopkSql),
      "exact cosine top-k, double-accumulated both engines"),

    // ----- same query through the native codegen'd Expression -----
    "q43_cosine_topk_native" -> Q(
      (s, dir) => {
        graft.functions.Vectors.register(s)
        val emb = Tables(s, dir, "embeddings")
        val query = emb.filter(col("vec_id") === 0)
          .select("embedding").head().getSeq[Float](0)
        emb.filter(col("vec_id") =!= 0)
          .select(col("vec_id"),
            round(graft.functions.Vectors.cosineSim(
              col("embedding"), typedlit(query)), 6).as("cosine"))
          .orderBy(desc("cosine"), col("vec_id")).limit(10)
      },
      Some(cosineTopkSql),
      "cosine top-k via the fused codegen CosineSimilarity Expression"),

    // ----- LSH-bucketed ANN (scale path; no SQL oracle) -----
    "q40_ann_lsh" -> Q(
      (s, dir) => {
        val emb = Tables(s, dir, "embeddings")
        val query = emb.filter(col("vec_id") === 0)
          .select("embedding").head().getSeq[Float](0)
        Similarity.annTopK(
          Similarity.withBuckets(emb.filter(col("vec_id") =!= 0), "embedding",
            nPlanes = 8),
          "vec_id", "embedding", query, k = 10, nPlanes = 8, probe = 2)
      },
      None,
      "sign-random-projection LSH, multiprobe bucket pruning"),

    // ----- indexed ANN end-to-end: build + probe a persisted index -----
    // Exercises the full scale path in one entry: bucket the corpus,
    // persist hive-partitioned by bucket (buildIndex), then probe via the
    // multiprobe IN list so only probed bucket DIRECTORIES are read
    // (PartitionFilters — pinned by SimilaritySpec). Rows-only like q40
    // (xxhash64-derived planes aren't SQL-expressible); the timing
    // honestly includes the (re)build, which is the indexing job a real
    // pipeline pays once per corpus snapshot.
    "q62_ann_indexed" -> Q(
      (s, dir) => {
        val emb = Tables(s, dir, "embeddings")
        val query = emb.filter(col("vec_id") === 0)
          .select("embedding").head().getSeq[Float](0)
        val path = new java.io.File(
          sys.props("java.io.tmpdir"),
          s"graft_ann_index_${Integer.toHexString(dir.hashCode)}").getPath
        Similarity.buildIndex(emb.filter(col("vec_id") =!= 0), "embedding",
          path, nPlanes = 8)
        Similarity.annTopKIndexed(s, path, "vec_id", "embedding", query,
          k = 10, nPlanes = 8, probe = 2)
      },
      None,
      "build hive-partitioned LSH index, probe via partition pruning"),

    // ----- IVF ANN with ALL cells probed: exact, so fully oracled -----
    // The learned KMeans quantizer itself isn't SQL-expressible, but with
    // nProbe == nLists every cell is probed, so the result must equal the
    // exact brute-force top-k REGARDLESS of what the quantizer learned —
    // the assignment/probe/score plumbing runs end-to-end under the same
    // DuckDB oracle as q39/q43. Partial-probe recall is pinned by IvfSpec.
    "q63_ivf_full_probe" -> Q(
      (s, dir) => {
        val emb = Tables(s, dir, "embeddings")
        val query = emb.filter(col("vec_id") === 0)
          .select("embedding").head().getSeq[Float](0)
        val index = graft.similarity.Ivf.build(
          emb.filter(col("vec_id") =!= 0), "embedding", nLists = 8)
        graft.similarity.Ivf.topK(index, "vec_id", "embedding", query,
          k = 10, nProbe = 8)
      },
      Some(cosineTopkSql),
      "IVF build + probe-all-cells == exact top-k, DuckDB-oracled")
  )
}
