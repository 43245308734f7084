package graft.similarity

import org.apache.spark.ml.clustering.{KMeans, KMeansModel}
import org.apache.spark.ml.linalg.{Vector, Vectors => MlVectors}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** IVF (inverted-file) ANN: a learned coarse quantizer (MLlib KMeans)
  * partitions the corpus into `nLists` cells; a query scores only the
  * `nProbe` cells whose centroids are nearest. The learned-centroid
  * complement to the data-independent sign-LSH in [[Similarity]] — on
  * clustered real-world embeddings IVF probes far fewer vectors for the
  * same recall.
  *
  * Scale shape: fit samples the corpus (KMeans on a bounded sample),
  * assignment is one narrow map, and the cell id becomes a partition
  * key — a probe is partition pruning, exactly like the LSH bucket.
  * Unlike LSH the model is fitted state: persist `model` (or its
  * centroids) alongside the index.
  */
object Ivf {

  final case class IvfIndex(model: KMeansModel, indexed: DataFrame)

  /** Codegen'd array<float> → ml.Vector (no Scala UDF in the hot path). */
  private def toMlVec(c: org.apache.spark.sql.Column) =
    org.apache.spark.ml.functions.array_to_vector(c)

  /** Fit the coarse quantizer and assign every vector to its cell.
    *
    * The KMeans fit runs on a bounded sample (`fitSampleRows` rows
    * expected, seeded Bernoulli — one pass, no count-then-sample): at
    * 100 TB the quantizer needs thousands of points, not the corpus.
    * Assignment then maps the FULL corpus through the fitted model.
    */
  def build(emb: DataFrame, vecCol: String, nLists: Int = 16,
            seed: Long = 42L, fitSampleRows: Long = 100000L): IvfIndex = {
    val withFeatures = emb.withColumn("features", toMlVec(col(vecCol)))
    val n = emb.count()
    val fitOn =
      if (n <= fitSampleRows) withFeatures
      else withFeatures.sample(fitSampleRows.toDouble / n, seed)
    val model = new KMeans()
      .setK(nLists).setSeed(seed).setFeaturesCol("features")
      .setPredictionCol("cell")
      .fit(fitOn)
    IvfIndex(model, model.transform(withFeatures).drop("features"))
  }

  /** Top-k via the `nProbe` nearest cells only. */
  def topK(index: IvfIndex, idCol: String, vecCol: String,
           query: Seq[Float], k: Int, nProbe: Int = 4): DataFrame = {
    val q = MlVectors.dense(query.map(_.toDouble).toArray)
    val probeCells = index.model.clusterCenters.zipWithIndex
      .map { case (c, i) => (MlVectors.sqdist(c, q), i) }
      .sortBy(_._1).take(nProbe).map(_._2)
    Similarity.bruteForceTopK(
      index.indexed.filter(col("cell")
        .isin(probeCells.toIndexedSeq.map(x => x: Any): _*)),
      idCol, vecCol, query, k)
  }
}
