package graft.operators

import org.apache.spark.ml.feature.{BucketedRandomProjectionLSH, CountVectorizer, MinHashLSH}
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MLlib-native LSH paths (SURVEY.md §4.3: "MLlib MinHashLSH /
  * BucketedRandomProjectionLSH first") — the library alternative to the
  * hand-rolled signatures in DedupQueries/SimilarityQueries. Both fix
  * seeds, so results are reproducible across runs and partitionings.
  */
object LshOps {

  /** Near-dup candidate pairs over documents via MinHashLSH on a binary
    * token-presence vector (CountVectorizer binary=true ≙ shingle set).
    */
  def minhashNearDups(spark: SparkSession, docs: DataFrame,
                      jaccardDistanceThreshold: Double = 0.8,
                      numHashTables: Int = 8): DataFrame = {
    val toks = docs.select(col("doc_id"), split(col("text"), " ").as("tokens"))
    val cv = new CountVectorizer()
      .setInputCol("tokens").setOutputCol("tf").setBinary(true)
      .fit(toks)
    val vecs = cv.transform(toks)
      .filter(size(col("tokens")) > 0)
    val mh = new MinHashLSH()
      .setInputCol("tf").setOutputCol("hashes")
      .setNumHashTables(numHashTables).setSeed(42L)
    val model = mh.fit(vecs)
    model.approxSimilarityJoin(vecs, vecs, jaccardDistanceThreshold, "jaccard_dist")
      .select(col("datasetA.doc_id").as("id_a"), col("datasetB.doc_id").as("id_b"),
        graft.functions.Metrics.canonRound(col("jaccard_dist"), 4).as("jaccard_dist"))
      .filter(col("id_a") < col("id_b"))
      .orderBy("id_a", "id_b")
  }

  /** Euclidean ANN over embeddings via BucketedRandomProjectionLSH. */
  def euclideanAnn(spark: SparkSession, embeddings: DataFrame,
                   probeIds: Seq[Long], k: Int = 10,
                   bucketLength: Double = 2.0, numHashTables: Int = 4): DataFrame = {
    val vecs = embeddings.select(col("vec_id"),
      array_to_vector(col("embedding")).as("v"))
    val brp = new BucketedRandomProjectionLSH()
      .setInputCol("v").setOutputCol("hashes")
      .setBucketLength(bucketLength).setNumHashTables(numHashTables).setSeed(42L)
    val model = brp.fit(vecs)
    val probes = vecs.filter(col("vec_id").isin(probeIds: _*))
      .collect().map(r => (r.getLong(0), r.getAs[Vector]("v")))
    probes.map { case (qid, qv) =>
      model.approxNearestNeighbors(vecs.filter(col("vec_id") =!= qid), qv, k)
        .select(lit(qid).as("q_id"), col("vec_id"),
          graft.functions.Metrics.canonRound(col("distCol"), 4).as("dist"))
    }.reduce(_.unionByName(_))
      .orderBy("q_id", "dist", "vec_id")
  }
}
