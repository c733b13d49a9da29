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

  /** Euclidean ANN over embeddings via BucketedRandomProjectionLSH, as ONE
    * batch dataflow: hash the corpus once, then candidates = probes ⋈
    * corpus on (hash-table index, bucket) — the same ≥1-shared-bucket
    * candidate set `approxNearestNeighbors` scans per key — and a per-probe
    * top-k window over the exact distance. A probe table of any size is
    * one job, vs the per-probe driver loop this replaces (a 10k-probe
    * batch would have launched 10k Spark jobs; OpsSpec pins parity with
    * that per-probe formulation on the fixture probes).
    */
  def euclideanAnn(spark: SparkSession, embeddings: DataFrame,
                   probeIds: Seq[Long], k: Int = 10,
                   bucketLength: Double = 2.0, numHashTables: Int = 4): DataFrame = {
    import org.apache.spark.ml.functions.vector_to_array
    val vecs = embeddings.select(col("vec_id"),
      array_to_vector(col("embedding")).as("v"))
    val brp = new BucketedRandomProjectionLSH()
      .setInputCol("v").setOutputCol("hashes")
      .setBucketLength(bucketLength).setNumHashTables(numHashTables).setSeed(42L)
    val model = brp.fit(vecs)
    // (vec_id, v, hash-table index, bucket): BRP buckets are 1-dim vectors
    val keyed = model.transform(vecs)
      .select(col("vec_id"), col("v"), posexplode(col("hashes")).as(Seq("ht", "hv")))
      .withColumn("bucket", vector_to_array(col("hv")).getItem(0))
      .drop("hv")
    val probes = keyed.filter(col("vec_id").isin(probeIds: _*))
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("ht"), col("bucket"))
    val cands = keyed.join(broadcast(probes), Seq("ht", "bucket"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        call_function("graft_l2dist",
          vector_to_array(col("qv")), vector_to_array(col("v"))).as("dist"))
      // a pair sharing buckets in several tables has the same exact
      // distance each time — min() is the dedup
      .groupBy("q_id", "vec_id").agg(min(col("dist")).as("dist"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("dist").asc, col("vec_id").asc)
    cands.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k).drop("rn")
      .select(col("q_id"), col("vec_id"),
        graft.functions.Metrics.canonRound(col("dist"), 4).as("dist"))
      .orderBy("q_id", "dist", "vec_id")
  }

  /** The per-probe formulation euclideanAnn replaced — kept as the parity
    * reference for OpsSpec only (each probe is a separate
    * approxNearestNeighbors job; never use in a pipeline).
    */
  private[operators] def euclideanAnnPerProbe(spark: SparkSession, embeddings: DataFrame,
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
