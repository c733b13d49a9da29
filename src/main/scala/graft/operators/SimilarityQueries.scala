package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.VectorOps
import graft.registry.GQuery

/** Similarity search over the `embeddings` fixture (ARRAY<FLOAT>, 64-dim).
  *
  * Two paths, as the north star prescribes:
  *  - brute-force cosine top-k — the exact baseline. Query side is tiny and
  *    broadcast; the corpus side streams. O(|corpus| × |queries|), which is
  *    the right plan whenever |queries| is small.
  *  - LSH-bucketed (random hyperplane signatures) — the scale path: corpus
  *    and probes are bucketed by signature, the join is equi on the bucket
  *    key, so candidate generation is a hash join, not a cross product.
  */
object SimilarityQueries {

  /** Brute-force cosine top-k for a fixed probe set (vec_id < 5), exact,
    * verified against DuckDB's list_cosine_similarity in double precision.
    */
  val q50 = GQuery(
    "q50_knn_bruteforce",
    (s, dir) => {
      val e = Tables.embeddings(s, dir)
      val probes = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      val sims = e.join(broadcast(probes), col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id"),
          graft.functions.Metrics.canonRound(VectorOps.cosine(col("q_vec"), col("embedding")), 6).as("cos_sim"))
      val w = Window.partitionBy("q_id").orderBy(col("cos_sim").desc, col("vec_id").asc)
      sims.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 10)
        .orderBy("q_id", "rank")
    },
    Some("""WITH probes AS (
        SELECT vec_id AS q_id, embedding AS q_vec FROM embeddings WHERE vec_id < 5),
      sims AS (
        SELECT q_id, vec_id,
          floor((list_cosine_similarity(CAST(q_vec AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) * 1e6 + 0.5)/1e6 AS cos_sim
        FROM embeddings CROSS JOIN probes WHERE vec_id <> q_id),
      ranked AS (
        SELECT q_id, vec_id, cos_sim,
          row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, vec_id ASC) AS rank
        FROM sims)
      SELECT q_id, vec_id, cos_sim, CAST(rank AS INT) AS rank
      FROM ranked WHERE rank <= 10 ORDER BY q_id, rank"""))

  /** Deterministic pseudo-random ±1 hyperplane component for (plane, dim):
    * parity of a 64-bit avalanche hash — reproducible across runs/engines
    * with no RNG state.
    */
  private def planeSign(plane: Int, d: Int): Double = {
    var x = plane.toLong * 1000003L + d.toLong * 7919L + 0x9e3779b97f4a7c15L
    x ^= x >>> 33; x *= 0xff51afd7ed558ccdL
    x ^= x >>> 33; x *= 0xc4ceb9fe1a85ec53L
    x ^= x >>> 33
    if ((x & 1L) == 0L) 1.0 else -1.0
  }

  /** Random-hyperplane signature: bit p = sign(<v, plane_p>). Each plane
    * dot is the codegen'd graft_dot kernel against a literal ±1 array —
    * the per-row signature is the scan-side hot path of LSH at scale, so
    * it must stay inside WholeStageCodegen (the zip_with/aggregate form
    * it replaces was CodegenFallback; same accumulation order, same bits).
    */
  def simhashSignature(v: org.apache.spark.sql.Column, nPlanes: Int, dim: Int): org.apache.spark.sql.Column = {
    val vd = graft.functions.VectorOps.asDouble(v)
    val bits = (0 until nPlanes).map { p =>
      val signs = array((0 until dim).map(d => lit(planeSign(p, d))): _*)
      val dot = call_function("graft_dot", vd, signs)
      when(dot >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a + b)
  }

  /** ANN via banded hyperplane-LSH: 16 planes split into 2 bands of 8 bits.
    * A corpus vector is a candidate if it matches a probe on EITHER band
    * (multi-probe OR-amplification), so recall survives single-bit flips
    * while candidate generation stays an equi hash join on (band, value) —
    * the 100 TB plan; no cross product anywhere. Spark-only (not
    * SQL-expressible → rows-only correctness check).
    */
  val q51 = GQuery(
    "q51_ann_lsh",
    (s, dir) => {
      val dim = 64; val nPlanes = 16; val bandBits = 8
      val nBands = nPlanes / bandBits
      val e = Tables.embeddings(s, dir)
        .withColumn("sig", simhashSignature(col("embedding"), nPlanes, dim))
        .withColumn("bb", explode(array((0 until nBands).map { b =>
          struct(lit(b).as("band"),
            shiftright(col("sig"), b * bandBits).bitwiseAND((1L << bandBits) - 1).as("bh"))
        }: _*)))
        .select(col("vec_id"), col("embedding"), col("bb.band"), col("bb.bh"))
      val probes = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"), col("band"), col("bh"))
      val cands = e.join(broadcast(probes), Seq("band", "bh"))
        .filter(col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id"), col("q_vec"), col("embedding"))
        .distinct() // a pair may match on both bands
        .select(col("q_id"), col("vec_id"),
          graft.functions.Metrics.canonRound(VectorOps.cosine(col("q_vec"), col("embedding")), 6).as("cos_sim"))
      val w = Window.partitionBy("q_id").orderBy(col("cos_sim").desc, col("vec_id").asc)
      cands.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 10)
        .orderBy("q_id", "rank")
    },
    None)

  /** Embedding-cosine near-duplicate pairs on a deterministic sample —
    * the embedding flavor of dedup. Exact on the sample; the full-corpus
    * variant routes through q51's LSH bucketing first.
    */
  val q52 = GQuery(
    "q52_embedding_neardup",
    (s, dir) => {
      val d = Tables.embeddings(s, dir).filter(col("vec_id") % 5 === 0)
      val a = d.select(col("vec_id").as("id_a"), col("embedding").as("va"), col("label").as("label_a"))
      val b = d.select(col("vec_id").as("id_b"), col("embedding").as("vb"), col("label").as("label_b"))
      a.join(b, col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"), col("label_a"), col("label_b"),
          graft.functions.Metrics.canonRound(VectorOps.cosine(col("va"), col("vb")), 6).as("cos_sim"))
        .filter(col("cos_sim") > 0.25)
        .orderBy("id_a", "id_b")
    },
    Some("""WITH d AS (SELECT vec_id, embedding, label FROM embeddings WHERE vec_id % 5 = 0)
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             a.label AS label_a, b.label AS label_b,
             floor((list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                          CAST(b.embedding AS DOUBLE[]))) * 1e6 + 0.5)/1e6 AS cos_sim
      FROM d a JOIN d b ON a.vec_id < b.vec_id
      WHERE floor((list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                         CAST(b.embedding AS DOUBLE[]))) * 1e6 + 0.5)/1e6 > 0.25
      ORDER BY id_a, id_b"""))

  /** IVF-bucketed ANN (coarse k-means quantizer + probed inverted lists).
    * KMeans is iterative/seeded → not SQL-expressible → rows-only; the
    * recall-vs-brute-force property is asserted in SimilaritySpec.
    */
  val q53 = GQuery(
    "q53_ann_ivf",
    (s, dir) => {
      val (indexed, centroids) = IvfAnn.buildIndex(s, Tables.embeddings(s, dir), nList = 16)
      IvfAnn.search(indexed, centroids, probeIds = Seq(0L, 1L, 2L, 3L, 4L), k = 10, nProbe = 4)
    },
    None)

  def all: Seq[GQuery] = Seq(q50, q51, q52, q53)
}
