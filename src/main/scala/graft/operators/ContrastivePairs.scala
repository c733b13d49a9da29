package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{Metrics, VectorOps}

/** Contrastive training-pair generation over a labeled embedding corpus —
  * the data-prep step for supervised-contrastive / triplet-loss training
  * (Schroff et al. 2015 FaceNet; Khosla et al. 2020 SupCon): each anchor
  * gets its hardest in-class positive (highest cosine, i.e. the most
  * informative same-label pair here: agreement confirmed by geometry) and
  * deterministic pseudo-random out-of-class negatives.
  *
  * Scale shapes — no all-pairs anywhere:
  *  - positives: the candidate join is EQUI on the label (class blocking);
  *    per-anchor argmax by one row_number window. At 100 TB a giant class
  *    adds an LSH-bucket term to the join key (the q103 band pattern) so
  *    in-class candidates stay bounded.
  *  - negatives: candidates restricted to md5-hash ring neighbors —
  *    anchor bucket b probes bucket (b+1) % nBuckets only, an equi join
  *    whose per-anchor candidate count is |corpus|/nBuckets; ranking is
  *    the md5 pair hash, so the draw is reproducible (the ShardExport
  *    seeded-shuffle idea applied to sampling). nBuckets scales with the
  *    corpus to keep candidates-per-anchor constant.
  *
  * Everything is hash/rounding-deterministic, so the full triple table is
  * DuckDB-verifiable (q128).
  */
object ContrastivePairs {

  /** (anchor_id, pos_id, pos_cos, neg1_id, neg2_id) for every anchor in
    * `anchorPred`'s slice of `e` (vec_id, embedding, label).
    */
  def triples(e: DataFrame, anchorPred: org.apache.spark.sql.Column,
              nBuckets: Int = 8): DataFrame = {
    val base = e.select(col("vec_id"), col("embedding"), col("label"),
      pmod(conv(substring(md5(col("vec_id").cast("string")), 1, 15), 16, 10).cast("long"),
        lit(nBuckets.toLong)).as("bucket"))
    val anchors = base.filter(anchorPred)
      .select(col("vec_id").as("anchor_id"), col("embedding").as("a_emb"),
        col("label").as("a_label"), col("bucket").as("a_bucket"))

    val pos = anchors.join(base, anchors("a_label") === base("label") &&
        anchors("anchor_id") =!= base("vec_id"))
      .withColumn("cos", Metrics.canonRound(VectorOps.cosine(col("a_emb"), col("embedding")), 6))
      .withColumn("rk", row_number().over(
        Window.partitionBy("anchor_id").orderBy(col("cos").desc, col("vec_id"))))
      .filter(col("rk") === 1)
      .select(col("anchor_id"), col("vec_id").as("pos_id"), col("cos").as("pos_cos"))

    val negCand = anchors.join(base,
        pmod(anchors("a_bucket") + 1, lit(nBuckets)) === base("bucket") &&
          anchors("a_label") =!= base("label"))
      .withColumn("ph", md5(concat_ws(":", col("anchor_id"), col("vec_id"))))
      .withColumn("rk", row_number().over(
        Window.partitionBy("anchor_id").orderBy(col("ph"), col("vec_id"))))
      .filter(col("rk") <= 2)
    val negs = negCand.groupBy("anchor_id").agg(
      min(when(col("rk") === 1, col("vec_id"))).as("neg1_id"),
      min(when(col("rk") === 2, col("vec_id"))).as("neg2_id"))

    pos.join(negs, Seq("anchor_id"), "left")
      .orderBy("anchor_id")
  }

  /** DuckDB twin of [[triples]] for anchors `vec_id % modFilter = 0`. */
  def oracleSql(modFilter: Int, nBuckets: Int): String =
    s"""WITH e AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb, label,
        CAST(('0x' || substr(md5(CAST(vec_id AS VARCHAR)),1,15)) AS BIGINT) % $nBuckets AS bucket
      FROM embeddings),
      a AS (SELECT vec_id AS anchor_id, emb AS a_emb, label AS a_label, bucket AS a_bucket
            FROM e WHERE vec_id % $modFilter = 0),
      p0 AS (SELECT a.anchor_id, e.vec_id,
          floor(list_cosine_similarity(a.a_emb, e.emb)*1e6 + 0.5)/1e6 AS cos
        FROM a JOIN e ON a.a_label = e.label AND a.anchor_id <> e.vec_id),
      p AS (SELECT anchor_id, vec_id AS pos_id, cos AS pos_cos FROM (
          SELECT *, row_number() OVER (PARTITION BY anchor_id ORDER BY cos DESC, vec_id) AS rk
          FROM p0) WHERE rk = 1),
      n0 AS (SELECT a.anchor_id, e.vec_id,
          md5(CAST(a.anchor_id AS VARCHAR) || ':' || CAST(e.vec_id AS VARCHAR)) AS ph
        FROM a JOIN e ON (a.a_bucket + 1) % $nBuckets = e.bucket AND a.a_label <> e.label),
      n1 AS (SELECT anchor_id, vec_id, rk FROM (
          SELECT *, row_number() OVER (PARTITION BY anchor_id ORDER BY ph, vec_id) AS rk
          FROM n0) WHERE rk <= 2),
      n AS (SELECT anchor_id,
          min(CASE WHEN rk = 1 THEN vec_id END) AS neg1_id,
          min(CASE WHEN rk = 2 THEN vec_id END) AS neg2_id
        FROM n1 GROUP BY anchor_id)
      SELECT p.anchor_id, p.pos_id, p.pos_cos, n.neg1_id, n.neg2_id
      FROM p LEFT JOIN n USING (anchor_id)
      ORDER BY p.anchor_id"""
}
