package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{Metrics, VectorOps}

/** Deterministic Lloyd's k-means over an embedding column — the classic
  * distributed clustering loop (assign to nearest centroid → recompute
  * means), with every quantity pinned so the WHOLE iteration is
  * cross-engine reproducible: seeding is the k lowest vec_ids (no RNG),
  * distances and centroid coordinates are canonically rounded each round,
  * means use the order-independent decimal accumulation, and argmin ties
  * break by centroid id. q53's MLlib KMeans demonstrates the library
  * path; this operator is the one whose every round a DuckDB oracle
  * replays (q127) — the same unrolled-CTE pattern as PageRank (q122).
  *
  * Scale shape per round: centroids are k×dim scalars — broadcast as a
  * literal frame (the distributed-build→literal pattern); assignment is a
  * broadcast join + a struct-min hash aggregation per point (map-side
  * partial combine, no sort of the n·k scored rows); the update is
  * posexplode → hash agg on (cluster, dim), map-side combinable. The
  * driver holds k×dim doubles per round, never the data.
  */
object KMeansLloyd {

  /** Returns (vec_id, cluster, dist): the final-round assignment and its
    * rounded distance-to-centroid.
    */
  def fit(e: DataFrame, k: Int, rounds: Int): DataFrame =
    fitDetailed(e, k, rounds)._1

  /** [[fit]] plus the centroids the final assignment was computed
    * against (i.e. the state BEFORE the last mean update) — what a spec
    * needs to check assignment optimality independently.
    */
  def fitDetailed(e: DataFrame, k: Int, rounds: Int): (DataFrame, Seq[(Long, Seq[Double])]) = {
    require(rounds >= 1, s"k-means needs at least one round, got $rounds")
    val spark = e.sparkSession
    import spark.implicits._
    val pts = e.select(col("vec_id"), VectorOps.asDouble(col("embedding")).as("emb")).cache()
    // Seed with the k lowest vec_ids as documented — an order-by/limit,
    // not `vec_id < k`, so non-contiguous or non-zero-based ids still
    // yield exactly k centroids.
    var centroids: Seq[(Long, Seq[Double])] = pts.orderBy("vec_id").limit(k).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toSeq)).toSeq
    var assigned: DataFrame = null
    var usedCentroids = centroids
    for (_ <- 1 to rounds) {
      usedCentroids = centroids
      val cdf = centroids.toDF("cid", "c")
      // argmin as min(struct(d, cid)): lexicographic struct ordering IS
      // the cid-tie-broken nearest-centroid rule, computed as a hash agg
      // with map-side partial combine instead of a full sort-shuffle of
      // the n·k scored rows per round (PqLloyd.assign's reasoning; the
      // oracle's row_number replay is value-identical).
      assigned = pts.crossJoin(broadcast(cdf))
        .withColumn("d",
          Metrics.canonRound(call_function("graft_l2dist", col("emb"), col("c")), 6))
        .groupBy("vec_id")
        .agg(min(struct(col("d"), col("cid"))).as("m"))
        .select(col("vec_id"), col("m.cid").as("cid"), col("m.d").as("d"))
      val upd = assigned.join(pts, "vec_id")
        .select(col("cid"), posexplode(col("emb")))
        .toDF("cid", "i", "v")
        .groupBy("cid", "i")
        .agg(Metrics.canonRound(Metrics.exactMean(col("v")), 6).as("m"))
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
      val byCid = upd.groupBy(_._1).map { case (cid, xs) =>
        cid -> xs.sortBy(_._2).map(_._3).toSeq
      }
      // an emptied cluster keeps its centroid (both engines agree on this)
      centroids = centroids.map { case (cid, old) => (cid, byCid.getOrElse(cid, old)) }
    }
    // Materialize the final-round assignment while the point cache is
    // still live: unpersisting first would make every downstream read of
    // the returned frame re-derive the whole embedding lineage.
    val out = assigned
      .select(col("vec_id"), col("cid").cast("int").as("cluster"), col("d").as("dist"))
      .orderBy("vec_id").cache()
    out.count()
    pts.unpersist()
    (out, usedCentroids)
  }

  /** The unrolled assignment/update round CTEs, shared with the
    * operators that embed a Lloyd quantizer (IvfLloyd). Assumes CTEs
    * `e(vec_id, emb DOUBLE[])` (the clustering space) and
    * `c0(cid, c)` (the seeds) are already defined; defines
    * `m$r` (round-r assignment) and `c${r}f` (round-r centroids).
    * Round states are MATERIALIZED — inlined CTE chains go exponential
    * (see BpeMerge.oracleSql).
    */
  def roundCtes(rounds: Int, dim: Int): String =
    (1 to rounds).map { r =>
      val prev = if (r == 1) "c0" else s"c${r - 1}f"
      s"""a$r AS (SELECT e.vec_id, c.cid, floor(list_distance(e.emb, c.c)*1e6+0.5)/1e6 AS d
        FROM e, $prev c),
      m$r AS MATERIALIZED (SELECT vec_id, cid, d FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rk FROM a$r)
        WHERE rk = 1),
      u$r AS (SELECT m.cid, g.i,
        floor((CAST(sum(CAST(floor(e.emb[g.i]*1e4+0.5)/1e4 AS DECIMAL(18,4))) AS DOUBLE)/count(*))*1e6+0.5)/1e6 AS v
        FROM m$r m JOIN e USING (vec_id), (SELECT unnest(range(1, ${dim + 1})) AS i) g
        GROUP BY m.cid, g.i),
      cn$r AS (SELECT cid, list(v ORDER BY i) AS c FROM u$r GROUP BY cid),
      c${r}f AS MATERIALIZED (SELECT p.cid, coalesce(n.c, p.c) AS c
        FROM $prev p LEFT JOIN cn$r n USING (cid))"""
    }.mkString(",\n      ")

  /** DuckDB twin of [[fit]]: `rounds` unrolled rounds over the raw
    * embeddings. */
  def oracleSql(k: Int, rounds: Int, dim: Int): String =
    s"""WITH e AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
      c0 AS MATERIALIZED (SELECT vec_id AS cid, emb AS c FROM e ORDER BY vec_id LIMIT $k),
      ${roundCtes(rounds, dim)}
      SELECT vec_id, CAST(cid AS INTEGER) AS cluster, d AS dist
      FROM m$rounds ORDER BY vec_id"""
}
