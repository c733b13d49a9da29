package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Metrics
import graft.registry.GQuery

/** Fleiss' kappa inter-annotator agreement (Fleiss 1971, "Measuring
  * nominal scale agreement among many raters" — public literature): the
  * label-quality readout of an annotation pipeline (RLHF preference
  * labels, quality judgments, toxicity flags are all multiply-annotated;
  * chance-corrected agreement is how the pipeline decides whether its
  * raters — human or model — are producing signal or noise).
  *
  * Deterministic annotation synthesis (the PII/q186 injection recipe):
  * 5 raters each label every document with the latent binary quality
  * bit g = (n_chars ≥ 150), flipped with per-rater noise — rater r
  * flips where md5₆₀(r:doc_id) mod 100 < 10 + 5r (10%..30%), so
  * agreement is real but imperfect and DIFFERS by rater, and both
  * engines re-derive the identical annotation table.
  *
  * All of Fleiss' quantities are ratios of INTEGER counts (per-doc
  * pair-agreement numerators Σⱼ nᵢⱼ(nᵢⱼ−1), category marginals), so the
  * arithmetic below runs entirely in IEEE +,−,×,÷ over exact integers —
  * bit-identical cross-engine with no transcendental and no snapping
  * except the display rounding. Reported per source (20 κ values) so
  * the fixture exercises a spread of agreement levels.
  *
  * Scale shape: one generate (docs × 5 raters) → one map-side-combined
  * groupBy(doc) → one map-side-combined groupBy(source). Linear scans,
  * two tiny shuffles, nothing pairwise (the r(r−1) pair counting is
  * algebraic, not enumerated).
  */
object AnnotatorAgreement {

  private val Raters = 5

  /** Synthetic per-(doc, rater) labels — deterministic, engine-portable. */
  def annotations(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("source"),
        (col("n_chars") >= 150).cast("int").as("g"),
        explode(sequence(lit(0), lit(Raters - 1))).as("rater"))
      .withColumn("noise",
        conv(substring(md5(concat_ws(":", col("rater"), col("doc_id"))), 1, 15), 16, 10)
          .cast("long") % 100)
      .withColumn("label",
        when(col("noise") < lit(10) + lit(5) * col("rater"),
          lit(1) - col("g")).otherwise(col("g")))
      .select(col("doc_id"), col("source"), col("rater"), col("label"))

  def fleissKappa(docs: DataFrame): DataFrame =
    kappaFromAnnotations(annotations(docs))

  /** Fleiss' κ per source from an (doc_id, source, label∈{0,1}) table
    * with [[Raters]] labels per doc — the math, separated from the
    * synthesis so specs can drive hand-computed examples through it.
    */
  def kappaFromAnnotations(ann: DataFrame): DataFrame = {
    val r = Raters
    val perDoc = ann
      .groupBy("doc_id", "source")
      .agg(sum("label").cast("long").as("n1"), count(lit(1)).as("nr"))
      .withColumn("n0", col("nr") - col("n1"))
      // per-doc agreement numerator: Σ_j n_j(n_j − 1), over r(r−1) pairs
      .withColumn("agree_num", col("n1") * (col("n1") - 1) + col("n0") * (col("n0") - 1))
    perDoc.groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum("agree_num").as("agree_sum"),
        sum("n1").as("votes_pos"))
      .select(col("source"), col("n_docs"), col("votes_pos"),
        // P̄ = Σᵢ agree_num / (n·r(r−1)); p₁ = Σ n1/(n·r); Pe = p0²+p1²
        (col("agree_sum").cast("double") /
          (col("n_docs") * (r * (r - 1))).cast("double")).as("pbar"),
        (col("votes_pos").cast("double") / (col("n_docs") * r).cast("double")).as("p1"))
      .withColumn("pe", col("p1") * col("p1") + (lit(1.0) - col("p1")) * (lit(1.0) - col("p1")))
      .select(col("source"), col("n_docs"), col("votes_pos"),
        Metrics.canonRound(col("pbar"), 6).as("pbar_r"),
        Metrics.canonRound(col("pe"), 6).as("pe_r"),
        Metrics.canonRound(
          (col("pbar") - col("pe")) / nullif(lit(1.0) - col("pe"), lit(0.0)),
          6).as("kappa_r"))
      .orderBy("source")
  }

  val q234 = GQuery(
    "q234_fleiss_kappa",
    (s, dir) => fleissKappa(Tables.documents(s, dir)),
    Some("""WITH ann AS (
        SELECT d.doc_id, d.source, r.rater,
          CASE WHEN CAST(('0x' || substr(md5(CAST(r.rater AS VARCHAR) || ':'
                 || CAST(d.doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100
               < 10 + 5 * r.rater
            THEN 1 - (CASE WHEN d.n_chars >= 150 THEN 1 ELSE 0 END)
            ELSE (CASE WHEN d.n_chars >= 150 THEN 1 ELSE 0 END) END AS label
        FROM documents d
        CROSS JOIN (SELECT unnest(generate_series(0, 4)) AS rater) r),
      per_doc AS (
        SELECT doc_id, source,
          CAST(sum(label) AS BIGINT) AS n1,
          count(*) AS nr
        FROM ann GROUP BY 1, 2),
      per_doc2 AS (
        SELECT source, n1, nr - n1 AS n0,
          n1 * (n1 - 1) + (nr - n1) * (nr - n1 - 1) AS agree_num
        FROM per_doc),
      agg AS (
        SELECT source, count(*) AS n_docs,
          CAST(sum(agree_num) AS BIGINT) AS agree_sum,
          CAST(sum(n1) AS BIGINT) AS votes_pos
        FROM per_doc2 GROUP BY 1),
      stats AS (
        SELECT source, n_docs, votes_pos,
          CAST(agree_sum AS DOUBLE) / CAST(n_docs * 20 AS DOUBLE) AS pbar,
          CAST(votes_pos AS DOUBLE) / CAST(n_docs * 5 AS DOUBLE) AS p1
        FROM agg),
      stats2 AS (
        SELECT source, n_docs, votes_pos, pbar,
          p1 * p1 + (1.0 - p1) * (1.0 - p1) AS pe
        FROM stats)
      SELECT source, n_docs, votes_pos,
        floor((pbar)*1e6+0.5)/1e6 AS pbar_r,
        floor((pe)*1e6+0.5)/1e6 AS pe_r,
        floor(((pbar - pe) / nullif(1.0 - pe, 0.0))*1e6+0.5)/1e6 AS kappa_r
      FROM stats2 ORDER BY source"""))

  val all: Seq[GQuery] = Seq(q234)
}
