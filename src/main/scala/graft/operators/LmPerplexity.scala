package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Metrics
import graft.registry.GQuery

/** N-gram language-model perplexity filtering (the CCNet recipe,
  * Wenzek et al. 2020 — public literature; KenLM perplexity is THE
  * classic LM-side quality signal next to classifier gates). Completes
  * the curation trio: q230 does importance resampling (DSIR), q228 a
  * learned classifier gate, this the LM-perplexity filter — train a
  * smoothed bigram model on half the corpus, score the held-out half,
  * flag the worst documents per language.
  *
  * Model: per-lang bigram LM with add-half smoothing,
  * P(w2|w1) = (c(w1 w2) + ½) / (c(w1 ·) + ½·V). The fixture vocabulary
  * is ~31 tokens per lang, so the model table is the FULL V² grid
  * (~4.8k rows over 5 langs) — every in-vocab bigram, seen or unseen,
  * has a finite probability; only out-of-vocab words go through the
  * n_oov audit path.
  *
  * Determinism (the q230-λ recipe): ln runs ONCE per bigram TYPE over
  * the tiny grid and is snapped at 1e-6 into DECIMAL(18,6); a
  * document's log-likelihood is then an exact decimal sum of snapped
  * type scores, and its NLL one IEEE division + snap. The DuckDB
  * oracle replays training, the grid, scoring, and the per-lang
  * worst-k ranking.
  *
  * Scale shape: training is one map-side-combinable count over the
  * train half; the model grid is broadcast into the scoring join
  * (fan-out 1 per bigram occurrence); the worst-k ranking is the
  * bounded-heap TopK per lang (map-side combine, never a full sort).
  */
object LmPerplexity {

  val WorstK = 50

  private def bigrams(df: DataFrame, ids: Seq[String]): DataFrame =
    df.select(ids.map(col) :+ call_function("graft_shingles", col("text")).as("f"): _*)

  /** The V²-grid bigram model (lang, f, lp) — lp snapped DECIMAL(18,6). */
  def modelGrid(train: DataFrame): DataFrame = {
    val tbc = bigrams(train, Seq("lang"))
      .groupBy("lang", "f").agg(count(lit(1)).as("cf"))
    val w1c = tbc
      .groupBy(col("lang"), substring_index(col("f"), " ", 1).as("w1"))
      .agg(sum("cf").as("cw"))
    // ~31 tokens × 5 langs after distinct; feeds the grid's two sides
    // and the vocab size — cached so the train half scans once for it
    // (the q229 tiny-ranked-state precedent)
    val toks = train
      .select(col("lang"), explode(split(col("text"), " ")).as("w"))
      .distinct()
      .cache()
    val v = toks.groupBy("lang").agg(count(lit(1)).as("v"))
    toks.select(col("lang"), col("w").as("w1"))
      .join(toks.select(col("lang"), col("w").as("w2")), "lang")
      .withColumn("f", concat(col("w1"), lit(" "), col("w2")))
      .join(tbc, Seq("lang", "f"), "left")
      .join(w1c, Seq("lang", "w1"), "left")
      .join(v, "lang")
      .select(col("lang"), col("f"),
        Metrics.canonRound(
          log((coalesce(col("cf"), lit(0L)) + 0.5) /
            (coalesce(col("cw"), lit(0L)) + lit(0.5) * col("v"))), 6)
          .cast("decimal(18,6)").as("lp"))
  }

  /** Per-held-out-doc NLL with OOV accounting. */
  def scoreHeld(held: DataFrame, grid: DataFrame): DataFrame =
    bigrams(held, Seq("doc_id", "lang"))
      .join(broadcast(grid), Seq("lang", "f"), "left")
      .groupBy("doc_id", "lang")
      .agg(
        count(lit(1)).as("n_bigrams"),
        sum(when(col("lp").isNull, 1L).otherwise(0L)).as("n_oov"),
        sum(col("lp")).as("ll"))
      .withColumn("n_scored", col("n_bigrams") - col("n_oov"))
      .withColumn("nll",
        when(col("n_scored") > 0,
          Metrics.canonRound((-col("ll").cast("double")) / col("n_scored"), 6)))
      .select("doc_id", "lang", "n_bigrams", "n_oov", "nll")

  /** The registered report: worst-K held-out docs per lang by NLL, with
    * the per-lang mean appended (the q241 audit-column pattern).
    */
  def worstReport(docs: DataFrame): DataFrame = {
    val train = docs.filter(pmod(col("doc_id"), lit(2)) === 0)
    val held = docs.filter(pmod(col("doc_id"), lit(2)) === 1)
    // per-doc grain (held/2 rows AFTER aggregation — far smaller than
    // the token stream it reduces); three consumers below (mean, heap,
    // rejoin), so cached rather than re-scoring the corpus three times
    val scored = scoreHeld(held, modelGrid(train))
      .filter(col("nll").isNotNull)
      .cache()
    val mean = scored.groupBy("lang")
      .agg(Metrics.canonRound(
        sum(col("nll").cast("decimal(18,6)")).cast("double") / count(lit(1)), 6)
        .as("lang_mean_nll"))
    val topk = graft.functions.TopK.topK(WorstK)
    val worst = scored.groupBy("lang")
      .agg(topk(col("nll"), col("doc_id"), col("n_oov").cast("int")).as("top"))
      .select(col("lang"), posexplode(col("top")).as(Seq("pos", "r")))
      .select(col("lang"), (col("pos") + 1).cast("int").as("rank"),
        col("r.key1").as("doc_id"))
    worst.join(scored, Seq("doc_id", "lang"))
      .join(broadcast(mean), "lang")
      .select(col("lang"), col("rank"), col("doc_id"),
        col("n_bigrams"), col("n_oov"), col("nll"), col("lang_mean_nll"))
      .orderBy("lang", "rank")
  }

  val q248 = GQuery(
    "q248_lm_perplexity",
    (s, dir) => worstReport(Tables.documents(s, dir)),
    Some(s"""WITH train AS (SELECT * FROM documents WHERE doc_id % 2 = 0),
      held AS (SELECT * FROM documents WHERE doc_id % 2 = 1),
      tb AS (
        SELECT lang, unnest(list_transform(generate_series(1, len(t) - 1),
            i -> t[i] || ' ' || t[i + 1])) AS f
        FROM (SELECT lang, string_split(text, ' ') AS t FROM train)),
      tbc AS MATERIALIZED (SELECT lang, f, count(*) AS cf FROM tb GROUP BY lang, f),
      w1c AS MATERIALIZED (
        SELECT lang, string_split(f, ' ')[1] AS w1, sum(cf) AS cw
        FROM tbc GROUP BY lang, w1),
      toks AS MATERIALIZED (
        SELECT DISTINCT lang, unnest(string_split(text, ' ')) AS w FROM train),
      vsz AS (SELECT lang, count(*) AS v FROM toks GROUP BY lang),
      grid AS MATERIALIZED (
        SELECT a.lang, a.w || ' ' || b.w AS f,
          CAST(floor(ln((coalesce(tbc.cf, 0) + 0.5)
                / (coalesce(w1c.cw, 0) + 0.5 * vsz.v)) * 1e6 + 0.5) / 1e6
            AS DECIMAL(18,6)) AS lp
        FROM toks a
        JOIN toks b ON b.lang = a.lang
        LEFT JOIN tbc ON tbc.lang = a.lang AND tbc.f = a.w || ' ' || b.w
        LEFT JOIN w1c ON w1c.lang = a.lang AND w1c.w1 = a.w
        JOIN vsz ON vsz.lang = a.lang),
      hb AS (
        SELECT doc_id, lang,
          unnest(list_transform(generate_series(1, len(t) - 1),
            i -> t[i] || ' ' || t[i + 1])) AS f
        FROM (SELECT doc_id, lang, string_split(text, ' ') AS t FROM held)),
      sc AS MATERIALIZED (
        SELECT h.doc_id, h.lang, count(*) AS n_bigrams,
          sum(CASE WHEN g.lp IS NULL THEN 1 ELSE 0 END) AS n_oov,
          count(*) - sum(CASE WHEN g.lp IS NULL THEN 1 ELSE 0 END) AS n_scored,
          sum(g.lp) AS ll
        FROM hb h LEFT JOIN grid g ON g.lang = h.lang AND g.f = h.f
        GROUP BY h.doc_id, h.lang),
      scored AS (
        SELECT doc_id, lang, n_bigrams, n_oov,
          floor((-CAST(ll AS DOUBLE)) / n_scored * 1e6 + 0.5) / 1e6 AS nll
        FROM sc WHERE n_scored > 0),
      mn AS (
        SELECT lang,
          floor(CAST(sum(CAST(nll AS DECIMAL(18,6))) AS DOUBLE) / count(*) * 1e6 + 0.5) / 1e6
            AS lang_mean_nll
        FROM scored GROUP BY lang),
      ranked AS (
        SELECT lang, doc_id, n_bigrams, n_oov, nll,
          row_number() OVER (PARTITION BY lang ORDER BY nll DESC, doc_id) AS rank
        FROM scored)
      SELECT r.lang, CAST(r.rank AS INT) AS rank, r.doc_id,
        CAST(r.n_bigrams AS BIGINT) AS n_bigrams,
        CAST(r.n_oov AS BIGINT) AS n_oov, r.nll, m.lang_mean_nll
      FROM ranked r JOIN mn m ON m.lang = r.lang
      WHERE r.rank <= $WorstK
      ORDER BY r.lang, r.rank"""))

  val all: Seq[GQuery] = Seq(q248)
}
