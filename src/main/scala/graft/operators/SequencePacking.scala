package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Metrics
import graft.registry.GQuery

/** Sequence packing — the concatenate-and-chunk stage that turns a
  * cleaned corpus into fixed-length training examples (the standard
  * GPT-style pretraining layout: documents are concatenated with a
  * separator token and the stream is cut into L-token blocks; Brown et
  * al. 2020 §2.3 describe exactly this packing — public literature).
  * The pipeline question this answers: given my corpus and block
  * length, how many training sequences do I get, how fragmented are
  * documents across block boundaries, and how much of each block is
  * boundary carry-over — the numbers that size a training run.
  *
  * Packing is CLOSED-FORM, not a sequential fold: with per-doc token
  * counts and a deterministic order (lang, doc_id), each document's
  * token interval is [cum−n, cum) from one window cumulative sum, its
  * block span is [⌊(cum−n)/L⌋, ⌊(cum−1)/L⌋], and every per-block
  * composition statistic follows from exploding that span — all exact
  * integer arithmetic. (The alternative "next-fit without splitting"
  * packing is a sequential recurrence; concat-and-chunk is both the
  * more common production layout AND the distributable one.)
  *
  * Streams are packed PER LANG (a real pipeline packs per tokenizer/
  * shard): the cumulative window partitions by lang, so at 100 TB the
  * sort is per-shard, not global — packing is embarrassingly parallel
  * across shards because blocks never cross them. One scan, one
  * window, one explode of block spans (output-sized), one group-by.
  * The +1 separator token per document is included, matching the
  * training-time layout.
  */
object SequencePacking {

  private val L = 64 // block length in tokens (separator included per doc)

  /** Per-(lang, block) packing manifest plus per-lang efficiency audit. */
  def packManifest(docs: DataFrame, blockLen: Int = L): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy("doc_id")
    val spans = docs
      .select(col("lang"), col("doc_id"),
        (size(split(col("text"), " ")) + 1).cast("long").as("n")) // +1 separator
      .withColumn("cum", sum("n").over(w))
      .withColumn("first_blk", ((col("cum") - col("n")) / blockLen).cast("long"))
      .withColumn("last_blk", ((col("cum") - 1) / blockLen).cast("long"))
    val perLang = spans.groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum("n").as("n_tokens"),
        sum(when(col("last_blk") > col("first_blk"), 1L).otherwise(0L))
          .as("n_split_docs"))
      .withColumn("n_blocks", ceil(col("n_tokens").cast("double") / blockLen).cast("long"))
      .withColumn("frag_rate", Metrics.canonRound(
        col("n_split_docs").cast("double") / col("n_docs").cast("double"), 4))
    val blocks = spans
      .select(col("lang"), col("doc_id"), col("n"), col("cum"),
        explode(sequence(col("first_blk"), col("last_blk"))).as("blk"))
      // tokens of THIS doc landing in THIS block: overlap of
      // [cum−n, cum) with [blk·L, (blk+1)·L)
      .withColumn("tok_in_blk",
        least(col("cum"), (col("blk") + 1) * blockLen) -
          greatest(col("cum") - col("n"), col("blk") * lit(blockLen.toLong)))
      .groupBy("lang", "blk")
      .agg(count(lit(1)).as("n_docs_in_blk"),
        sum("tok_in_blk").as("n_tok"),
        min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
    blocks.join(broadcast(perLang), Seq("lang"))
      .select(col("lang"), col("blk"), col("n_docs_in_blk"), col("n_tok"),
        col("first_doc"), col("last_doc"),
        col("n_docs"), col("n_blocks"), col("n_split_docs"), col("frag_rate"))
      .orderBy("lang", "blk")
  }

  val q238 = GQuery(
    "q238_sequence_packing",
    (s, dir) => packManifest(Tables.documents(s, dir)),
    Some("""WITH spans AS (
        SELECT lang, doc_id,
          CAST(len(string_split(text, ' ')) + 1 AS BIGINT) AS n,
          CAST(sum(len(string_split(text, ' ')) + 1) OVER (
            PARTITION BY lang ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        FROM documents),
      spans2 AS (
        SELECT lang, doc_id, n, cum,
          CAST(floor((cum - n) / 64.0) AS BIGINT) AS first_blk,
          CAST(floor((cum - 1) / 64.0) AS BIGINT) AS last_blk
        FROM spans),
      per_lang AS (
        SELECT lang, count(*) AS n_docs,
          CAST(sum(n) AS BIGINT) AS n_tokens,
          CAST(sum(CASE WHEN last_blk > first_blk THEN 1 ELSE 0 END) AS BIGINT)
            AS n_split_docs
        FROM spans2 GROUP BY 1),
      per_lang2 AS (
        SELECT lang, n_docs, n_tokens, n_split_docs,
          CAST(ceil(CAST(n_tokens AS DOUBLE) / 64) AS BIGINT) AS n_blocks,
          floor((CAST(n_split_docs AS DOUBLE) / n_docs) * 1e4 + 0.5) / 1e4
            AS frag_rate
        FROM per_lang),
      blk AS (
        SELECT s.lang, s.doc_id, s.n, s.cum,
          unnest(generate_series(s.first_blk, s.last_blk)) AS blk
        FROM spans2 s),
      blocks AS (
        SELECT lang, blk,
          count(*) AS n_docs_in_blk,
          CAST(sum(least(cum, (blk + 1) * 64)
                 - greatest(cum - n, blk * 64)) AS BIGINT) AS n_tok,
          min(doc_id) AS first_doc, max(doc_id) AS last_doc
        FROM blk GROUP BY 1, 2)
      SELECT b.lang, b.blk, b.n_docs_in_blk, b.n_tok, b.first_doc, b.last_doc,
        p.n_docs, p.n_blocks, p.n_split_docs, p.frag_rate
      FROM blocks b JOIN per_lang2 p ON p.lang = b.lang
      ORDER BY b.lang, b.blk"""))

  val all: Seq[GQuery] = Seq(q238)
}
