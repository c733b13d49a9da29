package graft.operators

import org.apache.spark.sql.functions._

import graft.Tables
import graft.registry.GQuery

/** Case-insensitive dedup on Spark 4 COLLATED strings — the collation
  * surface (SQL standard collations over ICU, new in Spark 4) doing the
  * job it exists for: "same content, different casing" duplicate
  * collapse WITHOUT materializing a lowercased copy of the corpus.
  *
  * The corpus is the documents table unioned with a deterministically
  * UPPERCASED copy (doc_id shifted by 10^7 — disjoint from every
  * replica stride), i.e. each text now exists in at least two case
  * forms. Grouping on `collate(text, 'UTF8_LCASE')` collapses the case
  * variants in one pass: the grouping key is the collated column
  * itself, the engine never allocates a lowercase copy per row (the
  * collation comparator works on the original bytes), and the exact
  * case forms remain countable inside each group (count(distinct text)
  * — a BINARY distinct under a collated group).
  *
  * The DuckDB oracle spells the same query the pre-collation way —
  * `GROUP BY lower(text)` — so the gate pins UTF8_LCASE ≡ lower() on
  * this corpus (ASCII; the collation's ICU case folding and lower()
  * agree exactly there, which is the property the query relies on).
  *
  * Scale shape: one union (no shuffle), one hash aggregation on the
  * collated key — identical plan shape to q40's exact dedup; collation
  * only changes the comparator. At 100 TB the win over the lower()
  * spelling is materialization: the collated group-by ships original
  * strings once instead of original + lowercase.
  */
object CollatedDedup {

  val q256 = GQuery(
    "q256_collated_dedup",
    (s, dir) => {
      val d = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      val shouted = d.select((col("doc_id") + 10000000L).as("doc_id"),
        upper(col("text")).as("text"))
      val corpus = d.unionByName(shouted)
      corpus
        .groupBy(collate(col("text"), "UTF8_LCASE").as("k"))
        .agg(
          lower(min(col("text"))).as("text_key"),
          count(lit(1)).as("n_docs"),
          min(col("doc_id")).as("survivor"),
          countDistinct(col("text")).as("n_case_forms"))
        .select(md5(col("text_key")).as("key_md5"), col("n_docs"),
          col("survivor"), col("n_case_forms"))
        .orderBy("key_md5")
    },
    Some("""WITH corpus AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 10000000, upper(text) FROM documents),
      g AS (
        SELECT lower(text) AS text_key,
               count(*) AS n_docs,
               min(doc_id) AS survivor,
               count(DISTINCT text) AS n_case_forms
        FROM corpus GROUP BY 1)
      SELECT md5(text_key) AS key_md5,
        CAST(n_docs AS BIGINT) AS n_docs,
        survivor,
        CAST(n_case_forms AS BIGINT) AS n_case_forms
      FROM g ORDER BY key_md5"""))

  def all: Seq[GQuery] = Seq(q256)
}
