package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** BPE-style merge-rule learning over a tokenized corpus — the TRAINING
  * side of a tokenizer (Sennrich et al. 2016, "Neural Machine Translation
  * of Rare Words with Subword Units"), run at word granularity: each step
  * counts adjacent token pairs corpus-wide, picks the most frequent
  * (deterministic tie-break: count desc, then pair lexicographic), fuses
  * every non-overlapping occurrence left-to-right, and repeats. The
  * learned merge table IS the tokenizer model.
  *
  * Scale shape per step: pair counting is one map-side-combinable hash
  * agg over the corpus; the winner is a single collected scalar (the same
  * distributed-build→literal pattern as the bloom probe); merge
  * application is a narrow per-row string map. K steps = K scans — a real
  * corpus-scale trainer batches the top-B non-conflicting pairs per scan
  * to cut rounds, which changes none of the dataflow below.
  *
  * Merge application uses the doubled-delimiter encoding so that plain
  * non-regex `replace` (present, with identical leftmost-first
  * non-overlapping semantics, in both Spark and DuckDB) implements BPE's
  * left-to-right fusion exactly: tokens are separated by TWO spaces and
  * the string is two-space padded; replacing ` a  b ` with ` a_b `
  * consumes one space from each flank, so adjacent matches cannot overlap
  * and the doubled-separator invariant survives every step. That makes
  * the whole iterative training run — counts, winners, and corpus state —
  * reproducible as 6 unrolled CTE rounds in the DuckDB oracle (q126).
  */
object BpeMerge {

  final case class Merge(step: Int, lhs: String, rhs: String, merged: String, cnt: Long)

  /** Two-space padded, two-space separated encoding of a one-space
    * separated token string.
    */
  def doubled(text: Column): Column =
    concat(lit("  "), replace(text, lit(" "), lit("  ")), lit("  "))

  /** Tokens of a doubled-encoding string. */
  def tokensOf(s: Column): Column = split(trim(s), "  ")

  /** Learn `steps` merge rules from `docs(textCol)` (one-space separated
    * tokens). Returns the merge table; the corpus state is internal.
    *
    * Pair counting feeds the corpus through `graft_shingles` (the fused
    * bigram Generator): one cheap codegen'd string pass re-singles the
    * doubled delimiters, then pairs stream straight out of the scan with
    * no per-document arrays and no per-pair splits — the winner's "a b"
    * string is split once, per aggregated pair. The tie-break orders by
    * the SPLIT (lhs, rhs) columns, matching the oracle's ORDER BY lhs,
    * rhs even for token alphabets with characters below 0x20. Round
    * states stay as lineage over one base cache (step r = r narrow
    * replaces), not per-round materializations.
    *
    * Learning stops early (returning fewer than `steps` rules) once no
    * adjacent pair remains — e.g. every document fused to a single token
    * — where the oracle's per-round CTEs likewise emit no further rows.
    */
  def learn(docs: DataFrame, textCol: String, steps: Int): Seq[Merge] = {
    val base = docs.select(doubled(col(textCol)).as("s")).cache()
    var corpus = base
    val out = Seq.newBuilder[Merge]
    var step = 1
    var exhausted = false
    while (step <= steps && !exhausted) {
      val best = corpus
        .select(call_function("graft_shingles",
          replace(trim(col("s")), lit("  "), lit(" "))).as("g"))
        .groupBy("g").agg(count(lit(1)).as("cnt"))
        .select(split(col("g"), " ", 2).as("p"), col("cnt"))
        .select(col("p").getItem(0).as("lhs"), col("p").getItem(1).as("rhs"), col("cnt"))
        .orderBy(col("cnt").desc, col("lhs"), col("rhs"))
        .head(1).headOption
      best match {
        case None => exhausted = true
        case Some(row) =>
          val (lhs, rhs, cnt) = (row.getString(0), row.getString(1), row.getLong(2))
          out += Merge(step, lhs, rhs, s"${lhs}_$rhs", cnt)
          corpus = corpus.select(replace(col("s"),
            lit(s" $lhs  $rhs "), lit(s" ${lhs}_$rhs ")).as("s"))
          step += 1
      }
    }
    base.unpersist()
    out.result()
  }

  def mergesDf(spark: SparkSession, merges: Seq[Merge]): DataFrame = {
    import spark.implicits._
    merges.toDF()
  }

  /** Apply an already-learned merge table to a corpus (the tokenize-side
    * of the lifecycle: K chained narrow string maps — no shuffles at
    * all) and report per-source tokenization stats. Token counts come
    * from delimiter counts, not splits: in the doubled encoding a corpus
    * state has exactly (#tokens − 1) interior "  " separators.
    */
  def applyStats(docs: DataFrame, textCol: String, merges: Seq[Merge]): DataFrame = {
    val applied = merges.foldLeft(doubled(col(textCol))) { (s, m) =>
      replace(s, lit(s" ${m.lhs}  ${m.rhs} "), lit(s" ${m.merged} "))
    }
    def nTok(s: org.apache.spark.sql.Column) =
      (length(s) - length(replace(s, lit("  "), lit(" ")))) - 1
    docs.select(col("source"),
        size(split(col(textCol), " ")).cast("long").as("t_before"),
        nTok(applied).cast("long").as("t_after"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum("t_before").as("tokens_before"),
        sum("t_after").as("tokens_after"))
      .withColumn("tokens_saved", col("tokens_before") - col("tokens_after"))
      .orderBy("source")
  }

  /** The DuckDB twin of [[learn]]: `steps` unrolled rounds of
    * count→argmax→replace as chained CTEs over the `documents` table.
    * Each round's corpus state is MATERIALIZED and its winner joined in
    * exactly once — with plain CTEs the planner inlines every reference,
    * so round r's state would be recomputed once per downstream use and
    * the chain goes exponential in `steps` (measured: ~8 min at sf0.1
    * for 6 rounds vs seconds materialized).
    */
  private def roundCtes(steps: Int): String = {
    val rounds = (1 to steps).map { r =>
      s"""t$r AS (SELECT doc_id, string_split(trim(s), '  ') AS l FROM c$r),
      x$r AS (SELECT doc_id, l, unnest(generate_series(1, len(l)-1)) AS i FROM t$r WHERE len(l) >= 2),
      b$r AS MATERIALIZED (SELECT l[i] AS lhs, l[i+1] AS rhs, count(*) AS cnt FROM x$r
              GROUP BY 1, 2 ORDER BY cnt DESC, lhs, rhs LIMIT 1),
      c${r + 1} AS MATERIALIZED (SELECT doc_id,
        coalesce(replace(s, ' '||b.lhs||'  '||b.rhs||' ', ' '||b.lhs||'_'||b.rhs||' '), s) AS s
        FROM c$r LEFT JOIN b$r b ON true)"""
    }.mkString(",\n      ")
    s"""c1 AS MATERIALIZED (SELECT doc_id, '  ' || replace(text, ' ', '  ') || '  ' AS s FROM documents),
      $rounds"""
  }

  def oracleSql(steps: Int): String = {
    val union = (1 to steps).map(r =>
      s"SELECT $r AS step, lhs, rhs, lhs||'_'||rhs AS merged, cnt FROM b$r")
      .mkString("\n        UNION ALL ")
    s"""WITH ${roundCtes(steps)}
      SELECT * FROM (
        $union)
      ORDER BY step"""
  }

  /** DuckDB twin of learn-then-[[applyStats]]: the same round chain, with
    * the final corpus state aggregated per source instead of the merge
    * table emitted.
    */
  def applyOracleSql(steps: Int): String =
    s"""WITH ${roundCtes(steps)},
      stats AS (SELECT d.source,
          len(string_split(d.text, ' ')) AS tb,
          length(c.s) - length(replace(c.s, '  ', ' ')) - 1 AS ta
        FROM c${steps + 1} c JOIN documents d USING (doc_id))
      SELECT source, count(*) AS n_docs,
        CAST(sum(tb) AS BIGINT) AS tokens_before,
        CAST(sum(ta) AS BIGINT) AS tokens_after,
        CAST(sum(tb) - sum(ta) AS BIGINT) AS tokens_saved
      FROM stats GROUP BY source ORDER BY source"""
}
