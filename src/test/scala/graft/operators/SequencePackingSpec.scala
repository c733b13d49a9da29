package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.Tables

/** Sequence packing (q238): conservation laws of the concat-and-chunk
  * layout.
  */
class SequencePackingSpec extends SparkSpec {

  private lazy val out =
    SequencePacking.packManifest(Tables.documents(spark, sf001)).cache()

  test("token conservation: per-block tokens sum to the corpus total") {
    val perLang = out.groupBy("lang")
      .agg(sum("n_tok").as("packed"), max("n_blocks").as("nb"),
        countDistinct("blk").as("blocks_seen"))
    val truth = Tables.documents(spark, sf001)
      .groupBy("lang")
      .agg(sum(size(split(col("text"), " ")) + 1).as("tokens"))
    val joined = perLang.join(truth, "lang")
    assert(joined.filter(col("packed") =!= col("tokens")).count() == 0)
    // every block materializes: ids 0..n_blocks−1 each appear
    assert(joined.filter(col("blocks_seen") =!= col("nb")).count() == 0)
  }

  test("every block except the per-lang last is exactly full") {
    val lastBlk = out.groupBy("lang").agg(max("blk").as("lb"))
    val bad = out.join(lastBlk, "lang")
      .filter(col("blk") =!= col("lb") && col("n_tok") =!= 64)
      .count()
    assert(bad == 0, "interior blocks must hold exactly L tokens")
  }

  test("fragmentation counts docs spanning a boundary") {
    // a doc strictly inside one block contributes 1 block row; split
    // docs contribute >= 2 — recompute from the manifest's span rows
    val spanRows = out.groupBy("lang").agg(sum("n_docs_in_blk").as("span_rows"),
      max("n_docs").as("nd"), max("n_split_docs").as("nsplit"))
    // span_rows = n_docs + (extra rows from splits) >= n_docs + n_split
    val bad = spanRows.filter(col("span_rows") < col("nd") + col("nsplit")).count()
    assert(bad == 0)
  }
}
