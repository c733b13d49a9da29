package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.Tables

/** LM perplexity filter (q248): hand-computed bigram model, OOV path,
  * grid shape, and report structure at sf0.001.
  */
class LmPerplexitySpec extends SparkSpec {

  test("hand model: add-half bigram probabilities and NLL") {
    import spark.implicits._
    val train = Seq((0L, "x", "a b a b")).toDF("doc_id", "lang", "text")
    val held = Seq((1L, "x", "a b"), (3L, "x", "b b")).toDF("doc_id", "lang", "text")
    // vocab {a,b}: c(a b)=2, c(b a)=1, c(a .)=2, c(b .)=1, V=2
    // P(b|a)=(2+.5)/(2+1)=5/6; P(a|b)=(1+.5)/(1+1)=.75; P(b|b)=.5/2=.25
    val grid = LmPerplexity.modelGrid(train)
    val byF = grid.collect().map(r => r.getString(1) -> r.getDecimal(2).doubleValue()).toMap
    assert(byF.size == 4, "full V^2 grid")
    assert(byF("a b") == math.floor(math.log(2.5 / 3.0) * 1e6 + 0.5) / 1e6)
    assert(byF("b b") == math.floor(math.log(0.25) * 1e6 + 0.5) / 1e6)
    val sc = LmPerplexity.scoreHeld(held, grid).collect()
      .map(r => r.getLong(0) -> r.getDouble(4)).toMap
    assert(sc(1L) == 0.182322) // -ln(5/6) snapped
    assert(sc(3L) == 1.386294) // -ln(1/4) snapped
  }

  test("out-of-vocab bigrams take the audit path, not a fake score") {
    import spark.implicits._
    val train = Seq((0L, "x", "a b a")).toDF("doc_id", "lang", "text")
    val held = Seq((1L, "x", "a z")).toDF("doc_id", "lang", "text")
    val r = LmPerplexity.scoreHeld(held, LmPerplexity.modelGrid(train)).head()
    assert(r.getLong(2) == 1 && r.getLong(3) == 1, "1 bigram, 1 oov")
    assert(r.isNullAt(4), "no scored bigrams -> null nll, never 0")
  }

  test("grid probabilities are proper: every lp is non-positive") {
    val train = Tables.documents(spark, sf001)
      .filter(pmod(col("doc_id"), lit(2)) === 0)
    val bad = LmPerplexity.modelGrid(train)
      .filter(col("lp") > 0).count()
    assert(bad == 0, "(cf+.5)/(cw+.5V) <= 1 because cf <= cw and V >= 1")
  }

  test("report covers every lang with contiguous ranks") {
    val out = LmPerplexity.worstReport(Tables.documents(spark, sf001)).cache()
    val langs = out.select("lang").distinct().count()
    assert(langs == 5)
    val badRank = out.groupBy("lang")
      .agg(max("rank").as("mx"), count(lit(1)).as("n"))
      .filter(col("mx") =!= col("n")).count()
    assert(badRank == 0, "ranks are 1..n per lang")
    assert(out.filter(col("n_bigrams") < col("n_oov")).count() == 0)
    out.unpersist()
  }
}
