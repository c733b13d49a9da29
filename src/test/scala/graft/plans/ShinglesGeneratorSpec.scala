package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ShinglesGeneratorSpec extends SparkSpec {

  private def viaGenerator(texts: Seq[String]) = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, Option(t)) }.toDF("id", "text")
      .select(col("id"), call_function("graft_shingles", col("text")).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toSeq
  }

  private def viaHofs(texts: Seq[String]) = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, Option(t)) }.toDF("id", "text")
      .select(col("id"),
        explode(graft.operators.TextQueries.bigrams(split(col("text"), " "))).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toSeq
  }

  test("generator matches explode(bigrams(split)) including edge cases") {
    val texts = Seq(
      "the quick brown fox",
      "single",
      "",
      "a b",
      "double  space tail ",
      null)
    assert(viaGenerator(texts) == viaHofs(texts))
  }

  test("works from SQL via LATERAL VIEW") {
    import spark.implicits._
    Seq((1L, "x y z")).toDF("id", "text").createOrReplaceTempView("sg_docs")
    val rows = spark.sql(
      "SELECT id, s.shingle FROM sg_docs LATERAL VIEW graft_shingles(text) s")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(rows == Seq((1L, "x y"), (1L, "y z")))
  }

  test("wrong input type is an analysis error") {
    import spark.implicits._
    val df = Seq(1).toDF("n")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      df.select(call_function("graft_shingles", col("n"))).collect()
    }
    assert(e.getMessage.contains("graft_shingles") || e.getMessage.contains("STRING"))
  }

  private def ngramTexts = Seq(
    "the quick brown fox jumps over the lazy dog",
    "one two three",     // exactly n for n=3
    "short pair",        // below n for n>2
    "single",
    "",
    null)

  test("graft_ngrams matches the PipelineQueries.ngrams HOF composition") {
    import spark.implicits._
    for (n <- Seq(2, 3, 5, 8)) {
      val df = ngramTexts.zipWithIndex.map { case (t, i) => (i.toLong, Option(t)) }
        .toDF("id", "text")
      val gen = df.select(col("id"),
          call_function("graft_ngrams", col("text"), lit(n)).as("ng"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toSeq
      val hof = df.select(col("id"),
          explode(graft.operators.PipelineQueries.ngrams(split(col("text"), " "), n)).as("ng"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toSeq
      assert(gen == hof, s"n=$n")
    }
  }

  test("graft_ngrams(text, 2) is exactly graft_shingles(text)") {
    import spark.implicits._
    val df = ngramTexts.zipWithIndex.map { case (t, i) => (i.toLong, Option(t)) }
      .toDF("id", "text")
    val two = df.select(call_function("graft_ngrams", col("text"), lit(2)))
      .collect().map(_.getString(0)).toSeq
    val bi = df.select(call_function("graft_shingles", col("text")))
      .collect().map(_.getString(0)).toSeq
    assert(two == bi)
  }

  test("graft_ngrams rejects a non-foldable n") {
    import spark.implicits._
    val df = Seq(("a b c", 2)).toDF("text", "n")
    intercept[org.apache.spark.sql.AnalysisException] {
      df.select(call_function("graft_ngrams", col("text"), col("n"))).collect()
    }
  }

  test("out-of-range generator parameters raise classed AnalysisExceptions, not require()") {
    // r15 verdict item 5: the SQL surface's value errors must carry the
    // same texture as its arity/type errors — a classed AnalysisException
    import spark.implicits._
    val df = Seq(Tuple1("a b c")).toDF("text")
    val e1 = intercept[org.apache.spark.sql.AnalysisException] {
      df.select(call_function("graft_ngrams", col("text"), lit(1))).collect()
    }
    assert(e1.getCondition == "DATATYPE_MISMATCH.VALUE_OUT_OF_RANGE", e1.getMessage)
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      df.select(call_function("graft_chunks", col("text"), lit(0), lit(1))).collect()
    }
    assert(e2.getCondition == "DATATYPE_MISMATCH.VALUE_OUT_OF_RANGE", e2.getMessage)
    val e3 = intercept[org.apache.spark.sql.AnalysisException] {
      df.select(call_function("graft_chunks", col("text"), lit(2), lit(-1))).collect()
    }
    assert(e3.getCondition == "DATATYPE_MISMATCH.VALUE_OUT_OF_RANGE", e3.getMessage)
  }
}
