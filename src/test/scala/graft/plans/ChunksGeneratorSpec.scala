package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ChunksGeneratorSpec extends SparkSpec {

  private def viaGenerator(texts: Seq[String], size: Int, stride: Int) = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, Option(t)) }.toDF("id", "text")
      .select(col("id"),
        call_function("graft_chunks", col("text"), lit(size), lit(stride))
          .as(Seq("chunk_id", "chunk")))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSeq
  }

  private def viaHofs(texts: Seq[String], size: Int, stride: Int) = {
    import spark.implicits._
    val toks = split(col("text"), " ")
    texts.zipWithIndex.map { case (t, i) => (i.toLong, Option(t)) }.toDF("id", "text")
      .select(col("id"), toks.as("t"), org.apache.spark.sql.functions.size(toks).as("n"))
      .select(col("id"),
        posexplode(transform(
          sequence(lit(0), floor((col("n") - 1).cast("double") / stride).cast("int")),
          k => array_join(slice(col("t"), k * stride + 1, lit(size)), " ")))
          .as(Seq("chunk_id", "chunk")))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSeq
  }

  test("generator matches the transform+posexplode composition incl. edge cases") {
    val texts = Seq(
      (1 to 100).map(i => s"w$i").mkString(" "), // multiple full chunks + short tail
      (1 to 32).map(i => s"w$i").mkString(" "),  // exactly one full chunk, then an overlap tail
      (1 to 24).map(i => s"w$i").mkString(" "),  // one short chunk only
      "single",
      "",
      "double  space mid",
      null)
    assert(viaGenerator(texts, 32, 24) == viaHofs(texts, 32, 24))
    // a non-default geometry too (size < stride = gaps are NOT allowed
    // by construction here — every token still lands: size>=stride holds
    // in q218, but the generator itself supports any positive pair)
    assert(viaGenerator(texts, 5, 3) == viaHofs(texts, 5, 3))
    assert(viaGenerator(texts, 3, 5) == viaHofs(texts, 3, 5))
  }

  test("works from SQL via LATERAL VIEW") {
    import spark.implicits._
    Seq((1L, "a b c d e")).toDF("id", "text").createOrReplaceTempView("cg_docs")
    val rows = spark.sql(
      "SELECT id, c.chunk_id, c.chunk FROM cg_docs " +
        "LATERAL VIEW graft_chunks(text, 3, 2) c")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSeq
    assert(rows == Seq((1L, 0, "a b c"), (1L, 1, "c d e"), (1L, 2, "e")))
  }

  test("wrong input type and non-foldable params are analysis errors") {
    import spark.implicits._
    val df = Seq(1).toDF("n")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      df.select(call_function("graft_chunks", col("n"), lit(4), lit(2))).collect()
    }
    assert(e.getMessage.contains("graft_chunks") || e.getMessage.contains("STRING"))
    val df2 = Seq(("x y", 4)).toDF("text", "k")
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      df2.select(call_function("graft_chunks", col("text"), col("k"), lit(2))).collect()
    }
    assert(e2.getMessage.contains("graft_chunks"))
  }
}
