package graft.plans

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Pins `graft_lines` (the fused re-lining generator) to the HOF
  * composition it replaced — the invariant-8 bitwise-identity
  * requirement: a fused kernel must emit EXACTLY what the Column
  * formulation emitted, or the q188/q189 oracles break.
  */
class LinesGeneratorSpec extends SparkSpec {

  /** The original HOF formulation (filter/split → transform/slice →
    * posexplode), kept here as the reference semantics.
    */
  private def hofLines = {
    val lw = LinesGenerator.LineWords
    val toks = filter(split(col("text"), " "), w => w =!= "")
    val content = transform(
      sequence(lit(0), ceil(size(toks) / lit(lw.toDouble)).cast("int") - 1),
      g => concat_ws(" ", slice(toks, g * lw + 1, lit(lw))))
    val header = element_at(array(LinesGenerator.Headers.map(lit): _*),
      pmod(col("doc_id"), lit(LinesGenerator.Headers.size)).cast("int") + 1)
    val footer = element_at(array(LinesGenerator.Footers.map(lit): _*),
      pmod(col("doc_id"), lit(LinesGenerator.Footers.size)).cast("int") + 1)
    Tables.documents(spark, sf001)
      .select(col("doc_id"),
        posexplode(concat(array(header), content, array(footer)))
          .as(Seq("line_no", "line")))
  }

  private def genLines =
    Tables.documents(spark, sf001)
      .select(col("doc_id"),
        call_function("graft_lines", col("doc_id"), col("text"))
          .as(Seq("line_no", "line")))

  test("graft_lines emits exactly the HOF composition's rows") {
    assert(genLines.exceptAll(hofLines).isEmpty &&
      hofLines.exceptAll(genLines).isEmpty)
    assert(genLines.count() == hofLines.count())
  }

  test("edge shapes: empty text, trailing spaces, exact multiples") {
    import spark.implicits._
    val docs = Seq(
      (0L, ""), // no content tokens: header 0, footer 1
      (7L, "a b c d e f g h"), // exactly one full 8-word line
      (13L, "a b c d e f g h i"), // 8 + 1 → two lines
      (20L, "  x   y  ")) // empty tokens dropped like the HOF filter
      .toDF("doc_id", "text")
    val rows = docs
      .select(col("doc_id"),
        call_function("graft_lines", col("doc_id"), col("text"))
          .as(Seq("line_no", "line")))
      .orderBy("doc_id", "line_no")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    val byDoc = rows.groupBy(_._1)
    assert(byDoc(0L).map(_._2).toSeq == Seq(0, 1)) // header + footer only
    assert(byDoc(7L).map(_._2).toSeq == Seq(0, 1, 2))
    assert(byDoc(7L).find(_._2 == 1).get._3 == "a b c d e f g h")
    assert(byDoc(13L).map(_._2).toSeq == Seq(0, 1, 2, 3))
    assert(byDoc(13L).find(_._2 == 2).get._3 == "i")
    assert(byDoc(20L).find(_._2 == 1).get._3 == "x y")
    // pool routing by doc_id modulo
    assert(byDoc(13L).find(_._2 == 0).get._3 ==
      LinesGenerator.Headers(13 % LinesGenerator.Headers.size))
    assert(byDoc(13L).find(_._2 == 3).get._3 ==
      LinesGenerator.Footers((13 % LinesGenerator.Footers.size).toInt))
  }
}
