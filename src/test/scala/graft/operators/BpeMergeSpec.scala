package graft.operators

import graft.SparkSpec

class BpeMergeSpec extends SparkSpec {

  private def corpus(texts: String*) = {
    import spark.implicits._
    texts.toDF("text")
  }

  test("learn picks the most frequent pair with (count desc, lhs, rhs) tie-break") {
    // "a b" ×3 beats "b c" ×2; after fusing, "a_b c" ×2 beats the rest.
    val docs = corpus("a b c", "a b c", "a b", "x y")
    val m = BpeMerge.learn(docs, "text", steps = 2)
    assert(m.map(r => (r.step, r.lhs, r.rhs, r.merged, r.cnt)) ==
      Seq((1, "a", "b", "a_b", 3L), (2, "a_b", "c", "a_b_c", 2L)))
  }

  test("equal-count winners break ties lexicographically on (lhs, rhs)") {
    // pairs: (b z)×1, (a z)×1, (a y)×1 — all count 1, winner is (a, y).
    val docs = corpus("b z", "a z", "a y")
    val m = BpeMerge.learn(docs, "text", steps = 1)
    assert(m.head.lhs == "a" && m.head.rhs == "y")
  }

  test("learn stops early once no adjacent pair remains") {
    // Two merges fuse both documents into single tokens; steps=5 must
    // return 2 rules, not throw on the emptied pair-count aggregate.
    val docs = corpus("a b", "a b", "c d")
    val m = BpeMerge.learn(docs, "text", steps = 5)
    assert(m.map(r => (r.lhs, r.rhs)) == Seq(("a", "b"), ("c", "d")))
    assert(m.map(_.step) == Seq(1, 2))
  }

  test("learn on a corpus of single-token documents returns no rules") {
    val docs = corpus("a", "b", "c")
    assert(BpeMerge.learn(docs, "text", steps = 3).isEmpty)
  }

  test("applyStats token accounting matches the merge table's fusions") {
    val docs = corpus("a b c", "a b").withColumn("source",
      org.apache.spark.sql.functions.lit("s1"))
    val m = BpeMerge.learn(docs, "text", steps = 1) // merges (a, b) everywhere
    val stats = BpeMerge.applyStats(docs, "text", m).collect()
    assert(stats.length == 1)
    val r = stats.head
    assert(r.getAs[Long]("tokens_before") == 5L) // 3 + 2
    assert(r.getAs[Long]("tokens_after") == 3L)  // "a_b c" + "a_b"
    assert(r.getAs[Long]("tokens_saved") == 2L)
  }
}
