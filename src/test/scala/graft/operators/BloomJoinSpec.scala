package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BloomJoinSpec extends SparkSpec {

  private lazy val big = {
    import spark.implicits._
    (0 until 2000).map(i => (i.toLong, s"k${i % 700}")).toDF("id", "key")
  }
  private lazy val ref = {
    import spark.implicits._
    (0 until 300).map(i => (s"k${i * 2}", i)).toDF("key", "junk")
  }

  test("bloom semi join equals plain left_semi") {
    val got = BloomJoin.semi(big, ref, "key", 1000)
    val want = big.join(ref.select("key").distinct(), Seq("key"), "left_semi")
    assert(got.count() == want.count())
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("bloom anti join equals plain left_anti") {
    // align column order: USING joins move the key first, and exceptAll
    // compares positionally
    val got = BloomJoin.anti(big, ref, "key", 1000).select("id", "key")
    val want = big.join(ref.select("key").distinct(), Seq("key"), "left_anti")
      .select("id", "key")
    assert(got.count() == want.count())
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("empty reference: semi is empty, anti is everything") {
    val empty = ref.filter(lit(false))
    assert(BloomJoin.semi(big, empty, "key", 10).isEmpty)
    assert(BloomJoin.anti(big, empty, "key", 10).count() == big.count())
  }

  test("null probe keys are novel (anti keeps, semi drops)") {
    import spark.implicits._
    val withNull = big.unionByName(
      Seq((9999L, null.asInstanceOf[String])).toDF("id", "key"))
    val anti = BloomJoin.anti(withNull, ref, "key", 1000)
    assert(anti.filter(col("id") === 9999L).count() == 1)
    val semi = BloomJoin.semi(withNull, ref, "key", 1000)
    assert(semi.filter(col("id") === 9999L).count() == 0)
  }

  test("the sketch actually prunes: most non-members skip the join") {
    val bloom = BloomJoin.buildBloom(ref, "key", 1000)
    val maybe = big.filter(
      call_function("graft_might_contain", lit(bloom), xxhash64(col("key"))))
    // members: keys k0,k2,...k598 -> 300 of 700 key values. With fpp of a
    // few percent, might-contain rows should be far below the full input.
    val n = maybe.count()
    val members = big.join(ref.select("key").distinct(), Seq("key"), "left_semi").count()
    assert(n >= members, s"bloom lost members: $n < $members")
    assert(n < big.count() * 0.7, s"bloom barely pruned: $n of ${big.count()}")
  }
}
