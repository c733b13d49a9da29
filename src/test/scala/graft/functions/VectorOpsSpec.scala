package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class VectorOpsSpec extends SparkSpec {
  import VectorOps._

  private def one(c: org.apache.spark.sql.Column, a: Array[Float], b: Array[Float]): Double = {
    import spark.implicits._
    Seq((a, b)).toDF("a", "b").select(c.cast("double")).head().getDouble(0)
  }

  test("cosine: identical=1, orthogonal=0, opposite=-1") {
    val x = Array(1f, 2f, 3f)
    assert(math.abs(one(cosine(col("a"), col("b")), x, x) - 1.0) < 1e-12)
    assert(math.abs(one(cosine(col("a"), col("b")), Array(1f, 0f), Array(0f, 1f))) < 1e-12)
    assert(math.abs(one(cosine(col("a"), col("b")), x, x.map(-_)) + 1.0) < 1e-12)
  }

  test("dot and euclidean") {
    assert(one(dot(col("a"), col("b")), Array(1f, 2f, 3f), Array(4f, 5f, 6f)) == 32.0)
    assert(one(euclidean(col("a"), col("b")), Array(0f, 3f), Array(4f, 0f)) == 5.0)
  }
}
