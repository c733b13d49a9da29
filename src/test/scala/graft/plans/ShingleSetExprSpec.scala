package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ShingleSetExprSpec extends SparkSpec {

  private def df(texts: Seq[String]) = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, Option(t)) }.toDF("id", "text")
  }

  test("fused set equals collect_set(xxhash64(graft_shingles)) as a set") {
    val texts = Seq(
      "the quick brown fox jumps over the quick brown fox",
      "a b a b a b", // heavy shingle repetition → dedup exercised
      "x y",
      "double  space tail ")
    val d = df(texts)
    val viaAgg = d
      .select(col("id"), call_function("graft_shingles", col("text")).as("s"))
      .select(col("id"), xxhash64(col("s")).as("h"))
      .groupBy("id").agg(sort_array(collect_set(col("h"))).as("a"))
    val viaFused = d
      .select(col("id"), sort_array(call_function("graft_shingle_set", col("text"))).as("b"))
    val joined = viaAgg.join(viaFused, "id")
      .select(col("a") === col("b")).collect()
    assert(joined.nonEmpty && joined.forall(_.getBoolean(0)))
  }

  test("edge cases: <2 tokens → empty array, NULL → NULL") {
    val rows = df(Seq("single", "", null))
      .select(col("id"), call_function("graft_shingle_set", col("text")).as("sh"))
      .orderBy("id").collect()
    assert(rows(0).getSeq[Long](1).isEmpty)
    assert(rows(1).getSeq[Long](1).isEmpty)
    assert(rows(2).isNullAt(1))
  }

  test("callable from SQL and stays inside WholeStageCodegen") {
    import spark.implicits._
    Seq((1L, "x y z")).toDF("id", "text").createOrReplaceTempView("ss_docs")
    val q = spark.sql("SELECT id, graft_shingle_set(text) AS sh FROM ss_docs")
    assert(q.collect().head.getSeq[Long](1).length == 2)
    // a local relation constant-folds away, so assert codegen on a real scan
    val scan = graft.Tables.documents(spark, sf001)
      .select(call_function("graft_shingle_set", col("text")))
    // the `*(n)` prefix marks operators fused into a WholeStageCodegen span
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [graft_shingle_set"), plan)
  }
}
