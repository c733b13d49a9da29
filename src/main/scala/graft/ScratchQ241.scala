package graft

import org.apache.spark.sql.functions._
import graft.operators.RecordLinkage

/** Stage-level timing for q241 at sf0.1 — find the 23s. */
object ScratchQ241 {
  def t[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[scratch] $label ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
  }
  def main(args: Array[String]): Unit = {
    val spark = Session.getOrCreate()
    val dir = "/root/testdata/sf0.1"
    val cust = Tables.customer(spark, dir)
    println("[scratch] customers=" + cust.count())
    val m = RecordLinkage.masterRecords(cust)
    val d = RecordLinkage.dirtyRecords(cust)
    t("dirty count")(println("[scratch] dirty=" + d.count()))
    val w = t("weights build")(RecordLinkage.weights(m, d))
    t("weights collect")(w.collect().foreach(r => println("[scratch] w=" + r)))
    val sp = RecordLinkage.scoredPairs(m, d, w)
    t("scored count")(println("[scratch] scored=" + sp.count()))
    t("audit agg alone") {
      val a = sp.agg(
        sum(col("is_true").cast("long")).as("n_true_cand"),
        sum(when(col("score") >= 8 && col("is_true") === 1, 1L).otherwise(0L)).as("n_match_true"),
        sum(when(col("score") >= 8, 1L).otherwise(0L)).as("n_match"))
      a.collect()
    }
    t("filter branch alone")(println("[scratch] kept=" +
      sp.filter(col("score") >= 0).count()))
    t("filter+sort, no audit") {
      sp.filter(col("score") >= 0).orderBy("rec_id", "master_key")
        .write.mode("overwrite").parquet("/tmp/scr241a")
    }
    t("full report count")(
      println("[scratch] rows=" + RecordLinkage.linkageReport(cust).count()))
    t("full report write")(
      RecordLinkage.linkageReport(cust).write.mode("overwrite")
        .parquet("/tmp/scr241"))
    spark.stop()
  }
}
