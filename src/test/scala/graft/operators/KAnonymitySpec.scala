package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.Tables

/** k-anonymity audit (q231): the released rows must actually satisfy
  * k-anonymity, and the class accounting must cover the table.
  */
class KAnonymitySpec extends SparkSpec {

  private lazy val out =
    KAnonymity.audit(Tables.customer(spark, sf001), Tables.orders(spark, sf001))
      .cache()

  test("dispositions are consistent with the k=5 rule") {
    assert(out.filter(col("status") === "ok" && col("n0") < 5).count() == 0)
    assert(out.filter(col("status") === "generalized" && col("n1") < 5).count() == 0)
    assert(out.filter(col("status") === "suppressed" && col("n1") >= 5).count() == 0)
    // the anonymity guarantee: every released (non-suppressed) class
    // has size >= k at its release grain
    assert(out.filter(col("status") =!= "suppressed" &&
      least(coalesce(col("n1"), col("n0")), col("n0"))
        .lt(lit(5)).and(col("status") === "ok")).count() == 0)
  }

  test("class accounting covers every customer row exactly once") {
    val total = out.agg(sum("n0")).head.getLong(0)
    assert(total == Tables.customer(spark, sf001).count())
  }

  test("l-diversity never exceeds class size") {
    assert(out.filter(col("ldiv0") > col("n0")).count() == 0)
    assert(out.filter(col("ldiv1") > col("n1")).count() == 0)
  }

  test("the sf0.001 fixture exercises generalization AND suppression") {
    val statuses = out.select("status").distinct().collect().map(_.getString(0)).toSet
    assert(statuses.contains("generalized") && statuses.contains("suppressed"))
    // the ok disposition is exercised at sf0.1 (486 classes measured);
    // at sf0.001 every 200-band class is sparse
  }
}
