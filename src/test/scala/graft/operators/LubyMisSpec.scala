package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.functions.{Metrics, VectorOps}

class LubyMisSpec extends SparkSpec {

  private def fixtureGraph: (Set[Long], Set[(Long, Long)]) = {
    val d = Tables.embeddings(spark, sf001).filter(col("vec_id") % 5 === 0)
    val a = d.select(col("vec_id").as("id_a"), col("embedding").as("va"))
    val b = d.select(col("vec_id").as("id_b"), col("embedding").as("vb"))
    val pairs = a.join(b, col("id_a") < col("id_b"))
      .filter(Metrics.canonRound(VectorOps.cosine(col("va"), col("vb")), 6) > 0.25)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val nodes = d.select("vec_id").collect().map(_.getLong(0)).toSet
    (nodes, pairs)
  }

  test("q137 result is an independent set, removed nodes have an MIS neighbor, actives only when undecidable") {
    val (nodes, edges) = fixtureGraph
    val rows = graft.registry.Registry.queries("q137_luby_mis")(spark, sf001)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getInt(2))).toMap
    assert(rows.keySet == nodes)
    val mis = rows.collect { case (v, ("mis", _)) => v }.toSet
    val removed = rows.collect { case (v, ("removed", _)) => v }.toSet
    // independence: no fixture edge connects two MIS members
    val inside = edges.filter { case (u, v) => mis(u) && mis(v) }
    assert(inside.isEmpty, s"MIS contains adjacent pair(s): ${inside.take(3)}")
    // every removed node is adjacent to an MIS member decided no later
    val nb = (edges ++ edges.map(_.swap)).groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    removed.foreach { v =>
      val hasMisNb = nb.getOrElse(v, Set.empty).exists(mis)
      assert(hasMisNb, s"removed node $v has no MIS neighbor")
    }
    // decided rounds are consistent: a removed node's round is the round
    // some neighbor entered the MIS
    removed.foreach { v =>
      val r = rows(v)._2
      val ok = nb.getOrElse(v, Set.empty).exists(u => rows(u) == ("mis", r))
      assert(ok, s"removed node $v at round $r has no MIS neighbor decided that round")
    }
  }

  test("with enough rounds the fixture graph fully decides and the keep-set is MAXIMAL") {
    val (_, edges) = fixtureGraph
    val d = Tables.embeddings(spark, sf001).filter(col("vec_id") % 5 === 0)
    val pairsDf = {
      import spark.implicits._
      edges.toSeq.toDF("id_a", "id_b")
    }
    val sym = pairsDf.select(col("id_a").as("u"), col("id_b").as("v"))
      .unionByName(pairsDf.select(col("id_b").as("u"), col("id_a").as("v")))
    val res = LubyMis.mis(d.select(col("vec_id")), sym, rounds = 8)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(!res.values.exists(_ == "active"), "graph not fully decided in 8 rounds")
    // maximality: every non-MIS node has an MIS neighbor
    val mis = res.collect { case (v, "mis") => v }.toSet
    val nb = (edges ++ edges.map(_.swap)).groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    res.collect { case (v, "removed") => v }.foreach { v =>
      assert(nb.getOrElse(v, Set.empty).exists(mis), s"keep-set not maximal at $v")
    }
  }
}
