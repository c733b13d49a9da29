package graft

import graft.registry.Registry

/** Plan-audit helper: run registry queries by name substring and print
  * their executed plans' join/sort/exchange lines — the quick check for
  * stray BroadcastNestedLoopJoins on data-sized frames, unexpected
  * sort-merge sorts, or missing broadcasts.
  *
  * Usage: runMain graft.ScratchPlanAudit [sfDir] [nameSubstr,...]
  * (defaults: sf0.01, the r12 third-session additions)
  */
object ScratchPlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = Session.getOrCreate()
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val default = Seq("q241_", "q242_", "q244_", "q246_", "q248_")
    val names: String => Boolean = args.lift(1) match {
      case Some(s) => n => s.split(",").exists(n.contains)
      case None => n => default.exists(n.startsWith)
    }
    Registry.all.filter(q => names(q.name)).foreach { q =>
      val df = q.fn(spark, dir)
      df.collect()
      println(s"=== ${q.name} ===")
      println(df.queryExecution.executedPlan.toString.split("\n")
        .filter(l => l.contains("Join") || l.contains("Sort ") ||
          l.contains("NestedLoop") || l.contains("Exchange"))
        .mkString("\n"))
    }
    spark.stop()
  }
}
