package graft

/** Debug utility: run one registry query by name against a fixture dir.
  * Usage: runMain graft.RunQuery <name> [sfDir] [--explain]
  */
object RunQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = args.lift(1).filterNot(_.startsWith("--")).getOrElse("/root/testdata/sf0.01")
    val explain = args.contains("--explain")
    val spark = Session.getOrCreate()
    val t0 = System.nanoTime()
    val df = SparkEntry.queries(name)(spark, sfDir)
    if (explain) df.explain("formatted")
    df.show(20, truncate = false)
    val n = df.count()
    println(f"[runquery] $name rows=$n elapsed=${(System.nanoTime() - t0) / 1e9}%.2fs")
    spark.stop()
  }
}
