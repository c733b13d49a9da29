package graft

/** Debug/artifact utility: dump `.explain("formatted")` for registry
  * queries to one file each — the per-round plan evidence the
  * optimization rounds commit under plans/r<N>/ (so plan-shape claims in
  * OPTIMIZATION_r<N>.md are checkable without running Spark).
  *
  * Usage: runMain graft.ExplainDump <outDir> <suffix> <name>[,<name>...] [sfDir]
  * Writes <outDir>/<name>_<suffix>.txt for each query.
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val outDir = java.nio.file.Paths.get(args(0))
    val suffix = args(1)
    val names = args(2).split(",").toSeq
    val sfDir = args.lift(3).getOrElse("/root/testdata/sf0.1")
    java.nio.file.Files.createDirectories(outDir)
    val spark = Session.getOrCreate()
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(outDir.resolve(s"${name}_$suffix.txt"),
        txt.getBytes("UTF-8"))
      println(s"[explaindump] wrote ${name}_$suffix.txt (${txt.length} chars)")
    }
    spark.stop()
  }
}
