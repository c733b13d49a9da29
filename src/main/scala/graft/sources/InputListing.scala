package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** S7: input-directory inventory — the reference's first cell walks the
  * input tree and prints every file (kaggle/kaggle.py:51-53's `os.walk`
  * loop). The Spark-native form goes through the Hadoop FileSystem API,
  * so the SAME call lists local paths, HDFS, or any mounted object store
  * (path-transparent like every other source here), and returns a
  * DataFrame the rest of the engine can join/filter instead of stdout
  * text.
  *
  * Driver-side by design: a directory listing is catalog metadata, not
  * data — the entry count is bounded by the file count (the same work
  * `spark.read` itself does in InMemoryFileIndex before planning a
  * scan). For million-file lakehouse tables, list per-partition-dir in
  * parallel or read the table's manifest instead (see
  * TableMaintenance's compaction planner, which consumes exactly this
  * shape).
  */
object InputListing {

  /** Non-recursive listing of `dir`: (name, path, size_bytes,
    * is_directory), name-sorted for determinism.
    */
  def list(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p)
      .map(st => (st.getPath.getName, st.getPath.toString, st.getLen, st.isDirectory))
      .sortBy(_._1)
      .toSeq
      .toDF("name", "path", "size_bytes", "is_directory")
  }

  /** Recursive walk (the literal os.walk shape): every file under `dir`,
    * returned FULL-PATH-sorted — the final global sortBy(path) is what
    * makes the listing deterministic (fs.listStatus order is
    * filesystem-dependent); the depth-first traversal order does not
    * survive it, and "name-sorted" would differ from path-sorted when
    * sibling directory names interleave (review finding, r15: the doc
    * used to promise name order).
    */
  def walk(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def go(p: Path): Seq[(String, String, Long)] = {
      val (dirs, files) = fs.listStatus(p).partition(_.isDirectory)
      files.map(st => (st.getPath.getName, st.getPath.toString, st.getLen)).toSeq ++
        dirs.sortBy(_.getPath.getName).flatMap(d => go(d.getPath))
    }
    go(root).sortBy(_._2).toDF("name", "path", "size_bytes")
  }
}
