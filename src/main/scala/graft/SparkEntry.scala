package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * The real content lives in graft.registry.Registry; this object is the
  * stable facade the driver reflects on.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * 5-table star join + aggregation (TPC-H Q5 shape).
    */
  def entry(spark: SparkSession): DataFrame =
    registry.Registry.queries("q19_star_join")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.Registry.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted only for engine-internal ops
    * (xxhash64 signatures q47/q48, HLL sketches q27/q98, real MLlib
    * training q63/q64) — each of which has an oracle-checked md5/exact
    * twin (q56/q214, q219, q213) carrying the cross-engine proof.
    */
  def oracleSql: Map[String, String] = registry.Registry.oracleSql
}
