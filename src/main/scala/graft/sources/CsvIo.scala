package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Typed CSV scan/sink (S1-S6): the reference's primary IO surface
  * (kaggle/kaggle.py:344-353, 859). Explicit schema — usecols/dtype/
  * parse_dates all collapse into the StructType + Catalyst column pruning.
  */
object CsvIo {

  /** S1/S2: schema-first CSV read; Catalyst prunes to whatever downstream
    * selects, so `usecols` needs no dedicated knob.
    */
  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .option("header", "true")
      .option("timestampFormat", "yyyy-MM-dd['T'HH:mm:ss]")
      .schema(schema)
      .csv(path)

  /** Schema-on-read fallback (infer), for ad-hoc side tables (S3-S5). */
  def readCsvInferred(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").option("inferSchema", "true").csv(path)

  /** S6: submission-style single-file CSV sink (kaggle/kaggle.py:859).
    * coalesce(1) is deliberate: a submission file is driver-scale by
    * definition; bulk exports should drop the coalesce and write
    * partitioned.
    */
  def writeSingleCsv(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode("overwrite").option("header", "true").csv(path)
}
