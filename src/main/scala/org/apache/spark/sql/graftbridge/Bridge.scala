package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset => ClassicDataset, SparkSession => ClassicSparkSession}

/** The one compile-time bridge into Spark's `private[sql]` surface, kept to
  * a single file in a `org.apache.spark.sql.*` subpackage so the rest of the
  * library stays on the public API. Needed only to materialize a DataFrame
  * from a custom LogicalPlan (`Dataset.ofRows` has no public equivalent);
  * reading `queryExecution.analyzed` is public and lives here only for
  * symmetry. This is the standard OSS pattern for Spark extension libraries
  * that ship custom logical operators.
  */
object Bridge {

  /** Wrap a (resolved) logical plan as a DataFrame on this session. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    ClassicDataset.ofRows(spark.asInstanceOf[ClassicSparkSession], plan)

  /** The analyzed logical plan backing a DataFrame. */
  def analyzed(df: DataFrame): LogicalPlan =
    df.asInstanceOf[ClassicDataset[Row]].queryExecution.analyzed
}
