package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over ArrayType columns (the `embeddings.embedding`
  * ARRAY<FLOAT> fixture). All math is promoted to double and composed from
  * codegen'd higher-order functions — no UDFs, so the whole similarity
  * pipeline stays inside WholeStageCodegen and distributes trivially.
  */
object VectorOps {

  /** Element-wise cast to double — float accumulation error would otherwise
    * make cross-engine (DuckDB oracle) comparison flaky.
    */
  def asDouble(v: Column): Column = transform(v, _.cast("double"))

  /** Dot product via zip_with + left-fold aggregate (index order, so the
    * summation order is deterministic).
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = {
    val ad = asDouble(a); val bd = asDouble(b)
    dot(ad, bd) / (norm(ad) * norm(bd))
  }

  def euclidean(a: Column, b: Column): Column =
    sqrt(aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x))
}
