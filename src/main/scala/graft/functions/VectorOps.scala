package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over ArrayType columns (the `embeddings.embedding`
  * ARRAY<FLOAT> fixture). Each kernel is a custom codegen'd Catalyst
  * expression (graft.plans.VectorExprs, registered by GraftExtensions) —
  * one fused primitive loop per row inside WholeStageCodegen. The earlier
  * zip_with/aggregate compositions were CodegenFallback and paid ~8
  * interpreted array passes per cosine; the numerics here are bitwise
  * identical to those compositions (same accumulation order).
  */
object VectorOps {

  /** Element-wise cast to double (codegen'd Cast — float→double is exact;
    * double accumulation keeps the DuckDB oracle comparison stable).
    */
  def asDouble(v: Column): Column = v.cast("array<double>")

  /** Dot product, left-to-right accumulation (deterministic order). */
  def dot(a: Column, b: Column): Column =
    call_function("graft_dot", asDouble(a), asDouble(b))

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    call_function("graft_cosine", asDouble(a), asDouble(b))

  def euclidean(a: Column, b: Column): Column =
    call_function("graft_l2dist", asDouble(a), asDouble(b))
}
