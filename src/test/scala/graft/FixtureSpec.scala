package graft

import org.apache.spark.sql.types._

/** Guards against fixture drift between rounds: if the driver regenerates
  * test data with different schemas, fail HERE with a readable message
  * instead of 60 cryptic oracle mismatches.
  */
class FixtureSpec extends SparkSpec {

  private def cols(name: String): Seq[(String, DataType)] =
    Tables.load(spark, sf001, name).schema.map(f => f.name -> f.dataType)

  test("lineitem schema") {
    assert(cols("lineitem") == Seq(
      "l_orderkey" -> LongType, "l_partkey" -> LongType, "l_suppkey" -> LongType,
      "l_linenumber" -> IntegerType, "l_quantity" -> DoubleType,
      "l_extendedprice" -> DoubleType, "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampNTZType))
  }

  // Pins the POST-normalization type: Tables.events must deliver session-UTC
  // TimestampType whether the fixture ships nanos-as-Long, TIMESTAMP_NTZ, or
  // micros-UTC. One assertion guards every physical shape.
  test("events schema after ts normalization") {
    assert(cols("events") == Seq(
      "event_id" -> LongType, "ts" -> TimestampType, "user_id" -> LongType,
      "event_type" -> StringType, "value" -> DoubleType, "props" -> StringType))
  }

  test("documents and embeddings schemas") {
    assert(cols("documents") == Seq(
      "doc_id" -> LongType, "text" -> StringType, "lang" -> StringType,
      "source" -> StringType, "n_chars" -> LongType))
    assert(cols("embeddings") == Seq(
      "vec_id" -> LongType, "embedding" -> ArrayType(FloatType, containsNull = true),
      "label" -> IntegerType))
  }

  test("star-schema key relationships hold at sf0.001") {
    import org.apache.spark.sql.functions.col
    val l = Tables.lineitem(spark, sf001)
    val o = Tables.orders(spark, sf001)
    // every lineitem references an existing order
    assert(l.join(o, col("l_orderkey") === col("o_orderkey"), "left_anti").count() == 0)
    val c = Tables.customer(spark, sf001)
    assert(o.join(c, col("o_custkey") === col("c_custkey"), "left_anti").count() == 0)
  }
}
