package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point registering the library's native
  * expressions for SQL use (`SELECT geometric_round(x)`,
  * `SELECT graft_cosine(a, b)`) and its optimizer rule. Wire with
  * `SparkSession.builder().withExtensions(new GraftExtensions)` — done by
  * graft.Session — or spark.sql.extensions=graft.plans.GraftExtensions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  private def inject(e: SparkSessionExtensions, name: String, arity: Int,
                     clazz: Class[_], build: Seq[Expression] => Expression): Unit =
    e.injectFunction((
      new FunctionIdentifier(name), new ExpressionInfo(clazz.getName, name),
      (exprs: Seq[Expression]) => {
        // surface a proper analysis-time arity error instead of an
        // IndexOutOfBoundsException from the builder
        if (exprs.length != arity) throw new org.apache.spark.sql.AnalysisException(
          errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
          messageParameters = Map(
            "functionName" -> name, "expectedNum" -> arity.toString,
            "actualNum" -> exprs.length.toString, "docroot" -> ""))
        build(exprs)
      }))

  /** Fold a literal INT parameter at analysis time, raising the PROPER
    * error classes: a non-foldable argument is NON_FOLDABLE_ARGUMENT, a
    * foldable non-integer is DATATYPE_MISMATCH.UNEXPECTED_INPUT_TYPE —
    * not WRONG_NUM_ARGS, whose "wrong number of arguments" text misled
    * for what is a type error.
    */
  private def foldInt(funcName: String, paramName: String, paramIndex: String,
                      ex: Expression): Int = ex match {
    case f if f.foldable => f.eval() match {
      case i: Int => i
      // a BIGINT literal is accepted only when it fits INT — silent
      // l.toInt truncation wrapped 5000000000 to a negative (surfacing
      // as a baffling "k must be positive") or worse a WRONG positive k
      case l: Long if l >= Int.MinValue && l <= Int.MaxValue => l.toInt
      case _ => throw new org.apache.spark.sql.AnalysisException(
        errorClass = "DATATYPE_MISMATCH.UNEXPECTED_INPUT_TYPE",
        messageParameters = Map(
          "sqlExpr" -> s""""$funcName"""", "paramIndex" -> paramIndex,
          "requiredType" -> "\"INT\"", "inputSql" -> s""""${ex.sql}"""",
          "inputType" -> s""""${ex.dataType.sql}""""))
    }
    case _ => throw new org.apache.spark.sql.AnalysisException(
      errorClass = "NON_FOLDABLE_ARGUMENT",
      messageParameters = Map(
        "funcName" -> s""""$funcName"""", "paramName" -> s""""$paramName"""",
        "paramType" -> "\"INT\""))
  }

  override def apply(e: SparkSessionExtensions): Unit = {
    inject(e, "geometric_round", 1, classOf[GeometricRoundExpr],
      exprs => GeometricRoundExpr(exprs.head))
    inject(e, "graft_dot", 2, classOf[DotExpr],
      exprs => DotExpr(exprs(0), exprs(1)))
    inject(e, "graft_cosine", 2, classOf[CosineSimExpr],
      exprs => CosineSimExpr(exprs(0), exprs(1)))
    inject(e, "graft_l2dist", 2, classOf[L2DistExpr],
      exprs => L2DistExpr(exprs(0), exprs(1)))
    inject(e, "graft_eq_count", 2, classOf[ArrayEqCountExpr],
      exprs => ArrayEqCountExpr(exprs(0), exprs(1)))
    inject(e, "graft_zvalue", 2, classOf[ZValueExpr],
      exprs => ZValueExpr(exprs(0), exprs(1)))
    // Spark's internal bloom-filter pair, surfaced for the user-driven
    // "probe against a reference corpus" shape (operators.BloomJoin) that
    // the automatic runtime-filter rewrite cannot express. The aggregate
    // builder returns the bare AggregateFunction — the analyzer wraps it.
    inject(e, "graft_bloom_agg", 2,
      classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate],
      exprs => new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
        exprs(0), exprs(1)))
    inject(e, "graft_might_contain", 2,
      classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain],
      exprs => org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        exprs(0), exprs(1)))
    // mergeable quantile sketch pair (plans.QuantileSketchAgg): build
    // from raw (hash, value) rows / re-aggregate built sketches at a
    // coarser grain. Bare AggregateFunction returned — analyzer wraps.
    inject(e, "graft_qsketch", 3, classOf[QuantileSketchAgg],
      exprs => QuantileSketchAgg(exprs(0), exprs(1),
        foldInt("graft_qsketch", "k", "third", exprs(2))))
    inject(e, "graft_qsketch_merge", 2, classOf[QuantileSketchMergeAgg],
      exprs => QuantileSketchMergeAgg(exprs(0),
        foldInt("graft_qsketch_merge", "k", "second", exprs(1))))
    // codegen'd SMAPE aggregate (SURVEY §4.3's second named candidate);
    // bare AggregateFunction returned — analyzer wraps
    inject(e, "graft_smape", 2, classOf[SmapeAgg],
      exprs => SmapeAgg(exprs(0), exprs(1)))
    inject(e, "graft_shingles", 1, classOf[ShinglesGenerator],
      exprs => ShinglesGenerator(exprs.head))
    inject(e, "graft_shingle_set", 1, classOf[ShingleSetExpr],
      exprs => ShingleSetExpr(exprs.head))
    inject(e, "graft_lines", 2, classOf[LinesGenerator],
      exprs => LinesGenerator(exprs(0), exprs(1)))
    inject(e, "graft_nfc", 1, classOf[NfcNormalizeExpr],
      exprs => NfcNormalizeExpr(exprs.head))
    inject(e, "graft_ngrams", 2, classOf[ShinglesGenerator],
      exprs => ShinglesGenerator(exprs(0), foldInt("graft_ngrams", "n", "second", exprs(1))))
    inject(e, "graft_chunks", 3, classOf[ChunksGenerator],
      exprs => ChunksGenerator(exprs(0),
        foldInt("graft_chunks", "size", "second", exprs(1)),
        foldInt("graft_chunks", "stride", "third", exprs(2))))
    e.injectOptimizerRule(_ => CollapseIdempotentRound)
    e.injectOptimizerRule(_ => ThresholdLevenshtein)
    e.injectOptimizerRule(_ => RangeJoinRewrite)
    e.injectPlannerStrategy(_ => AsOfJoinStrategy)
  }
}
