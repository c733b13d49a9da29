package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{
  Identifier, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.catalog.functions.{
  BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types.{DataType, LongType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Catalog plugin for GSH directories — the piece that turns the scan's
  * reported KeyGroupedPartitioning into an actual storage-partitioned
  * join: Spark only resolves a custom clustering TRANSFORM through the
  * table's FunctionCatalog, and `.format(...).load()` tables have none.
  * Registered by graft.Session as `spark.sql.catalog.gshard`, so
  * `spark.table("gshard.`/path/to/dir`")` loads the same GShardTable the
  * reader path builds, plus function resolution.
  *
  * The function namespace is the sharding layout itself:
  * `shard_<lo>_<step>` maps doc_id → (doc_id − lo) / step — the shard
  * index, exactly what GShardDataWriter.rangeOf rolls files on. Two
  * same-layout directories resolve the SAME canonical function and plan
  * GShard⋈GShard on doc_id partition-wise (no Exchange on either side,
  * matched shard-by-shard); different layouts resolve different
  * canonical names, which Spark treats as incompatible clustering and
  * safely shuffles — layout compatibility is decided by NAME, never by
  * trusting two numerically different layouts to line up.
  *
  * Scale: this is the local spelling of what Iceberg/Delta do with
  * bucket transforms — at 100 TB the win is the same: a doc_id
  * equi join between two co-sharded corpora moves ZERO rows.
  */
class GShardCatalog extends TableCatalog
    with org.apache.spark.sql.connector.catalog.FunctionCatalog {

  private var catalogName: String = "gshard"
  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit =
    catalogName = name
  override def name(): String = catalogName

  // ------------------------------------------------------- tables
  // identifier name IS the directory path (namespace unused)
  override def loadTable(ident: Identifier): Table =
    new GShardTable(ident.name())
  override def tableExists(ident: Identifier): Boolean =
    new java.io.File(ident.name()).isDirectory
  override def listTables(namespace: Array[String]): Array[Identifier] =
    Array.empty
  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[org.apache.spark.sql.connector.expressions.Transform],
      properties: util.Map[String, String]): Table =
    throw new UnsupportedOperationException(
      "gshard tables are created by GShard.write, not DDL")
  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException("gshard tables are immutable")
  override def dropTable(ident: Identifier): Boolean = false
  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("gshard tables are immutable")

  // ---------------------------------------------------- functions
  private val ShardFn = "shard_(-?\\d+)_(\\d+)".r

  override def loadFunction(ident: Identifier): UnboundFunction =
    ident.name() match {
      case ShardFn(lo, step) => GShardCatalog.shardFunction(lo.toLong, step.toLong)
      case other => throw new NoSuchElementException(
        s"gshard catalog has no function $other (expected shard_<lo>_<step>)")
    }
  override def listFunctions(namespace: Array[String]): Array[Identifier] =
    Array.empty
  override def functionExists(ident: Identifier): Boolean =
    // anchored like loadFunction's pattern-match — findFirstIn accepted
    // any name merely CONTAINING shard_<n>_<n> (e.g. shard_1_2_3),
    // which loadFunction then rejected with a raw NoSuchElementException
    // instead of the analyzer's clean unresolved-function path (review
    // finding, r15)
    ident.name() match {
      case ShardFn(_, _) => true
      case _ => false
    }
}

object GShardCatalog {
  /** doc_id → shard index for a (lo, step) layout. Deterministic, total
    * on longs (doc_id ≥ lo by the writer's contract; the formula is
    * plain integer division either way).
    */
  def shardFunction(lo: Long, step: Long): UnboundFunction = new UnboundFunction {
    override def name(): String = s"shard_${lo}_$step"
    override def description(): String =
      s"shard_${lo}_$step(doc_id): (doc_id - $lo) / $step — GSH shard index"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.length == 1 && inputType.head.dataType == LongType,
        s"shard function expects one BIGINT argument, got $inputType")
      new ScalarFunction[java.lang.Long] {
        override def inputTypes(): Array[DataType] = Array(LongType)
        override def resultType(): DataType = LongType
        override def name(): String = s"shard_${lo}_$step"
        // layout parameters in the canonical identity: the compatibility
        // check for storage-partitioned joins compares canonical names,
        // so different layouts can never be treated as co-partitioned
        override def canonicalName(): String = s"graft.gshard.shard_${lo}_$step"
        override def isResultNullable: Boolean = false
        override def produceResult(input: InternalRow): java.lang.Long =
          (input.getLong(0) - lo) / step
      }
    }
  }
}
