package graft.sources

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream,
  DataOutputStream, EOFException, File, FileInputStream, FileOutputStream,
  RandomAccessFile}

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table,
  TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition,
  PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, Statistics,
  SupportsPushDownFilters, SupportsPushDownRequiredColumns,
  SupportsReportStatistics}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan,
  GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** GSH — a minimal binary document-shard format with a full DataSource
  * V2 reader (SURVEY §2.10's substrate tier, taken past what
  * `spark.read` gives for free): this is the "custom source" proof that
  * the engine can ingest a format Spark has no built-in reader for
  * WITHOUT giving up the scan-level optimizations the parquet path
  * enjoys. The reader implements
  *
  *  - SupportsPushDownRequiredColumns — a projection that drops `text`
  *    makes the row decoder SKIP the text payload bytes entirely (the
  *    dominant field), the binary analogue of parquet column pruning;
  *  - SupportsPushDownFilters — doc_id range/equality predicates prune
  *    whole shards at PLANNING time via each file's footer min/max
  *    (zone-map pruning) and skip non-matching rows at read time. All
  *    filters are also returned as residuals, so Spark re-evaluates
  *    them — correctness never depends on the source's own filtering
  *    (the standard belt-and-braces DSv2 contract);
  *  - SupportsReportStatistics — surviving-shard row counts feed the
  *    optimizer's size estimate (so a pruned GSH side can broadcast).
  *
  * File layout (DataOutputStream big-endian): per row
  * `[doc_id i64][n_chars i64][lang u16+bytes][source u16+bytes]
  * [text i32+bytes]`, then a 24-byte footer `[rowCount i32][minDocId
  * i64][maxDocId i64][magic i32]`. Metadata lives in a FOOTER so the
  * writer streams rows without buffering a shard or re-seeking — the
  * layout a distributed writer needs (HDFS streams are append-only).
  *
  * Writer determinism: shards are fixed doc_id ranges (shard i covers
  * [lo + i·step, lo + (i+1)·step)), rows sorted by doc_id within each
  * shard — so the staged file SET and each file's content are
  * reproducible, and the footer zone maps are tight and disjoint,
  * which is what makes planning-time pruning effective.
  *
  * Scale shape: one InputPartition per shard file (a real deployment
  * sizes shards to the FS block size); planning reads only 24-byte
  * footers; a pruned scan never opens the pruned files at all. The
  * spec pins all three behaviors from the physical plan and the
  * planning hook; q232 hash-verifies a pruned+projected aggregate
  * against DuckDB reading the same rows from parquet.
  */
object GShard {

  val Magic: Int = 0x47534831 // "GSH1"
  val FooterLen: Int = 24

  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType),
    StructField("text", StringType)))

  /** Write `docs` (documents-shaped) as `nShards` range-sharded .gsh
    * files under `outDir`. One shuffle on the shard key; each task
    * streams its shard files row-by-row (no buffering — the footer
    * carries the metadata a header would need up front).
    */
  def write(docs: DataFrame, outDir: String, nShards: Int): Unit = {
    val b = docs.agg(org.apache.spark.sql.functions.min("doc_id"),
      org.apache.spark.sql.functions.max("doc_id")).head
    val lo = b.getLong(0)
    val step = math.max(1L, (b.getLong(1) - lo + nShards) / nShards)
    new File(outDir).mkdirs()
    docs.select("doc_id", "lang", "source", "n_chars", "text")
      .withColumn("__shard", ((col("doc_id") - lo) / step).cast("int"))
      .repartition(nShards, col("__shard"))
      .sortWithinPartitions("__shard", "doc_id")
      .foreachPartition { it: Iterator[Row] =>
        var shard = -1
        var out: DataOutputStream = null
        var n = 0
        var minId = Long.MaxValue
        var maxId = Long.MinValue
        def close(): Unit = if (out != null) {
          out.writeInt(n); out.writeLong(minId); out.writeLong(maxId)
          out.writeInt(Magic); out.close()
          out = null
        }
        it.foreach { r =>
          val sh = r.getInt(5)
          if (sh != shard) {
            close()
            shard = sh
            out = new DataOutputStream(new BufferedOutputStream(
              new FileOutputStream(new File(outDir, f"shard-$sh%05d.gsh"))))
            n = 0; minId = Long.MaxValue; maxId = Long.MinValue
          }
          val id = r.getLong(0)
          out.writeLong(id)
          out.writeLong(r.getLong(3))
          val lang = r.getString(1).getBytes("UTF-8")
          out.writeShort(lang.length); out.write(lang)
          val src = r.getString(2).getBytes("UTF-8")
          out.writeShort(src.length); out.write(src)
          val text = r.getString(4).getBytes("UTF-8")
          out.writeInt(text.length); out.write(text)
          n += 1
          if (id < minId) minId = id
          if (id > maxId) maxId = id
        }
        close()
      }
  }

  /** Footer of one shard file: (rowCount, minDocId, maxDocId). */
  def readFooter(f: File): (Int, Long, Long) = {
    val raf = new RandomAccessFile(f, "r")
    try {
      raf.seek(raf.length() - FooterLen)
      val n = raf.readInt(); val lo = raf.readLong(); val hi = raf.readLong()
      require(raf.readInt() == Magic, s"not a GSH file: $f")
      (n, lo, hi)
    } finally raf.close()
  }

  /** doc_id bounds implied by the pushed filters: (lower, upper),
    * inclusive. Only conjunctive range/equality shapes arrive here —
    * Spark splits top-level ANDs before pushdown.
    */
  def docIdBounds(pushed: Array[Filter]): (Long, Long) = {
    var lo = Long.MinValue
    var hi = Long.MaxValue
    def num(v: Any): Long = v match {
      case l: Long => l
      case i: Int  => i.toLong
      case other   => throw new IllegalArgumentException(s"$other")
    }
    pushed.foreach {
      case GreaterThan("doc_id", v)        => lo = math.max(lo, num(v) + 1)
      case GreaterThanOrEqual("doc_id", v) => lo = math.max(lo, num(v))
      case LessThan("doc_id", v)           => hi = math.min(hi, num(v) - 1)
      case LessThanOrEqual("doc_id", v)    => hi = math.min(hi, num(v))
      case EqualTo("doc_id", v)            => lo = math.max(lo, num(v)); hi = math.min(hi, num(v))
      case _                               => ()
    }
    (lo, hi)
  }

  def isDocIdRange(f: Filter): Boolean = f match {
    case GreaterThan("doc_id", v)        => v.isInstanceOf[Long] || v.isInstanceOf[Int]
    case GreaterThanOrEqual("doc_id", v) => v.isInstanceOf[Long] || v.isInstanceOf[Int]
    case LessThan("doc_id", v)           => v.isInstanceOf[Long] || v.isInstanceOf[Int]
    case LessThanOrEqual("doc_id", v)    => v.isInstanceOf[Long] || v.isInstanceOf[Int]
    case EqualTo("doc_id", v)            => v.isInstanceOf[Long] || v.isInstanceOf[Int]
    case _                               => false
  }
}

/** The TableProvider: `spark.read.format("graft.sources.GShardSource")
  * .load(dir)`. Schema is fixed (documents-shaped).
  */
class GShardSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GShard.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new GShardTable(properties.get("path"))
}

object GShardSource {
  /** Planning observability for the spec: (files considered, files kept)
    * of the most recent planInputPartitions call in this JVM.
    */
  @volatile var lastPlanned: (Int, Int) = (0, 0)
}

class GShardTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"gshard:$path"
  override def schema(): StructType = GShard.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GShardScanBuilder(path)
}

class GShardScanBuilder(path: String) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {
  private var required: StructType = GShard.schema
  private var pushed: Array[Filter] = Array.empty

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(GShard.isDocIdRange)
    filters // everything stays residual: Spark re-evaluates (correctness
            // does not rest on the source's row skipping)
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(s: StructType): Unit = required = s
  override def build(): Scan = new GShardScan(path, required, pushed)
}

case class GShardPartition(file: String, rows: Int) extends InputPartition

class GShardScan(path: String, required: StructType, pushed: Array[Filter])
    extends Scan with Batch with SupportsReportStatistics {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"GShardScan(path=$path, pushed=[${pushed.mkString(", ")}])"

  private lazy val planned: Array[GShardPartition] = {
    val (lo, hi) = GShard.docIdBounds(pushed)
    val files = Option(new File(path).listFiles())
      .getOrElse(Array.empty[File])
      .filter(_.getName.endsWith(".gsh")).sortBy(_.getName)
    val kept = files.flatMap { f =>
      val (n, mn, mx) = GShard.readFooter(f)
      // zone-map overlap test: skip shards wholly outside the bounds
      if (mx < lo || mn > hi || n == 0) None
      else Some(GShardPartition(f.getAbsolutePath, n))
    }
    GShardSource.lastPlanned = (files.length, kept.length)
    kept
  }

  override def planInputPartitions(): Array[InputPartition] =
    planned.toArray[InputPartition]

  override def createReaderFactory(): PartitionReaderFactory =
    new GShardReaderFactory(required, GShard.docIdBounds(pushed))

  override def estimateStatistics(): Statistics = new Statistics {
    // upper bound from the surviving footers; ~120 bytes/row fixture avg
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(planned.map(_.rows.toLong).sum * 120L)
    override def numRows(): java.util.OptionalLong =
      java.util.OptionalLong.of(planned.map(_.rows.toLong).sum)
  }
}

class GShardReaderFactory(required: StructType, bounds: (Long, Long))
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val gp = p.asInstanceOf[GShardPartition]
    new GShardPartitionReader(gp.file, gp.rows, required, bounds._1, bounds._2)
  }
}

/** Streams one shard file. Decodes ONLY the projected fields: with
  * `text` pruned the payload bytes are skipped, not read — the point of
  * the custom reader.
  */
class GShardPartitionReader(file: String, rows: Int, required: StructType,
    lo: Long, hi: Long) extends PartitionReader[InternalRow] {

  private val in = new DataInputStream(new BufferedInputStream(
    new FileInputStream(file), 1 << 16))
  private val needLang = required.fieldNames.contains("lang")
  private val needSource = required.fieldNames.contains("source")
  private val needText = required.fieldNames.contains("text")
  private val ordinals = required.fieldNames.zipWithIndex.toMap
  private var remaining = rows
  private var current: InternalRow = _

  private def skipFully(n: Int): Unit = {
    var left = n.toLong
    while (left > 0) {
      val s = in.skip(left)
      if (s <= 0) { if (in.read() < 0) throw new EOFException(file); left -= 1 }
      else left -= s
    }
  }

  private def readUtf(len: Int): UTF8String = {
    val b = new Array[Byte](len); in.readFully(b); UTF8String.fromBytes(b)
  }

  override def next(): Boolean = {
    while (remaining > 0) {
      remaining -= 1
      val id = in.readLong()
      val nChars = in.readLong()
      val keep = id >= lo && id <= hi
      val row = if (keep) new GenericInternalRow(required.length) else null
      if (keep) {
        ordinals.get("doc_id").foreach(i => row.update(i, id))
        ordinals.get("n_chars").foreach(i => row.update(i, nChars))
      }
      val langLen = in.readUnsignedShort()
      if (keep && needLang) row.update(ordinals("lang"), readUtf(langLen))
      else skipFully(langLen)
      val srcLen = in.readUnsignedShort()
      if (keep && needSource) row.update(ordinals("source"), readUtf(srcLen))
      else skipFully(srcLen)
      val textLen = in.readInt()
      if (keep && needText) row.update(ordinals("text"), readUtf(textLen))
      else skipFully(textLen)
      if (keep) { current = row; return true }
    }
    false
  }

  override def get(): InternalRow = current
  override def close(): Unit = in.close()
}
