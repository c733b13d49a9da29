package graft.registry

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable query: a Spark builder plus (when SQL-expressible) the
  * equivalent DuckDB oracle SQL the driver hash-compares against at sf0.01.
  *
  * Determinism contract (SURVEY.md §7.4 item 1): every query ends in an
  * explicit orderBy over a unique key prefix, doubles are rounded on BOTH
  * sides, and output column names match the oracle exactly (driver sorts
  * columns by name before hashing).
  */
final case class GQuery(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Registry {
  def groups: Seq[Seq[GQuery]] = Seq(
    graft.operators.RelationalQueries.all,
    graft.operators.EventQueries.all,
    graft.operators.TextQueries.all,
    graft.operators.PipelineQueries.all,
    graft.operators.DedupQueries.all,
    graft.operators.CurationQueries.all,
    graft.operators.SimilarityQueries.all,
    graft.operators.MLQueries.all,
    graft.functions.FeatureQueries.all,
    graft.multimodal.MultimodalQueries.all,
    graft.operators.TableProfile.all,
    graft.operators.TableMaintenance.all,
    graft.operators.ExactSelect.all,
    graft.operators.ChainResolve.all,
    graft.operators.Conformal.all,
    graft.operators.PowerIteration.all,
    graft.operators.Sprt.all,
    graft.operators.GroupedOls.all,
    graft.ml.HybridTwin.all,
    graft.ml.QualityGate.all,
    graft.operators.KmvSketch.all,
    graft.operators.QuantileSketchQueries.all,
    graft.operators.HierarchyRollup.all,
    graft.operators.VariantShred.all,
    graft.operators.CollatedDedup.all,
    graft.operators.SqlScripting.all,
    graft.operators.SuffixRanks.all,
    graft.operators.WeightedSample.all,
    graft.operators.DsirSelect.all,
    graft.operators.KAnonymity.all,
    graft.sources.GShardQueries.all,
    graft.sources.PartitionedScan.all,
    graft.operators.AnnotatorAgreement.all,
    graft.operators.SequencePacking.all,
    graft.operators.RecordLinkage.all,
    graft.operators.BradleyTerry.all,
    graft.operators.TriangleCount.all,
    graft.operators.CountMinSketch.all,
    graft.operators.LmPerplexity.all,
    graft.ml.HistGbm.all,
    graft.streaming.RestartStreams.all,
    graft.streaming.StateInspect.all,
    graft.streaming.ProfileStreams.all,
    graft.operators.GraphOnDedup.all
  )

  lazy val all: Seq[GQuery] = {
    val qs = groups.flatten
    // a duplicate name would silently collapse in the toMap views below —
    // one query vanishing from bench/verify/scale while every artifact
    // claims coverage (review finding, r15); fail loudly instead
    val dups = qs.groupBy(_.name).filter(_._2.size > 1).keys
    require(dups.isEmpty, s"duplicate registry query names: ${dups.mkString(", ")}")
    qs
  }

  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  lazy val oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
