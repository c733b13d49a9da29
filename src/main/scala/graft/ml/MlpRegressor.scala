package graft.ml

import org.apache.spark.ml.Transformer
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.ml.param.ParamMap
import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StructField, StructType}

/** Spark-native one-hidden-layer MLP REGRESSOR — closing SURVEY E7's
  * residual gap for real: the reference's stage-1 zoo includes
  * sklearn's MLPRegressor (kaggle/kaggle.py:735-740) and MLlib ships no
  * regression MLP, so earlier rounds substituted FMRegressor with a
  * documented justification. This is the genuine article, built on the
  * same distributed primitives MLlib's own optimizers use:
  *
  * - TRAINING is full-batch gradient descent where each epoch is ONE
  *   `treeAggregate` over the standardized feature RDD — the classic
  *   parameter-server-free shape (gradients are sums over rows, so the
  *   pass is map-side combinable and the driver holds only the weight
  *   vector: d·h + 2h + 1 doubles, the k-means-centroid precedent).
  *   Standardization (features and label) happens once, before the
  *   loop, into the persisted RDD.
  * - PREDICTION is a generated Column expression over the trained
  *   weights as literals (the q51 hyperplane pattern): h_j =
  *   tanh(b1_j + Σ w1_ji·x_i), ŷ = unscale(b2 + Σ w2_j·h_j) — pure
  *   codegen arithmetic, zero UDFs, so the hot scoring path keeps the
  *   library's no-UDF rule.
  *
  * Determinism: weight init is seeded; the per-epoch gradient is a
  * float sum whose partition order is fixed by the input layout, so the
  * fit is reproducible on a fixed layout (the documented MLlib-GBT
  * layout-sensitivity class — see BENCH.md; specs pin a fixed
  * coalesce). Momentum-free plain GD keeps the update rule auditable.
  */
final case class MlpModel(
    w1: Array[Array[Double]], b1: Array[Double],
    w2: Array[Double], b2: Double,
    mean: Array[Double], std: Array[Double],
    yMean: Double, yStd: Double,
    featuresCol: String, predictionCol: String,
    override val uid: String = "graft_mlp_model") extends Transformer {

  private def predExpr: Column = {
    // standardization FOLDED into the weights: tanh(b1 + Σ w1·(x−m)/s)
    // ≡ tanh((b1 − Σ w1·m/s) + Σ (w1/s)·x), so the expression tree is
    // exactly h·d multiply-adds over raw element_at's — no per-feature
    // standardization subexpression repeated per hidden unit (which at
    // wide one-hot d would triple the node count and lean on codegen
    // CSE/method-splitting). Algebraically identical; the spec's
    // unfolded driver reference agrees to 1e-9.
    val xs = vector_to_array(col(featuresCol))
    val hs = w1.indices.map { j =>
      val bAdj = b1(j) - mean.indices.map(i => w1(j)(i) * mean(i) / std(i)).sum
      tanh(mean.indices.foldLeft(lit(bAdj): Column)((acc, i) =>
        acc + lit(w1(j)(i) / std(i)) * element_at(xs, i + 1)))
    }
    val z = hs.zipWithIndex.foldLeft(lit(b2): Column) { case (acc, (h, j)) =>
      acc + lit(w2(j)) * h
    }
    lit(yMean) + lit(yStd) * z
  }

  override def transform(df: Dataset[_]): DataFrame =
    df.withColumn(predictionCol, predExpr)

  override def transformSchema(schema: StructType): StructType =
    StructType(schema.fields :+ StructField(predictionCol, DoubleType, nullable = false))

  override def copy(extra: ParamMap): MlpModel = this
}

final case class MlpRegressor(
    featuresCol: String = "features",
    labelCol: String = "num_sold",
    predictionCol: String = "pred_1",
    hidden: Int = 16,
    epochs: Int = 150,
    lr: Double = 0.3,
    seed: Long = 42L) {

  def fit(train: DataFrame): MlpModel = {
    val spark = train.sparkSession
    // null labels would skew the moments (null-ignoring sum vs row
    // count) and then NPE in the executor — fail them out up front.
    // Cached: the d-probe, the moments pass, and the RDD build would
    // otherwise each re-run the full upstream feature pipeline.
    val raw = train
      .select(vector_to_array(col(featuresCol)).as("x"), col(labelCol).cast("double").as("y"))
      .filter(col("y").isNotNull)
      .cache()
    // explicit fail-fast: head() on an empty frame would surface as a
    // bare NoSuchElementException (and n=0 would NaN the moments and
    // divide the lr/n step by zero) with no hint at the cause
    val probe = raw.select(size(col("x"))).head(1)
    require(probe.nonEmpty,
      s"MlpRegressor.fit: no training rows with a non-null '$labelCol' label")
    val d = probe(0).getInt(0)
    // standardization moments in one distributed pass
    val momRow = raw.select(
      (0 until d).map(i => sum(element_at(col("x"), i + 1)).as(s"s$i")) ++
        (0 until d).map(i =>
          sum(element_at(col("x"), i + 1) * element_at(col("x"), i + 1)).as(s"q$i")) ++
        Seq(sum(col("y")).as("sy"), sum(col("y") * col("y")).as("qy"),
          count(lit(1)).cast("double").as("n")): _*).head()
    val n = momRow.getDouble(2 * d + 2)
    val mean = Array.tabulate(d)(i => momRow.getDouble(i) / n)
    val std = Array.tabulate(d) { i =>
      val v = momRow.getDouble(d + i) / n - mean(i) * mean(i)
      if (v > 1e-12) math.sqrt(v) else 1.0
    }
    val yMean = momRow.getDouble(2 * d) / n
    val yVar = momRow.getDouble(2 * d + 1) / n - yMean * yMean
    val yStd = if (yVar > 1e-12) math.sqrt(yVar) else 1.0

    // standardized, persisted training set — the loop re-reads THIS
    val bMean = spark.sparkContext.broadcast(mean)
    val bStd = spark.sparkContext.broadcast(std)
    val data = raw.rdd.map { r =>
      val xa = r.getSeq[Double](0).toArray
      val xs = Array.tabulate(xa.length)(i => (xa(i) - bMean.value(i)) / bStd.value(i))
      (xs, (r.getDouble(1) - yMean) / yStd)
    }.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    data.count()
    raw.unpersist()

    // seeded Xavier-ish init
    val rnd = new scala.util.Random(seed)
    val limit1 = math.sqrt(6.0 / (d + hidden))
    val w1 = Array.fill(hidden, d)((rnd.nextDouble() * 2 - 1) * limit1)
    val b1 = Array.fill(hidden)(0.0)
    val limit2 = math.sqrt(6.0 / (hidden + 1))
    val w2 = Array.fill(hidden)((rnd.nextDouble() * 2 - 1) * limit2)
    var b2 = 0.0
    val nW = hidden * d + hidden + hidden + 1

    var epoch = 0
    while (epoch < epochs) {
      val bw = spark.sparkContext.broadcast((w1.map(_.clone()), b1.clone(), w2.clone(), b2))
      // gradient = Σ_rows ∂L/∂θ, packed [w1 | b1 | w2 | b2]
      val grad = data.treeAggregate(new Array[Double](nW))(
        seqOp = (acc, row) => {
          val (xs, y) = row
          val (lw1, lb1, lw2, lb2) = bw.value
          val h = new Array[Double](hidden)
          var j = 0
          while (j < hidden) {
            var z = lb1(j); var i = 0
            while (i < d) { z += lw1(j)(i) * xs(i); i += 1 }
            h(j) = math.tanh(z); j += 1
          }
          var pred = lb2
          j = 0
          while (j < hidden) { pred += lw2(j) * h(j); j += 1 }
          val e = pred - y
          j = 0
          while (j < hidden) {
            val dz = e * lw2(j) * (1.0 - h(j) * h(j))
            var i = 0
            while (i < d) { acc(j * d + i) += dz * xs(i); i += 1 }
            acc(hidden * d + j) += dz            // b1
            acc(hidden * d + hidden + j) += e * h(j) // w2
            j += 1
          }
          acc(nW - 1) += e                       // b2
          acc
        },
        combOp = (a, b) => { var i = 0; while (i < nW) { a(i) += b(i); i += 1 }; a })
      bw.destroy()
      val step = lr / n
      var j = 0
      while (j < hidden) {
        var i = 0
        while (i < d) { w1(j)(i) -= step * grad(j * d + i); i += 1 }
        b1(j) -= step * grad(hidden * d + j)
        w2(j) -= step * grad(hidden * d + hidden + j)
        j += 1
      }
      b2 -= step * grad(nW - 1)
      epoch += 1
    }
    data.unpersist(blocking = false)
    // the standardization broadcasts are only referenced by the now-
    // unpersisted RDD's closure — destroy them so repeated fits (grid
    // search, stacking folds) don't accumulate broadcast blocks
    bMean.destroy()
    bStd.destroy()
    MlpModel(w1, b1, w2, b2, mean, std, yMean, yStd, featuresCol, predictionCol)
  }
}
