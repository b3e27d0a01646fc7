package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.{GraftShim => E}
import org.apache.spark.sql.types._

/** PCA over an embedding column — the dimensionality-reduction step a
  * large-scale similarity pipeline runs before ANN (project 64-d → 8-d,
  * search the cheap space, rerank exact in the full space; same
  * bytes-bounding role as PQ, but linear algebra instead of codebooks).
  *
  * Spark-first split, the quantizer-training pattern used across ANN:
  *  - FIT: ONE distributed aggregate pass accumulates (n, Σx, Σxxᵀ) in a
  *    MERGEABLE bounded state — d + d(d+1)/2 doubles regardless of corpus
  *    size ([[CovarianceAgg]]) — then the d×d covariance eigen-decomposes
  *    on the DRIVER (cyclic Jacobi, deterministic; d is 64, the matrix is
  *    32 KB — distributing this buys nothing).
  *  - TRANSFORM: the (mean, W) model is plan-constant inside
  *    [[PcaProject]] — a pure map, no shuffle, stream-safe.
  *
  * Float-sum associativity caveat: covariance entries can differ in final
  * ULPs across partitionings (merge order of partial double sums);
  * downstream consumers quantize scores (`cosScaled`), which absorbs it.
  * Eigenvector SIGN is pinned (largest-magnitude component positive) so
  * the model is stable run-to-run on the same partials. */
object Pca {

  final case class Model(d: Int, r: Int, mean: Array[Double],
                         w: Array[Double], // d x r row-major: w(j*r + k)
                         explained: Array[Double]) // top-r eigenvalues, desc

  /** Cyclic Jacobi eigen-decomposition of a symmetric d×d matrix (row-
    * major). Returns (eigenvalues, eigenvectors row-major — column k of
    * `v` is the k-th eigenvector), unsorted. Deterministic: fixed sweep
    * order, fixed iteration cap, no randomness. */
  private[pipeline] def jacobiEigen(a0: Array[Double], d: Int): (Array[Double], Array[Double]) = {
    val a = a0.clone()
    val v = Array.tabulate(d * d)(i => if (i / d == i % d) 1.0 else 0.0)
    def off(): Double = {
      var s = 0.0; var p = 0
      while (p < d) { var q = p + 1; while (q < d) { s += a(p * d + q) * a(p * d + q); q += 1 }; p += 1 }
      s
    }
    val scale = math.max(a0.map(math.abs).max, 1e-300)
    var sweep = 0
    while (sweep < 64 && off() > 1e-24 * scale * scale) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p * d + q)
          if (math.abs(apq) > 1e-300) {
            val theta = (a(q * d + q) - a(p * d + p)) / (2.0 * apq)
            val t = math.signum(theta) match {
              case 0.0 => 1.0 / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
              case sg => sg / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            }
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var i = 0
            while (i < d) { // rotate rows/cols p,q of a
              val aip = a(i * d + p); val aiq = a(i * d + q)
              a(i * d + p) = c * aip - s * aiq
              a(i * d + q) = s * aip + c * aiq
              i += 1
            }
            i = 0
            while (i < d) {
              val api = a(p * d + i); val aqi = a(q * d + i)
              a(p * d + i) = c * api - s * aqi
              a(q * d + i) = s * api + c * aqi
              i += 1
            }
            i = 0
            while (i < d) { // accumulate rotations into v (columns p,q)
              val vip = v(i * d + p); val viq = v(i * d + q)
              v(i * d + p) = c * vip - s * viq
              v(i * d + q) = s * vip + c * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i * d + i)), v)
  }

  /** One covariance pass + driver eigen-decomposition → top-`r` model.
    * Eigenvalue ties break on index; each eigenvector's sign is pinned. */
  def fit(corpus: DataFrame, vecCol: String, r: Int): Model = {
    val firstVec = corpus.select(col(vecCol)).where(col(vecCol).isNotNull)
      .limit(1).collect()
    require(firstVec.nonEmpty, "PCA fit needs at least one non-null vector")
    val d = firstVec.head.getSeq[Float](0).length
    require(r >= 1 && r <= d, s"r must be in [1, d=$d], got $r")
    val agg = E.column(CovarianceAgg(E.expression(col(vecCol)), d).toAggregateExpression())
    val row = corpus.agg(agg.as("c")).select("c.n", "c.mean", "c.cov").head
    val n = row.getLong(0)
    require(n > 0, "PCA fit needs at least one vector")
    val mean = row.getSeq[Double](1).toArray
    val cov = row.getSeq[Double](2).toArray
    val (evals, evecs) = jacobiEigen(cov, d)
    val order = (0 until d).sortBy(i => (-evals(i), i)).take(r)
    val w = new Array[Double](d * r)
    val explained = new Array[Double](r)
    order.zipWithIndex.foreach { case (src, k) =>
      explained(k) = evals(src)
      // sign pin: largest-|component| of the eigenvector is positive
      var best = 0
      var j = 1
      while (j < d) { if (math.abs(evecs(j * d + src)) > math.abs(evecs(best * d + src))) best = j; j += 1 }
      val sg = if (evecs(best * d + src) < 0) -1.0 else 1.0
      j = 0
      while (j < d) { w(j * r + k) = sg * evecs(j * d + src); j += 1 }
    }
    Model(d, r, mean, w, explained)
  }

  /** Wᵀ(x − μ) as a plan-constant pure map → `array<float>` of length r. */
  def transform(model: Model, vec: Column): Column =
    E.column(PcaProject(E.expression(vec), model.mean.toSeq, model.w.toSeq,
      model.d, model.r))

  /** Persist / reload the model (single-row parquet), the
    * `buildIvfIndex`/`saveModel` lifecycle: fit once on the shipped
    * corpus, project every later batch. */
  def saveModel(spark: SparkSession, model: Model, dir: String): Unit = {
    import spark.implicits._
    Seq((model.d, model.r, model.mean.toSeq, model.w.toSeq, model.explained.toSeq))
      .toDF("d", "r", "mean", "w", "explained")
      .repartition(1).write.mode("overwrite").parquet(dir)
  }

  def loadModel(spark: SparkSession, dir: String): Model = {
    val row = spark.read.parquet(dir).head
    Model(row.getAs[Int]("d"), row.getAs[Int]("r"),
      row.getSeq[Double](row.fieldIndex("mean")).toArray,
      row.getSeq[Double](row.fieldIndex("w")).toArray,
      row.getSeq[Double](row.fieldIndex("explained")).toArray)
  }
}

/** cov_agg(vec, d) → struct<n:bigint, mean:array<double>, cov:array<double>>
  * — mergeable second-moment sketch of an `array<float>` column: state is
  * (n, Σx, upper-triangle Σxxᵀ), d + d(d+1)/2 doubles FIXED regardless of
  * input size; merge is element-wise addition. Eval emits the population
  * covariance (Σxxᵀ/n − μμᵀ) expanded to full d×d row-major. NULL vectors
  * are ignored; a vector of the wrong length is an error (silent
  * truncation would corrupt the model). */
case class CovarianceAgg(child: Expression, d: Int,
                         mutableAggBufferOffset: Int = 0,
                         inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[CovarianceAgg.State] {
  require(d >= 1 && d <= 4096, s"d must be in [1, 4096], got $d")

  override def createAggregationBuffer(): CovarianceAgg.State =
    new CovarianceAgg.State(d)

  override def update(st: CovarianceAgg.State, input: InternalRow): CovarianceAgg.State = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      require(arr.numElements() == d,
        s"cov_agg(d=$d) saw a vector of length ${arr.numElements()}")
      val x = new Array[Double](d)
      var i = 0
      while (i < d) { x(i) = arr.getFloat(i).toDouble; i += 1 }
      st.n += 1
      var t = 0
      i = 0
      while (i < d) {
        st.sums(i) += x(i)
        var j = i
        while (j < d) { st.prods(t) += x(i) * x(j); j += 1; t += 1 }
        i += 1
      }
    }
    st
  }

  override def merge(a: CovarianceAgg.State, b: CovarianceAgg.State): CovarianceAgg.State = {
    a.n += b.n
    var i = 0
    while (i < a.sums.length) { a.sums(i) += b.sums(i); i += 1 }
    i = 0
    while (i < a.prods.length) { a.prods(i) += b.prods(i); i += 1 }
    a
  }

  override def eval(st: CovarianceAgg.State): Any = {
    val n = st.n
    val mean = if (n == 0) new Array[Double](d) else st.sums.map(_ / n)
    val cov = new Array[Double](d * d)
    if (n > 0) {
      var t = 0; var i = 0
      while (i < d) {
        var j = i
        while (j < d) {
          val c = st.prods(t) / n - mean(i) * mean(j)
          cov(i * d + j) = c
          cov(j * d + i) = c
          j += 1; t += 1
        }
        i += 1
      }
    }
    InternalRow(n, new GenericArrayData(mean.map(Double.box)),
      new GenericArrayData(cov.map(Double.box)))
  }

  override def serialize(st: CovarianceAgg.State): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + 8 * (st.sums.length + st.prods.length))
    bb.putLong(st.n)
    st.sums.foreach(bb.putDouble)
    st.prods.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): CovarianceAgg.State = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val st = new CovarianceAgg.State(d)
    st.n = bb.getLong
    var i = 0
    while (i < st.sums.length) { st.sums(i) = bb.getDouble; i += 1 }
    i = 0
    while (i < st.prods.length) { st.prods(i) = bb.getDouble; i += 1 }
    st
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"cov_agg expects array<float>, got ${other.catalogString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("mean", ArrayType(DoubleType, containsNull = false), nullable = false),
    StructField("cov", ArrayType(DoubleType, containsNull = false), nullable = false)))
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def withNewMutableAggBufferOffset(newOffset: Int): CovarianceAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CovarianceAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CovarianceAgg = copy(child = newChildren(0))
  override def prettyName: String = "cov_agg"
}

object CovarianceAgg {
  final class State(d: Int) {
    var n: Long = 0L
    val sums = new Array[Double](d)
    val prods = new Array[Double](d * (d + 1) / 2)
  }
}

/** pca_project(vec) with plan-constant (mean, W): out_k = Σⱼ W_jk(x_j−μ_j)
  * — one pass over the input vector (no per-component re-read of x, the
  * transform(sequence(...)) lambda trap). */
case class PcaProject(child: Expression, mean: Seq[Double], w: Seq[Double],
                      d: Int, r: Int)
    extends UnaryExpression with CodegenFallback {
  require(mean.length == d && w.length == d * r, "model geometry mismatch")

  @transient private lazy val meanArr = mean.toArray
  @transient private lazy val wArr = w.toArray

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    require(arr.numElements() == d,
      s"pca_project(d=$d) saw a vector of length ${arr.numElements()}")
    val out = new Array[Double](r)
    var j = 0
    while (j < d) {
      val xc = arr.getFloat(j).toDouble - meanArr(j)
      var k = 0
      while (k < r) { out(k) += wArr(j * r + k) * xc; k += 1 }
      j += 1
    }
    new GenericArrayData(out.map(x => java.lang.Float.valueOf(x.toFloat)))
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pca_project expects array<float>, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override protected def withNewChildInternal(newChild: Expression): PcaProject =
    copy(child = newChild)
  override def prettyName: String = "pca_project"
}
