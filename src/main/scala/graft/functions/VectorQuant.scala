package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** nearest_centroids(vec) → array<int>: ids of the `nProbe` coarse
  * centroids nearest to the vector (by dot product against unit-norm
  * centroids — argmax-equivalent to cosine), nearest first.
  *
  * The centroid table is a plan-time constant (trained driver-side on a
  * sample, a few KB) shipped inside the expression — executors need no
  * side channel, and the corpus-assignment pass (`nProbe = 1`) is a pure
  * map. IVF counterpart of LshBuckets/LshProbes. */
case class NearestCentroids(child: Expression, centroids: Seq[Seq[Double]], nProbe: Int)
    extends UnaryExpression with CodegenFallback {
  require(centroids.nonEmpty && nProbe >= 1 && nProbe <= centroids.length)

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true

  // unit-normalized once per expression instance
  @transient private lazy val unit: Array[Array[Double]] = centroids.map { c =>
    val a = c.toArray
    val n = math.sqrt(a.map(x => x * x).sum)
    if (n == 0) a else a.map(_ / n)
  }.toArray

  override def nullSafeEval(v: Any): Any = {
    val vec = v.asInstanceOf[ArrayData]
    val dim = vec.numElements()
    val scores = new Array[Double](unit.length)
    var c = 0
    while (c < unit.length) {
      val cent = unit(c)
      val n = math.min(dim, cent.length)
      var dot = 0.0
      var d = 0
      while (d < n) { dot += vec.getFloat(d).toDouble * cent(d); d += 1 }
      scores(c) = dot
      c += 1
    }
    val top = (0 until unit.length).sortBy(i => (-scores(i), i)).take(nProbe)
    new GenericArrayData(top.map(Int.box).toArray[Any])
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroids =
    copy(child = newChild)
  override def prettyName: String = "nearest_centroids"
}
