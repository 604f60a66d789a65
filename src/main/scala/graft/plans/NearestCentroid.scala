package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Nearest-centroid (IVF cell) assignment as a per-row scalar expression.
  *
  * The k centroid vectors are driver-resident model state (in a real IVF
  * index they are trained k-means centroids), so they travel inside this
  * expression as task-broadcast literals. Each row is assigned with one
  * fused loop over k×dim floats — no row expansion, no join, no exchange.
  * This replaces the crossJoin(k)+window-argmin formulation, whose
  * `Window.partitionBy(id)` forced a full hash exchange of the
  * k×-expanded vector table (at 100 TB, a ~PB shuffle for a per-row
  * scalar).
  *
  * Scoring is bit-identical to [[CosineSim.compute]] (sequential double
  * summation, floor-round to 6 decimals), so the DuckDB oracle's
  * `row_number() OVER (ORDER BY -cos, centroid_id)` reproduces the same
  * assignment. Ties (equal rounded cosine, and the all-NaN zero-vector
  * edge) resolve to the smallest centroid id: centroids are iterated in
  * ascending-id order with a strict `>` update, matching the window's
  * `centroid_id ASC` tie-break.
  */
case class NearestCentroid(
    child: Expression,
    centroidIds: Seq[Long],
    centroids: Seq[Seq[Float]])
    extends UnaryExpression with Serializable {

  require(centroidIds.nonEmpty && centroidIds.length == centroids.length,
    "need one id per centroid")
  require(centroidIds == centroidIds.sorted,
    "centroids must be in ascending-id order (tie-break contract)")

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  @transient private lazy val ids: Array[Long] = centroidIds.toArray
  @transient private lazy val cents: Array[Array[Float]] =
    centroids.map(_.toArray).toArray

  /** Argmax of rounded cosine; first (= smallest id) wins ties. */
  def computeId(v: ArrayData): Long = {
    var bestId = ids(0)
    var bestScore = score(v, cents(0))
    var j = 1
    while (j < cents.length) {
      val s = score(v, cents(j))
      if (s > bestScore) { bestScore = s; bestId = ids(j) }
      j += 1
    }
    bestId
  }

  private def score(a: ArrayData, b: Array[Float]): Double = {
    val n = math.min(a.numElements(), b.length)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    math.floor(dot / (math.sqrt(na) * math.sqrt(nb)) * 1e6 + 0.5) / 1e6
  }

  override def nullSafeEval(input: Any): Any =
    computeId(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nearestCentroid", this,
      classOf[NearestCentroid].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.computeId($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)
}

object NearestCentroid {

  /** Column-API entry point; sorts centroids by id to lock the tie-break. */
  def nearest(vec: Column, centroids: Seq[(Long, Array[Float])]): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    val sorted = centroids.sortBy(_._1)
    Bridge.column(NearestCentroid(
      Bridge.expression(vec),
      sorted.map(_._1),
      sorted.map(_._2.toSeq)))
  }
}
