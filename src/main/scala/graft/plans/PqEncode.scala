package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Product-quantization subspace encoder as a per-row scalar expression:
  * the code for ONE subspace is the index of the nearest (squared-L2)
  * codebook entry over `subLen` components starting at `offset`.
  *
  * Like [[NearestCentroid]], the codebook is driver-resident model state
  * travelling as a task-broadcast literal, so encoding is a fused scalar
  * loop inside whole-stage codegen — no row expansion, no join, no
  * exchange. m such expressions (one per subspace) turn a dim-float
  * vector into m small codes: the 32×-compressed representation that an
  * ADC scan ranks with table lookups instead of float vector math.
  *
  * Distances are sequential double sums rounded to 6 decimals (the
  * engine-wide portable-float discipline), ties resolve to the smallest
  * code — so a SQL oracle's `row_number() OVER (ORDER BY d2, j)`
  * reproduces the exact assignment.
  */
case class PqNearestSub(
    child: Expression,
    offset: Int,
    subLen: Int,
    codebook: Seq[Seq[Float]])
    extends UnaryExpression with Serializable {

  require(codebook.nonEmpty && codebook.forall(_.length == subLen),
    s"codebook entries must all have $subLen components")

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  @transient private lazy val cb: Array[Array[Float]] =
    codebook.map(_.toArray).toArray

  /** Argmin of rounded squared L2; first (= smallest code) wins ties. */
  def computeCode(v: ArrayData): Long = {
    var best = 0
    var bestD = d2(v, cb(0))
    var j = 1
    while (j < cb.length) {
      val d = d2(v, cb(j))
      if (d < bestD) { bestD = d; best = j }
      j += 1
    }
    best.toLong
  }

  private def d2(a: ArrayData, c: Array[Float]): Double = {
    var d = 0.0
    var i = 0
    while (i < subLen) {
      val x = a.getFloat(offset + i).toDouble
      val y = c(i).toDouble
      d += (x - y) * (x - y)
      i += 1
    }
    math.floor(d * 1e6 + 0.5) / 1e6
  }

  override def nullSafeEval(input: Any): Any =
    computeCode(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqNearestSub", this,
      classOf[PqNearestSub].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.computeCode($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqNearestSub =
    copy(child = newChild)
}

object PqEncode {

  /** Column-API entry point: the subspace-`s` code of `vec` under a
    * codebook whose entry `j` is `codebook(j)` sliced to this subspace.
    * Codebook order IS the code assignment — keep it stable between the
    * engine and the oracle's `row_number()` ordering.
    */
  def code(vec: Column, offset: Int, subLen: Int,
      codebook: Seq[Array[Float]]): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(PqNearestSub(
      Bridge.expression(vec), offset, subLen,
      codebook.map(_.slice(offset, offset + subLen).toSeq)))
  }

  /** Driver-side twin of the per-row distance: ADC table entry for a
    * probe subvector against codebook entry `c`, same op order and
    * rounding as [[PqNearestSub.computeCode]].
    */
  def tableEntry(probe: Array[Float], c: Array[Float],
      offset: Int, subLen: Int): Double = {
    var d = 0.0
    var i = 0
    while (i < subLen) {
      val x = probe(offset + i).toDouble
      val y = c(offset + i).toDouble
      d += (x - y) * (x - y)
      i += 1
    }
    math.floor(d * 1e6 + 0.5) / 1e6
  }
}
