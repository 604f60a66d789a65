package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression for cosine similarity over two
  * `array<float>` columns.
  *
  * Why an Expression and not a UDF: a Scala UDF forces a
  * catalyst→Scala conversion of both arrays (ArrayData → Seq[Float]
  * boxing) per row and breaks out of whole-stage codegen; this
  * expression reads the unsafe `ArrayData` buffers directly and its
  * generated code is a single static call that stays inside the
  * WholeStageCodegen pipeline. Result is bit-identical to
  * [[graft.functions.FastText.cosineJvm]] (same sequential double
  * summation + pround(6)) — see CosineSimSpec.
  *
  * Preference ladder (build prompt): compose built-ins < custom
  * Expression < custom physical operator; dot products over arrays are
  * exactly the "built-ins are interpreted HOF lambdas" case where a
  * custom Expression is warranted.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    CosineSim.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""java.lang.Double ${ev.value}$$r = graft.plans.CosineSim.compute($a, $b);
         |if (${ev.value}$$r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${ev.value}$$r.doubleValue(); }""".stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

object CosineSim {

  /** Shared kernel for both interpreted and generated paths. Malformed
    * inputs (length mismatch, zero norm) return null — identical to
    * [[graft.functions.FastText.cosineJvm]], enforced by CosineSimSpec.
    */
  def compute(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) null
    else math.floor(dot / (math.sqrt(na) * math.sqrt(nb)) * 1e6 + 0.5) / 1e6
  }

  /** Column-API entry point. */
  def cosineSim(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(CosineSim(Bridge.expression(a), Bridge.expression(b)))
  }
}
