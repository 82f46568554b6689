package graft.expr

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}
import org.apache.spark.sql.SparkSessionExtensions

/** Exact Jaccard of two SORTED distinct long arrays as a native Catalyst
  * expression: the merge-count runs directly over ArrayData (no Seq
  * boxing, no UDF row conversion) and participates in whole-stage codegen
  * through a static call — replacing the Scala UDF in the verify hot path.
  * Semantics: minhash_model.py _jaccard_from_sets (both empty -> 0.0),
  * identical to MinHashSig.jaccardSorted (asserted in PropertySpec).
  */
case class JaccardSorted(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two array<bigint> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_jaccard_sorted"

  override def nullSafeEval(a: Any, b: Any): Any =
    JaccardSorted.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expr.JaccardSorted.compute($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): JaccardSorted =
    copy(left = newLeft, right = newRight)
}

object JaccardSorted {

  /** Merge-count over ArrayData — called from generated code. */
  def compute(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    if (na == 0 && nb == 0) return 0.0
    var i = 0; var j = 0; var inter = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    val union = na + nb - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }

  val name = "graft_jaccard_sorted"
  private val info = new ExpressionInfo(classOf[JaccardSorted].getName, name)
  private[expr] val builder = (children: Seq[Expression]) => {
    require(children.size == 2, s"$name expects 2 arguments")
    JaccardSorted(children.head, children(1))
  }

  /** Idempotent per-session registration (for sessions built in code). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(FunctionIdentifier(name)))
      reg.registerFunction(FunctionIdentifier(name), info, builder)
  }
}

/** spark.sql.extensions entry point: spark-submit deployments pass
  * `--conf spark.sql.extensions=graft.expr.GraftExtensions` and get the
  * engine's native functions in every session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // shared builder: its arity require turns a wrong-arity call into an
    // analysis-time error instead of an opaque children.head crash
    ext.injectFunction((FunctionIdentifier(JaccardSorted.name),
      new ExpressionInfo(classOf[JaccardSorted].getName, JaccardSorted.name),
      JaccardSorted.builder))
    ext.injectFunction((FunctionIdentifier(UrlPctNormalize.name),
      new ExpressionInfo(classOf[UrlPctNormalize].getName, UrlPctNormalize.name),
      UrlPctNormalize.builder))
  }
}
