package graft.expr

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** RFC 3986 percent-encoding normalization as a native Catalyst
  * expression — one linear pass per URL (vs ~220 chained `replace` calls
  * for the same semantics in pure built-ins), codegen'd via a static call
  * like [[JaccardSorted]].
  *
  * Semantics (RFC 3986 §2.3/§6.2.2.1-2): for every well-formed `%XY`
  * sequence, decode it when the octet is UNRESERVED (ALPHA / DIGIT /
  * `-` `.` `_` `~` — such encodings are definitionally equivalent to the
  * raw character), otherwise uppercase the two hex digits (`%2f` == `%2F`
  * but only one spelling is canonical). Malformed sequences (`%` not
  * followed by two ASCII hex digits) copy through unchanged. Only ASCII
  * octets are decoded, so the pass never has to reassemble multi-byte
  * UTF-8 percent sequences and is safe to apply to a whole URL before
  * parsing: decoding unreserved characters cannot introduce a delimiter.
  *
  * Single pass, no rescan (python urllib.parse.unquote / WHATWG URL
  * parity): a decode output is never re-examined, so the pass is
  * idempotent on well-formed URLs but NOT on malformed ones — e.g.
  * `%7%65` -> `%7e` (malformed `%7` copied, `%65` decoded), which a
  * SECOND pass would decode to `~`. This is the standard library
  * behavior, documented here as intentional; UrlOpsSpec pins both the
  * malformed vectors and the second-pass divergence.
  *
  * The DuckDB oracle mirrors this with a recursive-CTE left-to-right
  * scan with identical no-rescan semantics
  * (SparkEntry.pctNormalizeCtes).
  */
case class UrlPctNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string argument, got ${other.simpleString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = UrlPctNormalize.name

  override def nullSafeEval(u: Any): Any =
    UrlPctNormalize.compute(u.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, u =>
      s"${ev.value} = graft.expr.UrlPctNormalize.compute($u);")

  override protected def withNewChildInternal(newChild: Expression): UrlPctNormalize =
    copy(child = newChild)
}

object UrlPctNormalize {

  val name = "graft_url_pct_normalize"

  private def hexVal(ch: Char): Int =
    if (ch >= '0' && ch <= '9') ch - '0'
    else if (ch >= 'a' && ch <= 'f') ch - 'a' + 10
    else if (ch >= 'A' && ch <= 'F') ch - 'A' + 10
    else -1

  private def isUnreserved(v: Int): Boolean =
    (v >= 'A' && v <= 'Z') || (v >= 'a' && v <= 'z') || (v >= '0' && v <= '9') ||
      v == '-' || v == '.' || v == '_' || v == '~'

  /** Linear pass — called from generated code. */
  def compute(u: UTF8String): UTF8String = {
    val s = u.toString
    val n = s.length
    if (s.indexOf('%') < 0) return u // common case: nothing to normalize
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < n) {
        val h1 = hexVal(s.charAt(i + 1))
        val h2 = hexVal(s.charAt(i + 2))
        if (h1 >= 0 && h2 >= 0) {
          val v = h1 * 16 + h2
          if (isUnreserved(v)) sb.append(v.toChar)
          else {
            sb.append('%')
            sb.append(Character.toUpperCase(s.charAt(i + 1)))
            sb.append(Character.toUpperCase(s.charAt(i + 2)))
          }
          i += 3
        } else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    UTF8String.fromString(sb.toString)
  }

  private val info = new ExpressionInfo(classOf[UrlPctNormalize].getName, name)
  private[expr] val builder = (children: Seq[Expression]) => {
    require(children.size == 1, s"$name expects 1 argument")
    UrlPctNormalize(children.head)
  }

  /** Idempotent per-session registration (for sessions built in code). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(FunctionIdentifier(name)))
      reg.registerFunction(FunctionIdentifier(name), info, builder)
  }
}
