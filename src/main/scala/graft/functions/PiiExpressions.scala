package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused typed-PII kernel (VERDICT r15 item 4): the six
  * [[graft.operators.TextStats.piiCategories]] stages — count +
  * placeholder-scrub, applied IN ORDER on the progressively scrubbed
  * text — in ONE expression call. Semantics are bit-identical to the
  * six-stage `regexp_count` + `regexp_replace` chain it replaces (same
  * java.util.regex engine, same sequential precedence: an email inside
  * a URL still counts once, under email), but the text converts
  * UTF8String->String once instead of twelve times and each stage's
  * count and replacement share a single Matcher traversal instead of
  * two — 6 regex passes + 1 conversion where the chain did 12 + 12. */
object PiiKernels {

  /** Compiled per-category (pattern, placeholder), in precedence
    * order, from the single source of truth in TextStats. */
  private lazy val stages: Array[(Pattern, String)] =
    graft.operators.TextStats.piiCategories
      .map { case (_, pat, ph) => (Pattern.compile(pat), ph) }.toArray

  val nCategories: Int = graft.operators.TextStats.piiCategories.length

  // per-stage gate kind, keyed on the category NAME so a reordering of
  // piiCategories can never misalign a gate with its pattern
  private final val GateAt = 0; private final val GateHttp = 1
  private final val GatePhone = 2; private final val GateDigit = 3
  private lazy val gates: Array[Int] =
    graft.operators.TextStats.piiCategories.map {
      case ("email", _, _) => GateAt
      case ("url", _, _) => GateHttp
      case ("phone", _, _) => GatePhone
      case _ => GateDigit
    }.toArray

  /** (n_cat0..n_cat5, scrubbed) of one NORMALIZED text. */
  def profile(s: UTF8String): GenericInternalRow = {
    var t = s.toString
    // one cheap char prescan gates each stage on a NECESSARY literal of
    // its pattern — email needs '@', url needs "http", cc/ip/num need a
    // digit, phone needs '+' or '(' — so a stage that provably cannot
    // match skips its whole regex traversal. Flags come from the
    // ORIGINAL text: placeholders introduce no trigger characters, so a
    // gate can only be conservatively true (a scrubbed-away trigger
    // costs one cheap failing find()), never wrongly false.
    var hasAt = false; var hasDigit = false; var hasPlusParen = false
    var k = 0
    while (k < t.length) {
      val c = t.charAt(k)
      if (c == '@') hasAt = true
      else if (c >= '0' && c <= '9') hasDigit = true
      else if (c == '+' || c == '(') hasPlusParen = true
      k += 1
    }
    lazy val hasHttp = t.contains("http")
    val out = new Array[Any](stages.length + 1)
    var i = 0
    while (i < stages.length) {
      val runnable = gates(i) match {
        case GateAt => hasAt
        case GateHttp => hasHttp
        case GatePhone => hasDigit && hasPlusParen
        case _ => hasDigit
      }
      var n = 0L
      if (runnable) {
        val m = stages(i)._1.matcher(t)
        if (m.find()) {
          // count and replace in the same traversal (the chain paid a
          // regexp_count pass plus a regexp_replace pass per category)
          val sb = new java.lang.StringBuilder(t.length)
          do {
            n += 1
            m.appendReplacement(sb, stages(i)._2) // no $ or \ in placeholders
          } while (m.find())
          m.appendTail(sb)
          t = sb.toString
        }
      }
      out(i) = n
      i += 1
    }
    out(stages.length) = UTF8String.fromString(t)
    new GenericInternalRow(out)
  }
}

/** Struct of the six category counts + the fully scrubbed text, from
  * one [[PiiKernels.profile]] call per row, fully codegen'd. */
case class PiiProfile(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(
    graft.operators.TextStats.piiCategories
      .map { case (name, _, _) => StructField(s"n_$name", LongType, nullable = false) } :+
      StructField("scrubbed", StringType, nullable = false))
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pii_profile"
  override protected def nullSafeEval(s: Any): Any =
    PiiKernels.profile(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.PiiKernels.profile($s)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

object pii {
  def pii_profile(normText: Column): Column =
    GraftBridge.column(PiiProfile(GraftBridge.expression(normText)))
}
