package graft.catalyst

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `html_entity_decode(s)` — ONE left-to-right pass decoding HTML
  * character references, as a native codegen Expression (the entity
  * stage of the crawl-intake HTML strip).
  *
  * Decoded forms (round-12 verdict #2 added the numeric families —
  * `&#8217;`-class references survive into clean text on essentially
  * every real page, corrupting downstream token/dedup/LM statistics):
  *
  *  - named: `&lt; &gt; &quot; &nbsp; &amp;` (the fixed set the strip
  *    stage has always carried; `&#39;` now rides the numeric path).
  *    `&nbsp;` decodes to the spec-correct U+00A0 (round 14; it was
  *    U+0020 through round 13) in all three twins at once — batch
  *    expression, DuckDB SQL, streaming reimplementation — so a
  *    decoded `&nbsp;` now survives the downstream whitespace
  *    collapse exactly like a raw NBSP byte already did;
  *  - decimal: `&#D;` with 1–7 digits; hex: `&#xH;`/`&#XH;` with 1–6
  *    hex digits. The bounded lengths are the spec: longer digit runs
  *    are NOT references and pass through literally (they also cannot
  *    overflow the parse — max 9 999 999 / 0xFFFFFF). A matched
  *    reference whose code point is 0, a UTF-16 surrogate
  *    (U+D800–DFFF), or past U+10FFFF decodes to U+FFFD (the
  *    HTML5-style replacement), never an invalid string.
  *
  * Single-pass means no double decode BY CONSTRUCTION: the scan never
  * re-reads produced text, so `&amp;amp;` → `&amp;`, `&amp;#8217;` →
  * `&#8217;`, and `&#38;lt;` → `&lt;` — all literals, exactly the
  * no-double-decode order the strip gate has pinned since round 12
  * (the old ordered replace chain with `&amp;` last agreed with the
  * single pass on every such case; the numeric families require the
  * single pass to keep that property). Malformed forms (`&#;`,
  * `&#xG;`, a missing semicolon) never match and pass through.
  *
  * Why native: the strip chain is one codegen'd projection per row
  * over every crawled document; a higher-order-function reassembly
  * (split + zip_with + array_join) evaluates interpreted and would
  * break the whole-stage span this hot path sits in. The DuckDB twin
  * is exactly that reassembly ([[graft.ops.TextOps]]'
  * `htmlEntityDecodeSql`), which is fine at oracle grain.
  */
case class HtmlEntityDecode(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"html_entity_decode expects string, got ${child.dataType.simpleString}")

  override def dataType: DataType = StringType

  override def nullSafeEval(s: Any): Any =
    HtmlEntityDecode.decode(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.catalyst.HtmlEntityDecode.decode($x);")

  override protected def withNewChildInternal(
      newChild: Expression): HtmlEntityDecode = copy(child = newChild)

  override def prettyName: String = "html_entity_decode"
}

object HtmlEntityDecode {

  /** The reference grammar. Kept in one place: the DuckDB twin embeds
    * the same pattern (RE2/Java-identical: literal alternation +
    * bounded classes, no backtracking subtleties). */
  val EntityRe: String =
    "&(?:lt|gt|quot|nbsp|amp|#[0-9]{1,7}|#[xX][0-9a-fA-F]{1,6});"

  private val P = java.util.regex.Pattern.compile(EntityRe)

  /** Codegen entry point (static call target). */
  def decode(s: UTF8String): UTF8String = {
    val str = s.toString
    if (str.indexOf('&') < 0) return s // fast path: nothing to decode
    val m = P.matcher(str)
    if (!m.find()) return s
    val sb = new java.lang.StringBuilder(str.length)
    var last = 0
    do {
      sb.append(str, last, m.start())
      sb.append(repl(str, m.start(), m.end()))
      last = m.end()
    } while (m.find())
    sb.append(str, last, str.length)
    UTF8String.fromString(sb.toString)
  }

  /** Replacement for one matched reference str[start, end). */
  private def repl(str: String, start: Int, end: Int): String = {
    if (str.charAt(start + 1) != '#')
      str.substring(start, end) match {
        case "&lt;" => "<"
        case "&gt;" => ">"
        case "&quot;" => "\""
        case "&nbsp;" => "\u00A0" // HTML5: U+00A0, NOT a plain space
                                   // (its whole purpose is surviving
                                   // the whitespace collapse, like a
                                   // raw NBSP byte does) — ADVICE r13
        case _ => "&" // "&amp;" — the only remaining named form
      }
    else {
      val c2 = str.charAt(start + 2)
      val hex = c2 == 'x' || c2 == 'X'
      val from = if (hex) start + 3 else start + 2
      // bounded to 7 decimal / 6 hex digits by the regex: fits Int
      var cp = 0
      var i = from
      while (i < end - 1) {
        val d = Character.digit(str.charAt(i), if (hex) 16 else 10)
        cp = cp * (if (hex) 16 else 10) + d
        i += 1
      }
      if (cp == 0 || cp > 0x10FFFF || (cp >= 0xD800 && cp <= 0xDFFF))
        "�"
      else new String(Character.toChars(cp))
    }
  }
}
