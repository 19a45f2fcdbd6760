package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** SQL `SIMILAR TO` support (reference: BinaryExprNode op + sqlparser's
  * SimilarTo, surfaced at datafusion.proto:635-643 via LikeNode family).
  *
  * Spark has no SIMILAR TO; the translation to a full-match regex is done
  * once at plan time in Scala, then evaluated by the codegen'd `RLIKE` —
  * no UDF, nothing interpreted per row.
  */
object RegexFunctions {

  /** Translate a SQL SIMILAR TO pattern into an anchored Java regex:
    * `%` → `.*`, `_` → `.`, the SQL-regex metacharacters `| * + ? ( ) [ ] { }`
    * pass through, `escape` (default `\`) literalizes the next char.
    * Anchoring (`^...$`) matches SIMILAR TO's whole-string semantics. */
  def similarToRegex(pattern: String, escape: Char = '\\'): String = {
    val sb = new StringBuilder("^")
    var i = 0
    var inClass = false
    while (i < pattern.length) {
      val c = pattern.charAt(i)
      if (c == escape && i + 1 < pattern.length) {
        sb.append(java.util.regex.Pattern.quote(pattern.charAt(i + 1).toString))
        i += 1
      } else if (inClass) {
        if (c == ']') inClass = false
        sb.append(c)
      } else c match {
        case '%' => sb.append(".*")
        case '_' => sb.append('.')
        case '[' => inClass = true; sb.append(c)
        // regex chars SQL SIMILAR TO shares with POSIX: pass through
        case '|' | '*' | '+' | '?' | '(' | ')' | '{' | '}' => sb.append(c)
        // regex-special in Java but literal in SQL: escape
        case '.' | '^' | '$' | '\\' => sb.append('\\').append(c)
        case other => sb.append(other)
      }
      i += 1
    }
    sb.append('$').toString
  }

  /** `c SIMILAR TO pattern` as a codegen'd rlike. */
  def similarTo(c: Column, pattern: String): Column =
    c.rlike(similarToRegex(pattern))

  /** `c NOT SIMILAR TO pattern`. */
  def notSimilarTo(c: Column, pattern: String): Column = !similarTo(c, pattern)
}
