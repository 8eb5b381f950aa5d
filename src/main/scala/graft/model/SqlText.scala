package graft.model

/**
 * Lexical analysis of model SQL text — the load-time guards the reference
 * applies through a full SQL parse (core/src/lib/sql.ts:22-45: reject
 * multi-statement input, reject non-SELECT, collect `:name` params from
 * the AST). Graft delegates PARSING to Spark's own SQL parser at build
 * time; these checks only need a literal/comment-aware scan, which keeps
 * them dialect-agnostic and dependency-free.
 */
object SqlText {

  /** `text` with string literals ('…' with '' escapes, "…"), line
    * comments (`-- …`) and block comments erased (replaced by spaces, so
    * offsets and token boundaries survive). */
  def blankLiterals(text: String): String = {
    val out = text.toCharArray
    var i = 0
    def blank(from: Int, until: Int): Unit = {
      var j = from
      while (j < until) { if (!out(j).isWhitespace) out(j) = ' '; j += 1 }
    }
    while (i < out.length) {
      out(i) match {
        case '\'' | '"' =>
          val q = out(i); val start = i; i += 1
          var closed = false
          while (i < out.length && !closed) {
            if (out(i) == '\\' && i + 1 < out.length) i += 2 // \' and \\ escapes
            else if (out(i) == q) {
              if (q == '\'' && i + 1 < out.length && out(i + 1) == '\'') i += 2 // '' escape
              else { closed = true; i += 1 }
            } else i += 1
          }
          blank(start + 1, math.max(start + 1, i - (if (closed) 1 else 0)))
        case '-' if i + 1 < out.length && out(i + 1) == '-' =>
          val start = i
          while (i < out.length && out(i) != '\n') i += 1
          blank(start, i)
        case '/' if i + 1 < out.length && out(i + 1) == '*' =>
          val start = i; i += 2
          while (i + 1 < out.length && !(out(i) == '*' && out(i + 1) == '/')) i += 1
          i = math.min(out.length, i + 2)
          blank(start, i)
        case _ => i += 1
      }
    }
    new String(out)
  }

  private val ParamRe = raw"(?<![:\w]):([A-Za-z_][A-Za-z0-9_]*)".r

  /** Distinct `:name` parameters outside literals/comments, in first-seen
    * order (the reference walks the AST for `param` nodes, sql.ts:45-50).
    * `::type` casts and literal text never match. */
  def namedParams(sql: String): Seq[String] =
    ParamRe.findAllMatchIn(blankLiterals(sql)).map(_.group(1)).toSeq.distinct

  /** Reject anything but exactly one SELECT (or WITH … SELECT) statement,
    * with the reference's two load-time complaints (sql.ts:34-41): a
    * second `;`-separated statement, or a leading keyword that could
    * write/alter state. */
  def requireSingleSelect(sql: String): Unit = {
    val blanked = blankLiterals(sql)
    val statements = blanked.split(";").map(_.trim).filter(_.nonEmpty)
    if (statements.length > 1)
      throw new IllegalArgumentException(
        s"SQL query contains multiple (${statements.length}) statements")
    val head = statements.headOption.getOrElse(
      throw new IllegalArgumentException("SQL query must be a SELECT statement"))
    val first = head.dropWhile(c => !c.isLetter).takeWhile(_.isLetter).toUpperCase
    if (first != "SELECT" && first != "WITH" && first != "VALUES")
      throw new IllegalArgumentException("SQL query must be a SELECT statement")
  }
}
