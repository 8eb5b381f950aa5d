package graft.project

/**
 * Minimal YAML-subset parser for syncmaven-style project files
 * (docs/fundamentals/{project,connection,sync,model}.mdx — flat-to-two-level
 * maps of scalars, e.g. `package: {type, image}`, `credentials: {...}`,
 * `options: {...}`, scalar lists). Supported subset, deliberately small
 * (this environment allows no external dependencies, and the reference's
 * project files use nothing more):
 *
 *  - nested maps via 2+-space indentation (`key:` then deeper lines)
 *  - inline scalars `key: value` (value may contain ':')
 *  - scalar lists (`- item`) and lists of maps (`- key: value` + deeper)
 *  - double/single-quoted strings; bare ints, doubles, booleans, null
 *  - `#` full-line comments and blank lines
 *
 * NOT supported (throws or misparses — callers own their files): anchors,
 * multi-line scalars, flow `{a: b}` / `[x]` syntax, tabs.
 */
object Yaml {

  def parse(text: String): Map[String, Any] = {
    val lines = text.linesIterator.zipWithIndex
      .map { case (l, i) => (l.stripSuffix("\r").replaceAll("\t", "  "), i + 1) }
      .filter { case (l, _) => l.trim.nonEmpty && !l.trim.startsWith("#") }
      .toVector
    val (v, rest) = parseBlock(lines, indentOf(lines.headOption.map(_._1).getOrElse("")))
    require(rest.isEmpty, s"yaml: trailing content at line ${rest.head._2}")
    v match {
      case m: Map[_, _] => m.asInstanceOf[Map[String, Any]]
      case other => throw new IllegalArgumentException(s"yaml: top level must be a map, got $other")
    }
  }

  private def indentOf(l: String): Int = l.takeWhile(_ == ' ').length

  /** Parse one block at `indent`; returns (value, remaining lines). */
  private def parseBlock(lines: Vector[(String, Int)], indent: Int): (Any, Vector[(String, Int)]) = {
    if (lines.isEmpty) (Map.empty[String, Any], lines)
    else if (lines.head._1.trim.startsWith("- ") || lines.head._1.trim == "-") parseList(lines, indent)
    else parseMap(lines, indent)
  }

  private def parseMap(lines0: Vector[(String, Int)], indent: Int): (Map[String, Any], Vector[(String, Int)]) = {
    var lines = lines0
    val out = scala.collection.mutable.LinkedHashMap.empty[String, Any]
    while (lines.nonEmpty && indentOf(lines.head._1) == indent && !lines.head._1.trim.startsWith("- ")) {
      val (line, ln) = lines.head
      val t = line.trim
      val ci = t.indexOf(':')
      require(ci > 0, s"yaml: expected 'key: value' at line $ln: '$t'")
      val key = unquote(t.substring(0, ci).trim)
      val rest = t.substring(ci + 1).trim
      lines = lines.tail
      if (rest.nonEmpty) out += key -> scalar(rest)
      else {
        // nested block (deeper indent) or empty value
        if (lines.nonEmpty && indentOf(lines.head._1) > indent) {
          val (v, remaining) = parseBlock(lines, indentOf(lines.head._1))
          out += key -> v
          lines = remaining
        } else out += key -> null
      }
    }
    if (lines.nonEmpty && indentOf(lines.head._1) > indent)
      throw new IllegalArgumentException(s"yaml: unexpected indent at line ${lines.head._2}")
    (out.toMap, lines)
  }

  private def parseList(lines0: Vector[(String, Int)], indent: Int): (List[Any], Vector[(String, Int)]) = {
    var lines = lines0
    val out = scala.collection.mutable.ListBuffer.empty[Any]
    while (lines.nonEmpty && indentOf(lines.head._1) == indent &&
           (lines.head._1.trim.startsWith("- ") || lines.head._1.trim == "-")) {
      val (line, ln) = lines.head
      val item = line.trim.drop(1).trim
      lines = lines.tail
      if (item.isEmpty) { // "-" then nested block
        // A bare dash with no deeper-indented continuation (end of input, or
        // the next line belongs to a shallower block) is an EMPTY list item —
        // emit null rather than dereferencing a line that isn't ours.
        if (lines.isEmpty || indentOf(lines.head._1) <= indent) out += null
        else {
          val (v, remaining) = parseBlock(lines, indentOf(lines.head._1))
          out += v
          lines = remaining
        }
      } else if (!isQuotedScalar(item) && (item.contains(": ") || item.endsWith(":"))) {
        // list item that is a map: re-parse the dash line as the first key
        // at a virtual indent two deeper, followed by the deeper lines
        val virtualIndent = indent + 2
        val rewritten = (" " * virtualIndent + item, ln) +:
          lines.takeWhile { case (l, _) => indentOf(l) >= virtualIndent }
        val following = lines.drop(rewritten.length - 1)
        val (v, rem) = parseMap(rewritten, virtualIndent)
        require(rem.isEmpty, s"yaml: bad list-map item at line $ln")
        out += v
        lines = following
      } else out += scalar(item)
    }
    (out.toList, lines)
  }

  /** A whole-line quoted token (`"X-Api-Key: k1"`) is a SCALAR even when
    * it contains `: ` — without this, the reference http connector's
    * header lists would misparse as one-entry maps. */
  private def isQuotedScalar(s: String): Boolean =
    s.length >= 2 && (s.head == '"' || s.head == '\'') &&
      s.indexOf(s.head, 1) == s.length - 1

  private def unquote(s: String): String =
    if (s.length >= 2 && ((s.head == '"' && s.last == '"') || (s.head == '\'' && s.last == '\'')))
      s.substring(1, s.length - 1)
    else s

  private def scalar(raw: String): Any = {
    val s = raw.trim
    if (s.startsWith("\"") || s.startsWith("'")) unquote(s)
    else s match {
      case "true"  => true
      case "false" => false
      case "null" | "~" => null
      case _ =>
        try s.toLong.asInstanceOf[Any]
        catch { case _: NumberFormatException =>
          try s.toDouble.asInstanceOf[Any]
          catch { case _: NumberFormatException => s }
        }
    }
  }
}
