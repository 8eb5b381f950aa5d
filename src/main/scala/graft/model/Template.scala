package graft.model

/**
 * Handlebars-compatible templating over model SQL/config — the reference's
 * everyday authoring path compiles every model definition and config object
 * through real Handlebars with env/config context before execution
 * (packages/core/src/lib/template.ts:74-90; studied, not ported).
 *
 * Graft implements the Handlebars subset those templates actually use:
 *
 *  - `{{ name }}` substitution with dotted paths (`{{ user.name }}`,
 *    `{{ env.HOME }}`);
 *  - `{{#if cond}} … {{else}} … {{/if}}` and `{{#unless}}` blocks with
 *    Handlebars truthiness (false, null, "", 0 and empty sequences are
 *    falsy; an UNDEFINED condition variable is falsy, not an error);
 *  - `{{#each items}} … {{/each}}` loops with `{{this}}`, `{{@index}}`,
 *    and item-field scoping for sequence-of-map contexts.
 *
 * Substitution happens BEFORE parameter binding, so a template can shape
 * the query text (table names, schemas, optional WHERE blocks) while
 * runtime VALUES still travel as typed `:name` parameters — never
 * string-spliced (the reference interpolates values into SQL; keeping the
 * two layers separate is deliberate).
 *
 * One deliberate divergence: an unknown variable in SUBSTITUTION position
 * throws (strict mode) where Handlebars renders an empty string — a
 * silently-empty substitution in a FROM clause is a much worse failure
 * downstream. Block conditions keep the permissive Handlebars semantics
 * (undefined = falsy), which is what makes optional-clause authoring work.
 */
object Template {

  /** Render `text`, substituting from `vars` and `{{ env.KEY }}` from
    * `env` — the string-only entry point model/config loading uses. */
  def render(text: String, vars: Map[String, String],
             env: Map[String, String] = sys.env): String =
    renderAny(text, vars, env)

  /** Rich-context render: values may be strings/numbers/booleans,
    * `Seq[Any]` (for `{{#each}}`), or nested `Map[String, Any]`
    * (for dotted paths). */
  def renderAny(text: String, vars: Map[String, Any],
                env: Map[String, String] = sys.env): String = {
    val out = new StringBuilder
    emit(parse(tokenize(text)), List(vars + ("env" -> env)), out)
    out.toString
  }

  // ---------- lexer ----------

  private sealed trait Tok
  private final case class Lit(s: String) extends Tok
  private final case class Tag(body: String) extends Tok // trimmed {{ … }} innards

  private def tokenize(text: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    while (i < text.length) {
      val open = text.indexOf("{{", i)
      if (open < 0) { out += Lit(text.substring(i)); i = text.length }
      else {
        if (open > i) out += Lit(text.substring(i, open))
        val close = text.indexOf("}}", open + 2)
        if (close < 0)
          throw new IllegalArgumentException(s"unclosed '{{' at offset $open")
        out += Tag(text.substring(open + 2, close).trim)
        i = close + 2
      }
    }
    out.result()
  }

  // ---------- parser ----------

  private sealed trait Node
  private final case class Text(s: String) extends Node
  private final case class Var(path: String) extends Node
  private final case class Cond(path: String, negate: Boolean,
                                thenN: List[Node], elseN: List[Node]) extends Node
  private final case class Each(path: String, body: List[Node]) extends Node

  private def keyword(tag: String): String = tag.split("\\s+", 2)(0)
  private def arg(tag: String): String = {
    val parts = tag.split("\\s+", 2)
    if (parts.length < 2 || parts(1).trim.isEmpty)
      throw new IllegalArgumentException(s"'{{${parts(0)}}}' needs an argument")
    parts(1).trim
  }

  private def parse(toks: Vector[Tok]): List[Node] = {
    var i = 0
    // parse until one of `closers` (returning which), or end of input
    def block(closers: Set[String]): (List[Node], String) = {
      val nodes = List.newBuilder[Node]
      while (i < toks.length) {
        toks(i) match {
          case Lit(s) => nodes += Text(s); i += 1
          case Tag(body) =>
            i += 1
            val kw = keyword(body)
            if (closers.contains(kw)) return (nodes.result(), kw)
            kw match {
              case "#if" | "#unless" =>
                val neg = kw == "#unless"
                val closer = if (neg) "/unless" else "/if"
                val (thenN, stop) = block(Set(closer, "else"))
                val elseN = if (stop == "else") block(Set(closer))._1 else Nil
                nodes += Cond(arg(body), neg, thenN, elseN)
              case "#each" =>
                nodes += Each(arg(body), block(Set("/each"))._1)
              case "else" | "/if" | "/unless" | "/each" =>
                throw new IllegalArgumentException(s"unexpected '{{$body}}' outside its block")
              case other if other.startsWith("#") =>
                throw new IllegalArgumentException(s"unsupported block helper '{{$other}}'")
              case _ => nodes += Var(body)
            }
        }
      }
      if (closers.nonEmpty)
        throw new IllegalArgumentException(s"missing '{{${closers.toSeq.sorted.mkString("}}' or '{{")}}}'")
      (nodes.result(), "")
    }
    block(Set.empty)._1
  }

  // ---------- evaluation ----------

  /** Resolve a dotted path against the scope chain: the first scope whose
    * map defines the HEAD segment wins (Handlebars scoping); nested
    * segments then resolve inside that value only. */
  private def lookup(path: String, scopes: List[Map[String, Any]]): Option[Any] = {
    val segs = path.split("\\.").toList
    def descend(root: Any, rest: List[String]): Option[Any] = rest match {
      case Nil => Option(root)
      case h :: t => root match {
        case m: Map[_, _] => m.asInstanceOf[Map[String, Any]].get(h).flatMap(descend(_, t))
        case _ => None
      }
    }
    scopes.find(_.contains(segs.head))
      .flatMap(sc => descend(sc(segs.head), segs.tail))
  }

  private def truthy(v: Option[Any]): Boolean = v match {
    case None | Some(null) | Some(false) | Some("") => false
    case Some(s: Seq[_]) => s.nonEmpty
    case Some(n: Int) => n != 0
    case Some(n: Long) => n != 0L
    case Some(n: Double) => n != 0.0
    case _ => true
  }

  private def stringify(v: Any): String = v match {
    case null => ""
    case s: String => s
    case other => other.toString
  }

  private def emit(nodes: List[Node], scopes: List[Map[String, Any]],
                   out: StringBuilder): Unit =
    nodes.foreach {
      case Text(s) => out ++= s
      case Var(p) => lookup(p, scopes) match {
        case Some(v) => out ++= stringify(v)
        case None => throw new IllegalArgumentException(
          s"template variable '{{ $p }}' is not defined " +
            s"(have: ${scopes.flatMap(_.keys).distinct.sorted.mkString(", ")})")
      }
      case Cond(p, neg, thenN, elseN) =>
        emit(if (truthy(lookup(p, scopes)) != neg) thenN else elseN, scopes, out)
      case Each(p, body) => lookup(p, scopes) match {
        case Some(s: Seq[_]) => s.zipWithIndex.foreach { case (item, idx) =>
          val fields = item match {
            case m: Map[_, _] => m.asInstanceOf[Map[String, Any]]
            case _ => Map.empty[String, Any]
          }
          emit(body, (fields + ("this" -> item) + ("@index" -> idx)) :: scopes, out)
        }
        case Some(other) => throw new IllegalArgumentException(
          s"'{{#each $p}}' needs a sequence, got ${other.getClass.getSimpleName}")
        case None => () // undefined list renders nothing, Handlebars semantics
      }
    }
}
