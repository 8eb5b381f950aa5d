package graft.model

/**
 * Variable substitution over model SQL/config — the reference's everyday
 * authoring path runs every model definition through a Handlebars-style
 * template with env/config context before execution
 * (packages/core/src/lib/template.ts:74-80; studied, not ported).
 *
 * Graft implements the minimal public mustache subset those templates
 * actually use: `{{ name }}` from the supplied variables and
 * `{{ env.NAME }}` from the environment. Substitution happens BEFORE
 * parameter binding, so a template can shape the query text (table names,
 * schemas, limits) while runtime VALUES still travel as typed `:cursor`
 * parameters — never string-spliced (the reference interpolates values
 * into SQL; keeping the two layers separate is deliberate).
 *
 * Unknown variables throw (strict mode): a silently-empty substitution
 * in a FROM clause is a much worse failure downstream.
 */
object Template {

  private val VarRe = raw"\{\{\s*([A-Za-z_][A-Za-z0-9_.]*)\s*\}\}".r

  /** Render `text`, substituting `{{ key }}` from `vars` and
    * `{{ env.KEY }}` from `env`. */
  def render(text: String, vars: Map[String, String],
             env: Map[String, String] = sys.env): String =
    VarRe.replaceAllIn(text, m => {
      val key = m.group(1)
      val value =
        if (key.startsWith("env.")) env.get(key.stripPrefix("env."))
        else vars.get(key)
      value match {
        case Some(v) => scala.util.matching.Regex.quoteReplacement(v)
        case None => throw new IllegalArgumentException(
          s"template variable '{{ $key }}' is not defined " +
            s"(have: ${vars.keys.toSeq.sorted.mkString(", ")})")
      }
    })
}
