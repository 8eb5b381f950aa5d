package graft.project

import java.nio.file.{Files, Path, Paths}

/**
 * Environment handling for project files, matching the reference's rules
 * (docs/fundamentals/project.mdx, core/src/lib/template.ts):
 *
 *  - `.env` / `.env.local` in the project root, then the current working
 *    directory, then any explicit extra files — later files win;
 *  - every project file may reference `${env.NAME}`; any OTHER `${...}`
 *    placeholder form is an error (template.ts:31's exact complaint), as
 *    is a reference to an undefined variable — secrets must never
 *    silently become empty strings.
 */
object EnvVars {

  private val Placeholder = raw"\$$\{([A-Za-z0-9_.\-]+)(?::([^}]*))?\}".r
  /** Catch-all: any `${…}` at all — placeholders too malformed for
    * [[Placeholder]] (`${env NAME}`, `${env.NAME!}`) must still FAIL
    * LOUDLY (template.ts:31), not ride through as literal text. */
  private val AnyPlaceholder = raw"\$$\{[^}]*\}".r

  /** KEY=VALUE lines; blank lines and #-comments ignored; optional quotes. */
  def loadEnvFile(path: Path): Map[String, String] =
    if (!Files.exists(path)) Map.empty
    else {
      val src = scala.io.Source.fromFile(path.toFile, "UTF-8")
      try src.getLines()
        .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#") && l.contains("="))
        .map { l =>
          val i = l.indexOf('=')
          val v = l.substring(i + 1).trim
          val unq = if (v.length >= 2 && ((v.head == '"' && v.last == '"') ||
                        (v.head == '\'' && v.last == '\''))) v.substring(1, v.length - 1) else v
          l.substring(0, i).trim -> unq
        }.toMap
      finally src.close()
    }

  /** Merged environment with the reference's precedence (last wins). */
  def projectEnv(projectDir: String, extraEnvFiles: Seq[String] = Nil,
                 base: Map[String, String] = sys.env): Map[String, String] = {
    val layers = Seq(
      Paths.get(projectDir, ".env"),
      Paths.get(projectDir, ".env.local"),
      Paths.get(".env"),
      Paths.get(".env.local")) ++ extraEnvFiles.map(Paths.get(_))
    layers.foldLeft(base)((acc, p) => acc ++ loadEnvFile(p))
  }

  /** Substitute `${env.NAME}` (with optional `${env.NAME:default}`
    * fallback, template.ts:20-27's defaultVal path) in raw file text. */
  def substitute(text: String, env: Map[String, String], filePath: String = "unknown file"): String = {
    // scan the ORIGINAL text (not the output — substituted secret VALUES
    // may legitimately contain `${`): every `${…}` span must be a
    // well-formed placeholder, or the load fails with the same complaint
    // a wrong prefix gets
    val wellFormed = Placeholder.findAllMatchIn(text).map(_.start).toSet
    AnyPlaceholder.findAllMatchIn(text).foreach { m =>
      if (!wellFormed.contains(m.start))
        throw new IllegalArgumentException(
          s"Unsupported placeholder ${m.matched} in $filePath. Only $${env.NAME} placeholders are supported.")
    }
    Placeholder.replaceAllIn(text, m => {
      val inner = m.group(1).trim
      val default = Option(m.group(2)).map(_.trim)
      if (!inner.startsWith("env."))
        throw new IllegalArgumentException(
          s"Unsupported placeholder $${$inner} in $filePath. Only $${env.NAME} placeholders are " +
            s"supported. Did you mean $${env.$inner}?")
      val name = inner.stripPrefix("env.")
      java.util.regex.Matcher.quoteReplacement(env.get(name).orElse(default).getOrElse(
        throw new IllegalArgumentException(s"Environment variable $name (referenced in $filePath) is not defined")))
    })
  }
}
