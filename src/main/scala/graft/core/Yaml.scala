package graft.core

/** Minimal YAML-subset parser for `feature_store.yaml` (reference M1,
  * `infra/on-prem/workspace-dev/feature_repo/feature_store.yaml:1-18`).
  * Supports exactly the subset those files use: nested maps by
  * indentation, scalar `key: value` entries, single/double-quoted
  * strings, `#` comments (full-line and trailing), and blank lines.
  * No sequences, anchors, or multi-line scalars — a config loader, not a
  * YAML engine (and no new library dependencies).
  */
object Yaml {

  /** Parse a document into nested `Map[String, Any]` where values are
    * either `String` scalars or nested maps.
    */
  def parse(text: String): Map[String, Any] = {
    val lines = text.replace("\r\n", "\n").split('\n').toVector
      .map(l => l.replace("\t", "  "))
      .filter(l => l.trim.nonEmpty && !l.trim.startsWith("#"))
    parseBlock(lines, 0, lines.length)._1
  }

  private def indentOf(l: String): Int = l.takeWhile(_ == ' ').length

  private def parseBlock(
      ls: Vector[String], start: Int, end: Int): (Map[String, Any], Int) = {
    if (start >= end) return (Map.empty, start)
    val ind = indentOf(ls(start))
    var out = Map.empty[String, Any]
    var i = start
    while (i < end && indentOf(ls(i)) >= ind) {
      val line = ls(i)
      require(indentOf(line) == ind,
        s"inconsistent indentation at: '$line' (expected $ind spaces)")
      val t = line.trim
      val ci = t.indexOf(':')
      require(ci > 0, s"expected 'key: value', got: '$t'")
      val key = unquote(t.substring(0, ci).trim)
      val rawVal = stripComment(t.substring(ci + 1).trim)
      if (rawVal.isEmpty) {
        // nested block: all following lines with deeper indentation
        var j = i + 1
        while (j < end && indentOf(ls(j)) > ind) j += 1
        out += key -> (if (j == i + 1) "" else parseBlock(ls, i + 1, j)._1)
        i = j
      } else {
        out += key -> unquote(rawVal)
        i += 1
      }
    }
    (out, i)
  }

  /** Drop a trailing ` # comment` — but never inside a quoted value.
    * For quoted values the comment starts after the closing quote
    * (`path: "a#b"  # note` → `"a#b"`).
    */
  private def stripComment(v: String): String =
    if (v.startsWith("\"") || v.startsWith("'")) {
      val close = v.indexOf(v.charAt(0), 1)
      if (close > 0) v.substring(0, close + 1) else v
    } else {
      val idx = v.indexOf(" #")
      (if (idx >= 0) v.substring(0, idx) else v).trim
    }

  private def unquote(v: String): String =
    if (v.length >= 2 &&
      ((v.head == '"' && v.last == '"') || (v.head == '\'' && v.last == '\'')))
      v.substring(1, v.length - 1)
    else v

  // ------------------------------------------------------------ accessors
  def str(m: Map[String, Any], key: String): Option[String] =
    m.get(key).collect { case s: String => s }

  def sub(m: Map[String, Any], key: String): Map[String, Any] =
    m.get(key).collect {
      case mm: Map[String, Any] @unchecked => mm
    }.getOrElse(Map.empty)
}
