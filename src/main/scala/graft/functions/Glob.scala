package graft.functions

/** Hadoop-style glob → regex compiler.
  *
  * Re-expresses the reference's glob matching semantics (hadoop-tools'
  * `hh` expands `*`, `?`, `[abc]`, `[a-b]`, `[^a]`, `{a,b}` against the
  * HDFS namespace; reference checkout is empty — see SURVEY.md §0 — so
  * semantics follow the public Hadoop `GlobPattern` contract).
  *
  * The emitted regex is deliberately restricted to syntax shared by
  * Java regex (Spark `rlike`) and RE2 (DuckDB `regexp_matches`) so the
  * same string runs in both engines: `.` `.*` `[...]` `(a|b)` `^ $`.
  */
object Glob {
  /** Compile a glob to an anchored regex string. */
  def toRegex(glob: String): String = {
    val sb = new StringBuilder("^")
    var i = 0
    val n = glob.length
    var inClass = false
    var classStart = -1
    var braceDepth = 0
    while (i < n) {
      val c = glob.charAt(i)
      if (inClass) {
        c match {
          case ']' if i > classStart + 1 => sb.append(']'); inClass = false
          case '^' if i == classStart + 1 => sb.append('^')
          case '-' => sb.append('-')
          case '\\' => sb.append("\\\\")
          case other =>
            if ("[&".contains(other)) sb.append('\\')
            sb.append(other)
        }
      } else c match {
        case '*' => sb.append(".*")
        case '?' => sb.append('.')
        case '[' => inClass = true; classStart = i; sb.append('[')
        case '{' => braceDepth += 1; sb.append('(')
        case '}' if braceDepth > 0 => braceDepth -= 1; sb.append(')')
        case ',' if braceDepth > 0 => sb.append('|')
        case '\\' if i + 1 < n =>
          i += 1; val esc = glob.charAt(i)
          if ("\\^$.|?*+()[]{}".contains(esc)) sb.append('\\')
          sb.append(esc)
        case other =>
          if ("\\^$.|+()]}".contains(other)) sb.append('\\')
          sb.append(other)
      }
      i += 1
    }
    if (inClass) sb.append(']') // unterminated class: tolerate like Hadoop
    sb.append('$')
    sb.toString
  }

  /** Glob match via the compiled regex (used by tests and fs operators). */
  def matches(glob: String, s: String): Boolean = s.matches(toRegex(glob))
}
