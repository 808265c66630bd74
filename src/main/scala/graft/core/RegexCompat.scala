package graft.core

/** Python-`re` → Java-regex dialect bridge for the blueprint match
  * patterns (SURVEY §2A-O3 / §7 risk #1).
  *
  * The reference evaluates user patterns with Python `re.search`
  * (download_file.py:155-164); the engine evaluates them with Java
  * regex (`rlike`). The dialects agree on the common core (literals,
  * `.`, `*`, `+`, `?`, `{m,n}`, `[...]`, `(...)`, `|`, `^`, `$`, `\d
  * \w \s \b` and their negations, non-capturing `(?:`, lookarounds,
  * inline flags) — the translations below cover the Python-only
  * spellings a blueprint user could reasonably ship:
  *
  *  - `(?P<name>…)`  → `(?<name>…)`   (named group)
  *  - `(?P=name)`    → `\k<name>`     (named backreference)
  *  - `(?#comment)`  → removed        (Python comment group)
  *  - `\Z`           → `\z`           (Python \Z = absolute end; Java's
  *                                     \Z permits a final newline)
  *
  * Escaped forms (`\(?P<` etc.) and character-class contents are left
  * untouched. Java-only syntax (possessive quantifiers) passes through —
  * accepting a superset is safe; silently *mismatching* is not.
  */
object RegexCompat {

  def toJava(pattern: String): String = {
    val sb = new StringBuilder(pattern.length)
    var i = 0
    var inClass = false
    while (i < pattern.length) {
      val c = pattern.charAt(i)
      if (c == '\\' && i + 1 < pattern.length) {
        val n = pattern.charAt(i + 1)
        if (n == 'Z' && !inClass) sb.append("\\z")
        else { sb.append(c); sb.append(n) }
        i += 2
      } else if (inClass) {
        if (c == ']') inClass = false
        sb.append(c)
        i += 1
      } else if (c == '[') {
        inClass = true
        sb.append(c)
        i += 1
      } else if (c == '(' && pattern.startsWith("(?P<", i)) {
        sb.append("(?<")
        i += 4
      } else if (c == '(' && pattern.startsWith("(?P=", i)) {
        val end = pattern.indexOf(')', i)
        if (end < 0) { sb.append(c); i += 1 }
        else {
          sb.append("\\k<").append(pattern.substring(i + 4, end)).append('>')
          i = end + 1
        }
      } else if (c == '(' && pattern.startsWith("(?#", i)) {
        val end = pattern.indexOf(')', i)
        if (end < 0) { sb.append(c); i += 1 }
        else i = end + 1 // drop the comment group
      } else {
        sb.append(c)
        i += 1
      }
    }
    sb.toString
  }
}
