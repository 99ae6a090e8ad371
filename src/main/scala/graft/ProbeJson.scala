package graft

/** Locale-safe JSON emission for the Probe evidence mains (r13 ADVICE):
  * `f"$d%.3f"` formats with the JVM default locale — under a
  * comma-decimal locale the emitted PROBE_*.json would be invalid JSON —
  * and the old bare-number heuristic could emit unquoted non-numeric
  * strings like "1-2". Numbers go through Locale.ROOT; strings are
  * quoted (with escaping) unless they parse as a real JSON number. */
object ProbeJson {
  private def num(d: Double): String =
    if (d.isNaN || d.isInfinite) "\"" + d.toString + "\"" // JSON has no NaN
    else String.format(java.util.Locale.ROOT, "%.3f", Double.box(d))

  private def quote(s: String): String =
    "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  def js(v: Any): String = v match {
    case m: scala.collection.Map[_, _] =>
      m.map { case (k, x) => quote(k.toString) + ":" + js(x) }
        .mkString("{", ",", "}")
    case s: Seq[_] => s.map(js).mkString("[", ",", "]")
    case d: Double => num(d)
    case f: Float => num(f.toDouble)
    case n @ (_: Int | _: Long | _: Short | _: Byte | _: Boolean) => n.toString
    case x =>
      val s = x.toString
      // emit unquoted ONLY when the string is a STRICT JSON number (r14
      // ADVICE): parseDouble also accepts "1.", ".5", "+1", "01", hex and
      // type-suffixed forms — all invalid JSON that the old blacklist
      // let through
      if (jsonNumber.matches(s)) s else quote(s)
  }

  private val jsonNumber =
    """-?(0|[1-9]\d*)(\.\d+)?([eE][+-]?\d+)?""".r
}
