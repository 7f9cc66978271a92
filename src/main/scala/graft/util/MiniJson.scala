package graft.util

/** Minimal recursive-descent JSON parser (objects → Map[String, Any],
  * arrays → Vector[Any], strings, numbers → Double (or Long when
  * integral), true/false/null). Exists because the tokenizer.json /
  * control-plane surfaces need structured JSON and the dependency set
  * is frozen; not a general-purpose library — it is strict on what the
  * engine actually reads.
  */
object MiniJson {

  def parse(s: String): Any = {
    val p = new Parser(s)
    val v = p.value()
    p.skipWs()
    require(p.eof, s"trailing JSON content at offset ${p.pos}")
    v
  }

  def obj(v: Any): Map[String, Any] = v.asInstanceOf[Map[String, Any]]
  def arr(v: Any): Vector[Any] = v.asInstanceOf[Vector[Any]]
  def str(v: Any): String = v.asInstanceOf[String]
  def long(v: Any): Long = v match {
    case l: Long => l
    case d: Double => d.toLong
    case other => throw new IllegalArgumentException(s"not a number: $other")
  }

  private final class Parser(s: String) {
    var pos = 0
    def eof: Boolean = pos >= s.length

    def skipWs(): Unit =
      while (!eof && (s.charAt(pos) == ' ' || s.charAt(pos) == '\n' ||
        s.charAt(pos) == '\r' || s.charAt(pos) == '\t')) pos += 1

    private def expect(c: Char): Unit = {
      require(!eof && s.charAt(pos) == c,
        s"expected '$c' at offset $pos" +
          (if (eof) " (eof)" else s", got '${s.charAt(pos)}'"))
      pos += 1
    }

    def value(): Any = {
      skipWs()
      require(!eof, "unexpected end of JSON")
      s.charAt(pos) match {
        case '{' => obj()
        case '[' => array()
        case '"' => string()
        case 't' => literal("true", java.lang.Boolean.TRUE)
        case 'f' => literal("false", java.lang.Boolean.FALSE)
        case 'n' => literal("null", null)
        case _ => number()
      }
    }

    private def literal(lit: String, v: Any): Any = {
      require(s.regionMatches(pos, lit, 0, lit.length),
        s"invalid literal at offset $pos")
      pos += lit.length
      v
    }

    private def obj(): Map[String, Any] = {
      expect('{'); skipWs()
      if (!eof && s.charAt(pos) == '}') { pos += 1; return Map.empty }
      val b = Map.newBuilder[String, Any]
      var done = false
      while (!done) {
        skipWs()
        val k = string()
        skipWs(); expect(':')
        b += k -> value()
        skipWs()
        if (!eof && s.charAt(pos) == ',') pos += 1
        else { expect('}'); done = true }
      }
      b.result()
    }

    private def array(): Vector[Any] = {
      expect('['); skipWs()
      if (!eof && s.charAt(pos) == ']') { pos += 1; return Vector.empty }
      val b = Vector.newBuilder[Any]
      var done = false
      while (!done) {
        b += value()
        skipWs()
        if (!eof && s.charAt(pos) == ',') pos += 1
        else { expect(']'); done = true }
      }
      b.result()
    }

    private def string(): String = {
      expect('"')
      val sb = new StringBuilder
      while (!eof && s.charAt(pos) != '"') {
        val c = s.charAt(pos)
        if (c == '\\') {
          require(pos + 1 < s.length, "dangling escape")
          s.charAt(pos + 1) match {
            case '"' => sb.append('"'); pos += 2
            case '\\' => sb.append('\\'); pos += 2
            case '/' => sb.append('/'); pos += 2
            case 'n' => sb.append('\n'); pos += 2
            case 'r' => sb.append('\r'); pos += 2
            case 't' => sb.append('\t'); pos += 2
            case 'b' => sb.append('\b'); pos += 2
            case 'f' => sb.append('\f'); pos += 2
            case 'u' =>
              require(pos + 5 < s.length, "truncated \\u escape")
              sb.append(
                Integer.parseInt(s.substring(pos + 2, pos + 6), 16).toChar)
              pos += 6
            case other =>
              throw new IllegalArgumentException(s"bad escape \\$other")
          }
        } else { sb.append(c); pos += 1 }
      }
      expect('"')
      sb.toString
    }

    private def number(): Any = {
      val start = pos
      if (!eof && s.charAt(pos) == '-') pos += 1
      while (!eof && "0123456789.eE+-".indexOf(s.charAt(pos)) >= 0) pos += 1
      val raw = s.substring(start, pos)
      require(raw.nonEmpty, s"invalid number at offset $start")
      if (raw.forall(c => c.isDigit || c == '-') && raw != "-")
        raw.toLong
      else raw.toDouble
    }
  }
}
