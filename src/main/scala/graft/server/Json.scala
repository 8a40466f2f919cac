package graft.server

/** Minimal JSON codec for the forward-geocode request/response shapes —
  * the engine ships zero third-party dependencies, so the reference's
  * Pydantic layer (`app.py:14-38`) maps to ~100 lines of recursive
  * descent. Supports the full JSON grammar; numbers parse as Double.
  */
object Json {

  sealed trait Value {
    def asObj: Map[String, Value] = this.asInstanceOf[Obj].fields
    def asArr: Seq[Value] = this.asInstanceOf[Arr].items
    def asStr: String = this.asInstanceOf[Str].s
    def asNum: Double = this.asInstanceOf[Num].d
  }
  case class Obj(fields: Map[String, Value]) extends Value
  case class Arr(items: Seq[Value]) extends Value
  case class Str(s: String) extends Value
  case class Num(d: Double) extends Value
  case class Bool(b: Boolean) extends Value
  case object Null extends Value

  def parse(input: String): Value = {
    val p = new Parser(input)
    val v = p.value()
    p.skipWs()
    require(p.eof, s"trailing content at ${p.pos}")
    v
  }

  private final class Parser(s: String) {
    var pos = 0
    def eof: Boolean = pos >= s.length
    def skipWs(): Unit = while (!eof && s.charAt(pos).isWhitespace) pos += 1
    private def expect(c: Char): Unit = {
      skipWs()
      require(!eof && s.charAt(pos) == c, s"expected '$c' at $pos")
      pos += 1
    }
    def value(): Value = {
      skipWs()
      require(!eof, "unexpected end of input")
      s.charAt(pos) match {
        case '{' => obj()
        case '[' => arr()
        case '"' => Str(string())
        case 't' => lit("true", Bool(true))
        case 'f' => lit("false", Bool(false))
        case 'n' => lit("null", Null)
        case _ => number()
      }
    }
    private def lit(text: String, v: Value): Value = {
      require(s.regionMatches(pos, text, 0, text.length), s"bad literal at $pos")
      pos += text.length; v
    }
    private def obj(): Value = {
      expect('{'); skipWs()
      if (!eof && s.charAt(pos) == '}') { pos += 1; return Obj(Map.empty) }
      val b = Map.newBuilder[String, Value]
      var done = false
      while (!done) {
        skipWs()
        val k = string()
        expect(':')
        b += k -> value()
        skipWs()
        if (!eof && s.charAt(pos) == ',') pos += 1
        else { expect('}'); done = true }
      }
      Obj(b.result())
    }
    private def arr(): Value = {
      expect('['); skipWs()
      if (!eof && s.charAt(pos) == ']') { pos += 1; return Arr(Nil) }
      val b = Seq.newBuilder[Value]
      var done = false
      while (!done) {
        b += value()
        skipWs()
        if (!eof && s.charAt(pos) == ',') pos += 1
        else { expect(']'); done = true }
      }
      Arr(b.result())
    }
    private def string(): String = {
      expect('"')
      val sb = new StringBuilder
      while (s.charAt(pos) != '"') {
        val c = s.charAt(pos)
        if (c == '\\') {
          pos += 1
          s.charAt(pos) match {
            case '"' => sb += '"'
            case '\\' => sb += '\\'
            case '/' => sb += '/'
            case 'b' => sb += '\b'
            case 'f' => sb += '\f'
            case 'n' => sb += '\n'
            case 'r' => sb += '\r'
            case 't' => sb += '\t'
            case 'u' =>
              sb += Integer.parseInt(s.substring(pos + 1, pos + 5), 16).toChar
              pos += 4
            case other => throw new IllegalArgumentException(s"bad escape \\$other")
          }
        } else sb += c
        pos += 1
      }
      pos += 1
      sb.toString
    }
    private def number(): Value = {
      val start = pos
      while (!eof && "+-0123456789.eE".indexOf(s.charAt(pos)) >= 0) pos += 1
      Num(s.substring(start, pos).toDouble)
    }
  }

  /** Serialize with full control-char escaping. */
  def write(v: Value): String = v match {
    case Obj(f) => f.map { case (k, x) => s"${quote(k)}:${write(x)}" }.mkString("{", ",", "}")
    case Arr(items) => items.map(write).mkString("[", ",", "]")
    case Str(s) => quote(s)
    case Num(d) => if (d == d.toLong.toDouble && math.abs(d) < 1e15) d.toLong.toString else d.toString
    case Bool(b) => b.toString
    case Null => "null"
  }

  def quote(s: String): String = "\"" + s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}
