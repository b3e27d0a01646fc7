package graft.jq

final class JqSyntaxError(msg: String, val pos: Int) extends RuntimeException(msg)

sealed trait Token extends Product with Serializable { def pos: Int }
object Token {
  final case class TNum(value: Double, asLong: Option[Long], pos: Int) extends Token
  /** String literal; interpolated exprs kept as raw source slices (parsed later). */
  final case class TStr(parts: List[Either[String, String]], pos: Int) extends Token
  final case class TIdent(name: String, pos: Int) extends Token
  final case class TVar(name: String, pos: Int) extends Token
  final case class TField(name: String, pos: Int) extends Token
  final case class TFormat(name: String, pos: Int) extends Token
  final case class TOp(op: String, pos: Int) extends Token
  final case class TEof(pos: Int) extends Token
}

/** Hand-written lexer for jq source. Handles nested string interpolation
  * (`"a\(.b | "c\(.d)")e"`) by tracking paren/quote depth and emitting the
  * interpolated expression as a raw source slice for recursive parsing. */
object Lexer {
  import Token._

  private val multiOps = List("?//", "//=", "|=", "//", "==", "!=", "<=", ">=", "+=", "-=", "*=", "/=", "%=", "..")
  private val singleOps = "|,()[]{}:;?=<>+-*/%."

  def tokenize(src: String): Vector[Token] = {
    val out = Vector.newBuilder[Token]
    var i = 0
    val n = src.length
    def isIdentStart(c: Char) = c.isLetter || c == '_'
    def isIdentPart(c: Char) = c.isLetterOrDigit || c == '_'

    while (i < n) {
      val c = src.charAt(i)
      if (c == ' ' || c == '\t' || c == '\n' || c == '\r') { i += 1 }
      else if (c == '#') { while (i < n && src.charAt(i) != '\n') i += 1 }
      else if (c == '"') {
        val (tok, next) = scanString(src, i)
        out += tok; i = next
      } else if (c.isDigit) {
        val start = i
        while (i < n && src.charAt(i).isDigit) i += 1
        if (i < n && src.charAt(i) == '.' && i + 1 < n && src.charAt(i + 1).isDigit) {
          i += 1; while (i < n && src.charAt(i).isDigit) i += 1
        }
        if (i < n && (src.charAt(i) == 'e' || src.charAt(i) == 'E')) {
          var j = i + 1
          if (j < n && (src.charAt(j) == '+' || src.charAt(j) == '-')) j += 1
          if (j < n && src.charAt(j).isDigit) { i = j; while (i < n && src.charAt(i).isDigit) i += 1 }
        }
        val raw = src.substring(start, i)
        val asLong = if (raw.forall(_.isDigit)) raw.toLongOption else None
        out += TNum(raw.toDouble, asLong, start)
      } else if (c == '$') {
        val start = i; i += 1
        if (i + 7 <= n && src.startsWith("__loc__", i)) { i += 7; out += TVar("__loc__", start) }
        else {
          if (i >= n || !isIdentStart(src.charAt(i))) throw new JqSyntaxError("expected variable name after '$'", start)
          val s = i; while (i < n && isIdentPart(src.charAt(i))) i += 1
          out += TVar(src.substring(s, i), start)
        }
      } else if (c == '@') {
        val start = i; i += 1
        val s = i; while (i < n && isIdentPart(src.charAt(i))) i += 1
        if (s == i) throw new JqSyntaxError("expected format name after '@'", start)
        out += TFormat(src.substring(s, i), start)
      } else if (c == '.' && i + 1 < n && isIdentStart(src.charAt(i + 1))) {
        val start = i; i += 1
        val s = i; while (i < n && isIdentPart(src.charAt(i))) i += 1
        out += TField(src.substring(s, i), start)
      } else if (isIdentStart(c)) {
        val start = i
        while (i < n && isIdentPart(src.charAt(i))) i += 1
        // module-qualified names (a::b) are not supported; plain idents only
        out += TIdent(src.substring(start, i), start)
      } else {
        multiOps.find(op => src.startsWith(op, i)) match {
          case Some(op) => out += TOp(op, i); i += op.length
          case None =>
            if (singleOps.indexOf(c) >= 0) { out += TOp(c.toString, i); i += 1 }
            else throw new JqSyntaxError(s"unexpected character '$c'", i)
        }
      }
    }
    out += TEof(n)
    out.result()
  }

  /** Scan a double-quoted string starting at `start` (src(start)=='"').
    * Returns the token and the index just past the closing quote. */
  private def scanString(src: String, start: Int): (TStr, Int) = {
    val n = src.length
    var i = start + 1
    val parts = List.newBuilder[Either[String, String]]
    val sb = new StringBuilder
    def flush(): Unit = if (sb.nonEmpty) { parts += Left(sb.toString); sb.clear() }
    var closed = false
    while (i < n && !closed) {
      src.charAt(i) match {
        case '"' => closed = true; i += 1
        case '\\' =>
          if (i + 1 >= n) throw new JqSyntaxError("unterminated escape", i)
          src.charAt(i + 1) match {
            case '"' => sb += '"'; i += 2
            case '\\' => sb += '\\'; i += 2
            case '/' => sb += '/'; i += 2
            case 'b' => sb += '\b'; i += 2
            case 'f' => sb += '\f'; i += 2
            case 'n' => sb += '\n'; i += 2
            case 'r' => sb += '\r'; i += 2
            case 't' => sb += '\t'; i += 2
            case 'u' =>
              if (i + 6 > n) throw new JqSyntaxError("bad \\u escape", i)
              sb += Integer.parseInt(src.substring(i + 2, i + 6), 16).toChar
              i += 6
            case '(' =>
              flush()
              val exprStart = i + 2
              val end = matchParen(src, exprStart)
              parts += Right(src.substring(exprStart, end))
              i = end + 1
            case other => throw new JqSyntaxError(s"invalid escape '\\$other'", i)
          }
        case ch => sb += ch; i += 1
      }
    }
    if (!closed) throw new JqSyntaxError("unterminated string literal", start)
    flush()
    (TStr(parts.result(), start), i)
  }

  /** Given index just after `\(`, return index of the matching `)`,
    * skipping nested parens and nested strings (with their own escapes /
    * interpolations). */
  private def matchParen(src: String, from: Int): Int = {
    val n = src.length
    var i = from
    var depth = 1
    while (i < n) {
      src.charAt(i) match {
        case '(' => depth += 1; i += 1
        case ')' => depth -= 1; if (depth == 0) return i; i += 1
        case '"' => i = skipString(src, i)
        case '#' => while (i < n && src.charAt(i) != '\n') i += 1
        case _ => i += 1
      }
    }
    throw new JqSyntaxError("unterminated string interpolation", from)
  }

  /** Skip a nested string starting at `i` (src(i)=='"'); return index past it. */
  private def skipString(src: String, at: Int): Int = {
    val n = src.length
    var i = at + 1
    while (i < n) {
      src.charAt(i) match {
        case '"' => return i + 1
        case '\\' =>
          if (i + 1 < n && src.charAt(i + 1) == '(') { i = matchParen(src, i + 2) + 1 }
          else i += 2
        case _ => i += 1
      }
    }
    throw new JqSyntaxError("unterminated string literal", at)
  }
}
