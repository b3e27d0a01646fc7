package graft.jq

import JqExpr._
import Token._

/** Recursive-descent parser for jq (precedence per the jq 1.6 manual:
  * `|` < `,` < `//` < assignment < `or` < `and` < comparison < `+ -`
  * < `* / %` < unary < postfix). */
object Parser {
  def parse(src: String): JqExpr = {
    val p = new Parser(Lexer.tokenize(src), src)
    val e = p.parsePipe()
    p.expectEof()
    e
  }

  private val keywords = Set(
    "as", "def", "if", "then", "elif", "else", "end", "reduce", "foreach",
    "try", "catch", "and", "or", "import", "include", "label", "break", "__loc__")
}

private final class Parser(tokens: Vector[Token], src: String) {
  private var pos = 0

  private def peek: Token = tokens(pos)
  private def advance(): Token = { val t = tokens(pos); pos += 1; t }
  private def fail(msg: String): Nothing = throw new JqSyntaxError(s"$msg (at token ${peek})", peek.pos)

  private def isOp(t: Token, op: String): Boolean = t match {
    case TOp(o, _) => o == op
    case _ => false
  }
  private def isKw(t: Token, kw: String): Boolean = t match {
    case TIdent(n, _) => n == kw
    case _ => false
  }
  private def eatOp(op: String): Unit =
    if (isOp(peek, op)) pos += 1 else fail(s"expected '$op'")
  private def eatKw(kw: String): Unit =
    if (isKw(peek, kw)) pos += 1 else fail(s"expected '$kw'")
  private def tryEatOp(op: String): Boolean =
    if (isOp(peek, op)) { pos += 1; true } else false

  def expectEof(): Unit = peek match {
    case TEof(_) => ()
    case t => throw new JqSyntaxError(s"unexpected trailing token $t", t.pos)
  }

  // ---- pipe level -------------------------------------------------------
  def parsePipe(): JqExpr = {
    if (isKw(peek, "def")) parseFuncDef()
    else {
      val left = parseComma()
      if (tryEatOp("|")) Pipe(left, parsePipe()) else left
    }
  }

  private def parseFuncDef(): JqExpr = {
    eatKw("def")
    val name = peek match {
      case TIdent(n, _) if !Parser.keywords(n) => advance(); n
      case _ => fail("expected function name")
    }
    var params = List.empty[String]
    var dollarParams = List.empty[String]
    if (tryEatOp("(")) {
      var done = false
      while (!done) {
        peek match {
          case TIdent(n, _) => advance(); params :+= n
          case TVar(n, _) => advance(); params :+= n; dollarParams :+= n
          case _ => fail("expected parameter")
        }
        if (!tryEatOp(";")) { eatOp(")"); done = true }
      }
    }
    eatOp(":")
    var body = parsePipe()
    // `def f($a): body` ≡ `def f(a): a as $a | body` (jq manual, “function definitions”)
    dollarParams.reverse.foreach { dp =>
      body = As(FuncCall(dp, Nil), List(Pattern.PVar(dp)), body)
    }
    eatOp(";")
    val rest = parsePipe()
    FuncDef(name, params, body, rest)
  }

  // ---- comma ------------------------------------------------------------
  private def parseComma(): JqExpr = {
    var e = parseAlt()
    while (tryEatOp(",")) e = Comma(e, parseAlt())
    e
  }

  // ---- alternative `//` (right-assoc) ----------------------------------
  private def parseAlt(): JqExpr = {
    val left = parseAssign()
    if (tryEatOp("//")) Alternative(left, parseAlt()) else left
  }

  // ---- assignment (non-assoc) ------------------------------------------
  private val assignOps = Set("=", "|=", "+=", "-=", "*=", "/=", "%=", "//=")
  private def parseAssign(): JqExpr = {
    val left = parseOr()
    peek match {
      case TOp(op, _) if assignOps(op) =>
        advance()
        Assign(op, left, parseOr())
      case _ => left
    }
  }

  // ---- or / and ---------------------------------------------------------
  private def parseOr(): JqExpr = {
    var e = parseAnd()
    while (isKw(peek, "or")) { advance(); e = BinOp("or", e, parseAnd()) }
    e
  }
  private def parseAnd(): JqExpr = {
    var e = parseCmp()
    while (isKw(peek, "and")) { advance(); e = BinOp("and", e, parseCmp()) }
    e
  }

  // ---- comparison (non-assoc) ------------------------------------------
  private val cmpOps = Set("==", "!=", "<", "<=", ">", ">=")
  private def parseCmp(): JqExpr = {
    val left = parseAdd()
    peek match {
      case TOp(op, _) if cmpOps(op) => advance(); BinOp(op, left, parseAdd())
      case _ => left
    }
  }

  // ---- arithmetic -------------------------------------------------------
  private def parseAdd(): JqExpr = {
    var e = parseMul()
    var looping = true
    while (looping) peek match {
      case TOp("+", _) => advance(); e = BinOp("+", e, parseMul())
      case TOp("-", _) => advance(); e = BinOp("-", e, parseMul())
      case _ => looping = false
    }
    e
  }
  private def parseMul(): JqExpr = {
    var e = parseUnary()
    var looping = true
    while (looping) peek match {
      case TOp("*", _) => advance(); e = BinOp("*", e, parseUnary())
      case TOp("/", _) if !isOp(peek, "//") => advance(); e = BinOp("/", e, parseUnary())
      case TOp("%", _) => advance(); e = BinOp("%", e, parseUnary())
      case _ => looping = false
    }
    e
  }

  private def parseUnary(): JqExpr =
    if (tryEatOp("-")) Neg(parsePostfix(allowAs = true)) else parsePostfix(allowAs = true)

  // ---- postfix chains ---------------------------------------------------
  private def parsePostfix(allowAs: Boolean): JqExpr = {
    var e = parsePrimary()
    var looping = true
    while (looping) {
      peek match {
        case TField(name, _) =>
          advance()
          e = Field(e, name, optional = false)
        case TOp(".", _) if tokens(pos + 1).isInstanceOf[TStr] =>
          advance()
          val TStr(parts, p) = advance(): @unchecked
          e = Field(e, literalString(parts, p), optional = false)
        case TOp("[", _) =>
          advance()
          e = parseBracketSuffix(e)
        case TOp("?", _) =>
          advance()
          e = TryCatch(e, None)
        case TIdent("as", _) if allowAs =>
          advance()
          var pats = List(parsePattern())
          while (tryEatOp("?//")) pats :+= parsePattern()
          eatOp("|")
          return As(e, pats, parsePipe())
        case _ => looping = false
      }
    }
    e
  }

  /** after consuming '[': `]` → iterate, `e]` → index, `a?:b?]` → slice */
  private def parseBracketSuffix(target: JqExpr): JqExpr = {
    if (tryEatOp("]")) IterateAll(target, optional = false)
    else if (tryEatOp(":")) { // [:to]
      val to = parsePipe(); eatOp("]")
      Slice(target, None, Some(to), optional = false)
    } else {
      val first = parsePipe()
      if (tryEatOp(":")) {
        if (tryEatOp("]")) Slice(target, Some(first), None, optional = false)
        else { val to = parsePipe(); eatOp("]"); Slice(target, Some(first), Some(to), optional = false) }
      } else { eatOp("]"); Index(target, first, optional = false) }
    }
  }

  private def literalString(parts: List[Either[String, String]], at: Int): String =
    parts match {
      case Nil => ""
      case List(Left(s)) => s
      case _ => throw new JqSyntaxError("interpolation not allowed here", at)
    }

  // ---- patterns ---------------------------------------------------------
  private def parsePattern(): Pattern = peek match {
    case TVar(n, _) => advance(); Pattern.PVar(n)
    case TOp("[", _) =>
      advance()
      val elems = List.newBuilder[Pattern]
      if (!tryEatOp("]")) {
        elems += parsePattern()
        while (tryEatOp(",")) elems += parsePattern()
        eatOp("]")
      }
      Pattern.PArray(elems.result())
    case TOp("{", _) =>
      advance()
      val entries = List.newBuilder[(JqExpr, Pattern)]
      var done = false
      while (!done) {
        peek match {
          case TVar(n, _) =>
            advance()
            entries += ((strLit(n), Pattern.PVar(n)))
          case TIdent(n, _) =>
            advance(); eatOp(":")
            entries += ((strLit(n), parsePattern()))
          case TStr(parts, _) =>
            advance(); eatOp(":")
            entries += ((strInterp(parts, None), parsePattern()))
          case TOp("(", _) =>
            advance(); val k = parsePipe(); eatOp(")"); eatOp(":")
            entries += ((k, parsePattern()))
          case _ => fail("expected object pattern entry")
        }
        if (!tryEatOp(",")) { eatOp("}"); done = true }
      }
      Pattern.PObject(entries.result())
    case _ => fail("expected pattern")
  }

  private def strLit(s: String): StrInterp = StrInterp(List(Left(s)), None)

  // ---- primary ----------------------------------------------------------
  private def parsePrimary(): JqExpr = peek match {
    case TNum(v, l, _) => advance(); NumLit(v, l)
    case TStr(parts, _) => advance(); strInterp(parts, None)
    case TFormat(name, _) =>
      advance()
      peek match {
        case TStr(parts, _) => advance(); strInterp(parts, Some(name))
        case _ => Format(name)
      }
    case TVar("__loc__", _) => advance(); FuncCall("$__loc__", Nil)
    case TVar(n, _) => advance(); VarRef(n)
    case TField(name, _) => advance(); Field(Identity, name, optional = false)
    case TOp("..", _) => advance(); RecurseDefault
    case TOp(".", _) =>
      advance()
      peek match {
        case TStr(parts, p) => advance(); Field(Identity, literalString(parts, p), optional = false)
        case _ => Identity
      }
    case TOp("(", _) =>
      advance(); val e = parsePipe(); eatOp(")"); e
    case TOp("[", _) =>
      advance()
      if (tryEatOp("]")) ArrayLit(None)
      else { val body = parsePipe(); eatOp("]"); ArrayLit(Some(body)) }
    case TOp("{", _) => advance(); parseObject()
    case TIdent("if", _) => parseIf()
    case TIdent("try", _) =>
      advance()
      val body = parsePostfix(allowAs = false)
      if (isKw(peek, "catch")) { advance(); TryCatch(body, Some(parsePostfix(allowAs = false))) }
      else TryCatch(body, None)
    case TIdent("reduce", _) =>
      advance()
      val srcE = parsePostfix(allowAs = false)
      eatKw("as"); val pat = parsePattern()
      eatOp("("); val init = parsePipe(); eatOp(";"); val update = parsePipe(); eatOp(")")
      Reduce(srcE, pat, init, update)
    case TIdent("foreach", _) =>
      advance()
      val srcE = parsePostfix(allowAs = false)
      eatKw("as"); val pat = parsePattern()
      eatOp("("); val init = parsePipe(); eatOp(";"); val update = parsePipe()
      val extract = if (tryEatOp(";")) Some(parsePipe()) else None
      eatOp(")")
      Foreach(srcE, pat, init, update, extract)
    case TIdent("def", _) => parseFuncDef()
    case TIdent("label", _) =>
      advance()
      val name = peek match {
        case TVar(n, _) => advance(); n
        case _ => fail("expected $label after 'label'")
      }
      eatOp("|")
      Label(name, parsePipe())
    case TIdent("break", _) =>
      advance()
      peek match {
        case TVar(n, _) => advance(); Break(n)
        case _ => fail("expected $label after 'break'")
      }
    case TIdent("true", _) => advance(); BoolLit(true)
    case TIdent("false", _) => advance(); BoolLit(false)
    case TIdent("null", _) => advance(); NullLit
    case TIdent(name, _) if !Parser.keywords(name) =>
      advance()
      if (tryEatOp("(")) {
        val args = List.newBuilder[JqExpr]
        args += parsePipe()
        while (tryEatOp(";")) args += parsePipe()
        eatOp(")")
        FuncCall(name, args.result())
      } else FuncCall(name, Nil)
    case t => fail(s"unexpected token")
  }

  private def strInterp(parts: List[Either[String, String]], fmt: Option[String]): StrInterp =
    StrInterp(parts.map {
      case Left(s) => Left(s)
      case Right(raw) => Right(Parser.parse(raw))
    }, fmt)

  private def parseIf(): JqExpr = {
    eatKw("if")
    val cond = parsePipe()
    eatKw("then")
    val thenB = parsePipe()
    val e = parseIfTail()
    If(cond, thenB, e)
  }
  private def parseIfTail(): Option[JqExpr] = peek match {
    case TIdent("elif", _) =>
      advance()
      val cond = parsePipe()
      eatKw("then")
      val thenB = parsePipe()
      Some(If(cond, thenB, parseIfTail()))
    case TIdent("else", _) =>
      advance(); val e = parsePipe(); eatKw("end"); Some(e)
    case TIdent("end", _) => advance(); None
    case _ => fail("expected 'elif', 'else' or 'end'")
  }

  // ---- objects ----------------------------------------------------------
  private def parseObject(): JqExpr = {
    val entries = List.newBuilder[(ObjKey, Option[JqExpr])]
    if (tryEatOp("}")) return ObjectLit(Nil)
    var done = false
    while (!done) {
      val key: ObjKey = peek match {
        case TIdent(n, _) => advance(); ObjKey.Fixed(n)
        case TVar(n, _) => advance(); ObjKey.Var(n)
        case TStr(parts, _) =>
          advance()
          val si = strInterp(parts, None)
          si.parts match {
            case List(Left(s)) => ObjKey.Fixed(s)
            case Nil => ObjKey.Fixed("")
            case _ => ObjKey.InterpKey(si)
          }
        case TOp("(", _) =>
          advance(); val e = parsePipe(); eatOp(")"); ObjKey.Computed(e)
        case TFormat(name, _) =>
          advance()
          peek match {
            case TStr(parts, _) => advance(); ObjKey.InterpKey(strInterp(parts, Some(name)))
            case _ => fail("expected string after format in object key")
          }
        case _ => fail("expected object key")
      }
      val value = if (tryEatOp(":")) Some(parseObjVal()) else None
      entries += ((key, value))
      if (!tryEatOp(",")) { eatOp("}"); done = true }
    }
    ObjectLit(entries.result())
  }

  /** object values: full precedence minus comma; pipes allowed (jq ExpD). */
  private def parseObjVal(): JqExpr = {
    val e = parseAlt()
    if (tryEatOp("|")) Pipe(e, parseObjVal()) else e
  }
}
