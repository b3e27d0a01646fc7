package graft.jq

import JqExpr._

/** Compile-time singularity analysis.
  *
  * Most jq expressions yield exactly one output for one input (`.a.b`,
  * arithmetic, object construction, most builtins). Evaluating those
  * through the generic LazyList machinery costs ~20 synchronized lazy
  * cells per row for a typical construction program (measured 5 µs/row vs
  * 0.25 µs for the strict path). This pass wraps maximal always-singular
  * subtrees in `Strict(...)`; `Interp.evalOne` executes them by direct
  * recursion.
  *
  * Soundness: `singular(e)` must imply "exactly one output, for every
  * input, or a thrown JqError/JqBreak" — never zero (empty/select/try),
  * never multiple (comma/iterate/range). Anything uncertain — including
  * any call to a user-defined name — is conservatively non-singular.
  */
object StrictRewrite {

  def apply(root: JqExpr): JqExpr = {
    val userNames = collectDefinedNames(root, Set.empty)
    rewrite(root, userNames)
  }

  /** all `def` names + parameter names (params are callable as filters) */
  private def collectDefinedNames(e: JqExpr, acc: Set[String]): Set[String] = e match {
    case FuncDef(name, params, body, rest) =>
      val acc2 = acc + name ++ params
      collectDefinedNames(body, collectDefinedNames(rest, acc2))
    case other => children(other).foldLeft(acc)((a, c) => collectDefinedNames(c, a))
  }

  /** builtins that always yield exactly one output (args must additionally
    * be singular for those marked here with arity > 0, EXCEPT the
    * collectors — map/sort_by/… — which fold any arg multiplicity into a
    * single result). */
  private val singularBuiltins: Set[(String, Int)] = Set(
    // nullary value transforms
    "length", "utf8bytelength", "keys", "keys_unsorted", "tostring", "tonumber",
    "tojson", "fromjson", "type", "not", "add", "any", "all", "min", "max",
    "sort", "unique", "reverse", "flatten", "transpose", "to_entries",
    "from_entries", "explode", "implode", "ascii_downcase", "ascii_upcase",
    "first", "last", "gmtime", "localtime", "mktime", "todate", "fromdate",
    "date", "env", "input_line_number", "input_filename", "isnan",
    "isinfinite", "isnormal", "infinite", "nan",
    "floor", "ceil", "round", "sqrt", "fabs", "log", "log2", "log10", "exp",
    "exp2", "exp10", "trunc", "cbrt", "sin", "cos", "tan", "asin", "acos",
    "atan", "sinh", "cosh", "tanh", "nearbyint", "logb"
  ).map((_, 0)) ++ Set(
    // one output given singular args
    ("pow", 2), ("atan2", 2), ("has", 1), ("in", 1), ("contains", 1),
    ("inside", 1), ("join", 1), ("split", 1), ("split", 2), ("ltrimstr", 1),
    ("rtrimstr", 1), ("startswith", 1), ("endswith", 1), ("test", 1),
    ("test", 2), ("getpath", 1), ("setpath", 2), ("delpaths", 1),
    ("indices", 1), ("index", 1), ("rindex", 1), ("flatten", 1),
    ("strftime", 1), ("strptime", 1), ("sub", 2), ("gsub", 2),
    ("sub", 3), ("gsub", 3), ("IN", 1), ("INDEX", 2))

  /** one output regardless of argument multiplicity (they collect) */
  private val collectorBuiltins: Set[(String, Int)] = Set(
    ("map", 1), ("map_values", 1), ("sort_by", 1), ("group_by", 1),
    ("unique_by", 1), ("min_by", 1), ("max_by", 1), ("with_entries", 1),
    ("del", 1), ("INDEX", 1))

  private def patternSingular(p: Pattern): Boolean = p match {
    case Pattern.PVar(_) => true
    case Pattern.PArray(elems) => elems.forall(patternSingular)
    case Pattern.PObject(entries) =>
      entries.forall { case (k, sub) => singular(k, Set.empty) && patternSingular(sub) }
  }

  /** conservatively: does `e` always yield exactly one output? */
  private def singular(e: JqExpr, userNames: Set[String]): Boolean = e match {
    case Identity | NumLit(_, _) | BoolLit(_) | NullLit | VarRef(_) | Format(_) => true
    case Strict(_) => true
    case si: StrInterp => si.parts.forall {
      case Left(_) => true
      case Right(x) => singular(x, userNames)
    }
    case Field(t, _, _) => singular(t, userNames)
    case Index(t, i, _) => singular(t, userNames) && singular(i, userNames)
    case Slice(t, f, to, _) =>
      singular(t, userNames) && f.forall(singular(_, userNames)) && to.forall(singular(_, userNames))
    case ArrayLit(_) => true // collects its body stream
    case ObjectLit(entries) => entries.forall {
      case (key, value) =>
        (key match {
          case ObjKey.Computed(k) => singular(k, userNames)
          case ObjKey.InterpKey(s) => singular(s, userNames)
          case _ => true
        }) && value.forall(singular(_, userNames))
    }
    case Neg(x) => singular(x, userNames)
    case BinOp(_, l, r) => singular(l, userNames) && singular(r, userNames)
    case Alternative(l, r) => singular(l, userNames) && singular(r, userNames)
    case Pipe(l, r) => singular(l, userNames) && singular(r, userNames)
    case If(c, t, eOpt) => // missing else = identity → still one output
      singular(c, userNames) && singular(t, userNames) && eOpt.forall(singular(_, userNames))
    case As(src, List(pat), body) => // single pattern only (?// needs retry)
      singular(src, userNames) && patternSingular(pat) && singular(body, userNames)
    case Reduce(_, pat, init, update) =>
      patternSingular(pat) && singular(init, userNames) && singular(update, userNames)
    case Assign("|=", _, _) => true // first update output, or unchanged — always 1
    case Assign(_, _, value) => singular(value, userNames)
    case FuncCall(name, args) if !userNames(name) =>
      val key = (name, args.length)
      (singularBuiltins(key) && args.forall(singular(_, userNames))) ||
        collectorBuiltins(key)
    case _ => false
  }

  /** conservatively: does `e` always yield AT MOST one output (0 or 1)?
    * The 0-output sources are select/empty (and error truncation inside
    * try/`//`); everything composed of ≤1 parts by pipe/cartesian stays
    * ≤1. Soundness bar mirrors `singular`: when uncertain, false. */
  private def atMostOne(e: JqExpr, un: Set[String]): Boolean =
    singular(e, un) || (e match {
      case Semi(_) => true
      // !un guard: a user-redefined select/empty has arbitrary semantics
      // and cardinality — evalOpt's hardcoded cases must never see it
      case FuncCall("select", List(c)) => !un("select") && singular(c, un)
      case FuncCall("empty", Nil) => !un("empty")
      case Pipe(l, r) => atMostOne(l, un) && atMostOne(r, un)
      case If(c, t, eOpt) => // missing else = identity (1 output)
        singular(c, un) && atMostOne(t, un) && eOpt.forall(atMostOne(_, un))
      case TryCatch(b, h) => atMostOne(b, un) && h.forall(atMostOne(_, un))
      case Alternative(l, r) => atMostOne(l, un) && atMostOne(r, un)
      case Field(t, _, _) => atMostOne(t, un)
      case Index(t, i, _) => atMostOne(t, un) && singular(i, un)
      case Neg(x) => atMostOne(x, un)
      case BinOp(_, l, r) => atMostOne(l, un) && atMostOne(r, un)
      case _ => false
    })

  /** wrap maximal singular subtrees (Strict: exactly-1 lane); non-singular
    * but ≤1 subtrees get the Semi lane; recurse into stream children
    * otherwise */
  private def rewrite(e: JqExpr, un: Set[String]): JqExpr =
    if (singular(e, un)) Strict(rewriteInner(e, un))
    else if (atMostOne(e, un)) Semi(rewriteSemi(e, un))
    else mapChildren(e, rewrite(_, un))

  /** inside a Semi subtree: evalOpt recurses directly on the ≤1 structure;
    * exactly-1 fragments still get their Strict wrapper (evalOpt calls
    * evalOne for them) and anything else is rewritten normally. */
  private def rewriteSemi(e: JqExpr, un: Set[String]): JqExpr = e match {
    case _ if singular(e, un) => Strict(rewriteInner(e, un))
    case FuncCall("select", List(c)) => FuncCall("select", List(rewrite(c, un)))
    case Pipe(l, r) => Pipe(rewriteSemi(l, un), rewriteSemi(r, un))
    case If(c, t, eOpt) => If(rewrite(c, un), rewriteSemi(t, un), eOpt.map(rewriteSemi(_, un)))
    case TryCatch(b, h) => TryCatch(rewriteSemi(b, un), h.map(rewriteSemi(_, un)))
    case Alternative(l, r) => Alternative(rewriteSemi(l, un), rewriteSemi(r, un))
    case Field(t, n, o) => Field(rewriteSemi(t, un), n, o)
    case Index(t, i, o) => Index(rewriteSemi(t, un), rewrite(i, un), o)
    case Neg(x) => Neg(rewriteSemi(x, un))
    case BinOp(op, l, r) => BinOp(op, rewriteSemi(l, un), rewriteSemi(r, un))
    case other => mapChildren(other, rewrite(_, un))
  }

  /** inside a Strict subtree: leave strict children bare (evalOne recurses
    * directly) but still rewrite stream-evaluated children (array bodies,
    * builtin args, reduce sources) so they benefit too. */
  private def rewriteInner(e: JqExpr, un: Set[String]): JqExpr = e match {
    case ArrayLit(body) => ArrayLit(body.map(rewrite(_, un)))
    case Reduce(src, pat, init, update) =>
      Reduce(rewrite(src, un), pat, rewriteInner(init, un), rewriteInner(update, un))
    case FuncCall(name, args) => FuncCall(name, args.map(rewrite(_, un)))
    case Assign("|=", path, value) => Assign("|=", path, rewrite(value, un)) // value may be a stream
    case Assign(op, path, value) => Assign(op, path, rewriteInner(value, un))
    case other => mapChildren(other, rewriteInner(_, un))
  }

  // ---- generic tree plumbing -------------------------------------------

  private def children(e: JqExpr): Seq[JqExpr] = e match {
    case Field(t, _, _) => Seq(t)
    case Index(t, i, _) => Seq(t, i)
    case Slice(t, f, to, _) => Seq(t) ++ f ++ to
    case IterateAll(t, _) => Seq(t)
    case Pipe(l, r) => Seq(l, r)
    case Comma(l, r) => Seq(l, r)
    case si: StrInterp => si.parts.collect { case Right(x) => x }
    case ArrayLit(b) => b.toSeq
    case ObjectLit(entries) => entries.flatMap {
      case (key, v) =>
        (key match {
          case ObjKey.Computed(k) => Seq(k)
          case ObjKey.InterpKey(s) => Seq(s)
          case _ => Nil
        }) ++ v.toSeq
    }
    case Neg(x) => Seq(x)
    case BinOp(_, l, r) => Seq(l, r)
    case Alternative(l, r) => Seq(l, r)
    case Assign(_, p, v) => Seq(p, v)
    case As(s, _, b) => Seq(s, b)
    case If(c, t, e2) => Seq(c, t) ++ e2.toSeq
    case TryCatch(b, h) => Seq(b) ++ h.toSeq
    case FuncCall(_, args) => args
    case FuncDef(_, _, b, r) => Seq(b, r)
    case Reduce(s, _, i, u) => Seq(s, i, u)
    case Foreach(s, _, i, u, ex) => Seq(s, i, u) ++ ex.toSeq
    case Label(_, b) => Seq(b)
    case Strict(x) => Seq(x)
    case Semi(x) => Seq(x)
    case _ => Nil
  }

  private def mapChildren(e: JqExpr, f: JqExpr => JqExpr): JqExpr = e match {
    case Field(t, n, o) => Field(f(t), n, o)
    case Index(t, i, o) => Index(f(t), f(i), o)
    case Slice(t, fr, to, o) => Slice(f(t), fr.map(f), to.map(f), o)
    case IterateAll(t, o) => IterateAll(f(t), o)
    case Pipe(l, r) => Pipe(f(l), f(r))
    case Comma(l, r) => Comma(f(l), f(r))
    case StrInterp(parts, fmt) => StrInterp(parts.map(_.map(f)), fmt)
    case ArrayLit(b) => ArrayLit(b.map(f))
    case ObjectLit(entries) => ObjectLit(entries.map {
      case (key, v) =>
        val k2 = key match {
          case ObjKey.Computed(k) => ObjKey.Computed(f(k))
          case ObjKey.InterpKey(StrInterp(parts, fmt)) =>
            ObjKey.InterpKey(StrInterp(parts.map(_.map(f)), fmt))
          case other => other
        }
        (k2, v.map(f))
    })
    case Neg(x) => Neg(f(x))
    case BinOp(op, l, r) => BinOp(op, f(l), f(r))
    case Alternative(l, r) => Alternative(f(l), f(r))
    case Assign(op, p, v) => Assign(op, f(p), f(v))
    case As(s, pats, b) => As(f(s), pats, f(b))
    case If(c, t, e2) => If(f(c), f(t), e2.map(f))
    case TryCatch(b, h) => TryCatch(f(b), h.map(f))
    case FuncCall(n, args) => FuncCall(n, args.map(f))
    case FuncDef(n, p, b, r) => FuncDef(n, p, f(b), f(r))
    case Reduce(s, pat, i, u) => Reduce(f(s), pat, f(i), f(u))
    case Foreach(s, pat, i, u, ex) => Foreach(f(s), pat, f(i), f(u), ex.map(f))
    case Label(n, b) => Label(n, f(b))
    case Strict(x) => Strict(f(x))
    case Semi(x) => Semi(f(x))
    case leaf => leaf
  }
}
