package graft

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graftshim.{GraftShim => ExpressionUtils}
import org.apache.spark.sql.types.StringType

import graft.operators.{JqExtractAll, JqString, JsonQueryGenerator}

/** SQL surface registration.
  *
  * `Graft.register(spark)` installs the functions into an existing session;
  * `GraftExtensions` does the same via `spark.sql.extensions` config, the
  * idiomatic deployment on a shared cluster.
  *
  * SQL usage mirrors the reference README one-to-one:
  *   SELECT jq(json, '.items[]', 'name:string', 'qty:int') FROM t
  *   SELECT r.region, tz.* FROM regions r
  *     LATERAL VIEW jq(r.timezones, '.[]', 'name:string', 'offset:int') tz
  */
object Graft {

  /** JQ / TYPE arguments must be constant strings, as in the reference
    * (JsonQueryUDTF.java:136-143). */
  private def constString(e: Expression, name: String): String =
    if (e.foldable && e.dataType == StringType) {
      val v = e.eval()
      if (v == null) throw new IllegalArgumentException(s"$name must not be NULL.")
      v.toString
    } else throw new IllegalArgumentException(s"$name must be a constant string.")

  /** fail at analysis time on bad programs, like the reference's
    * initialize-time JsonQueryException (JsonQueryUDTF.java:53-56) */
  private def validated(program: String): String = {
    try graft.jq.Jq.compileCached(program)
    catch {
      case e: graft.jq.JqSyntaxError =>
        throw new IllegalArgumentException(s"JQ is invalid: ${e.getMessage}")
    }
    program
  }

  private[graft] def jqBuilder(args: Seq[Expression]): Expression = {
    if (args.length < 3)
      throw new IllegalArgumentException("jq() takes at least three arguments.")
    JsonQueryGenerator(
      args.head,
      validated(constString(args(1), "JQ")),
      args.drop(2).zipWithIndex.map { case (a, i) => constString(a, s"TYPE or NAME:TYPE (arg ${i + 3})") })
  }

  private[graft] def jqStringBuilder(args: Seq[Expression]): Expression = {
    if (args.length != 2)
      throw new IllegalArgumentException("jq_string() takes exactly two arguments.")
    JqString(args.head, validated(constString(args(1), "JQ")))
  }

  private[graft] def jqExtractAllBuilder(args: Seq[Expression]): Expression = {
    if (args.length != 2)
      throw new IllegalArgumentException("jq_extract_all() takes exactly two arguments.")
    JqExtractAll(args.head, validated(constString(args(1), "JQ")))
  }

  private[graft] def unicodeNormalizeBuilder(args: Seq[Expression]): Expression = {
    if (args.length != 2)
      throw new IllegalArgumentException("unicode_normalize() takes exactly two arguments.")
    graft.functions.UnicodeNormalize(args.head, constString(args(1), "FORM"))
  }

  private[graft] def compressionRatioBuilder(args: Seq[Expression]): Expression = {
    if (args.length != 1)
      throw new IllegalArgumentException("compression_ratio_ppm() takes exactly one argument.")
    graft.functions.CompressionRatioPpm(args.head)
  }

  private[graft] def phraseOccurrencesBuilder(args: Seq[Expression]): Expression = {
    if (args.length != 2)
      throw new IllegalArgumentException("phrase_occurrences() takes exactly two arguments.")
    val phrase = constString(args(1), "PHRASE").trim.split("\\s+").toSeq.filter(_.nonEmpty)
    if (phrase.isEmpty)
      throw new IllegalArgumentException("PHRASE must contain at least one token.")
    graft.functions.PhraseOccurrences(args.head, phrase)
  }

  private[graft] def stripMarkupBuilder(args: Seq[Expression]): Expression = {
    if (args.length != 1)
      throw new IllegalArgumentException("strip_markup() takes exactly one argument.")
    // assembles the SAME pattern/entity tables as the Column API
    // (TextAnalysis.markupPatterns/markupEntities — one source of truth
    // for the chain), but as an already-resolved catalyst tree: routing
    // the Column composition through the shim leaves an unresolved
    // ColumnNodeExpression inside the registry path, which survives
    // analysis and then fails whole-stage codegen at runtime
    import org.apache.spark.sql.catalyst.expressions.{Literal, RegExpReplace, StringReplace, StringTrim}
    val noTags = graft.pipeline.TextAnalysis.markupPatterns.foldLeft(args.head) {
      case (c, (pat, repl)) => RegExpReplace(c, Literal(pat), Literal(repl))
    }
    val decoded = graft.pipeline.TextAnalysis.markupEntities.foldLeft(noTags) {
      case (c, (ent, v)) => StringReplace(c, Literal(ent), Literal(v))
    }
    StringTrim(RegExpReplace(decoded, Literal("[ \\t\\n\\r\\f]+"), Literal(" ")))
  }

  private[graft] def snippetAroundBuilder(args: Seq[Expression]): Expression = {
    if (args.length != 3)
      throw new IllegalArgumentException("snippet_around() takes exactly three arguments.")
    val terms = constString(args(1), "TERMS").trim.split("\\s+").toSeq.filter(_.nonEmpty)
    if (terms.isEmpty)
      throw new IllegalArgumentException("TERMS must contain at least one token.")
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    val window = args(2) match {
      case e if e.foldable &&
        Seq(ByteType, ShortType, IntegerType, LongType).contains(e.dataType) =>
        e.eval() match {
          case null => throw new IllegalArgumentException(
            "WINDOW must be a non-null constant integer.")
          case v =>
            val l = v.asInstanceOf[Number].longValue
            if (l < 0 || l > Int.MaxValue) throw new IllegalArgumentException(
              s"WINDOW must be in [0, ${Int.MaxValue}], got $l")
            l.toInt
        }
      case _ => throw new IllegalArgumentException("WINDOW must be a constant integer.")
    }
    graft.functions.SnippetAround(args.head, terms, window)
  }

  private[graft] val all: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("jq", "_FUNC_(JSON, 'JQ', 'TYPE'), _FUNC_(JSON, 'JQ', 'F1:T1', ..., 'FN:TN') - jq for Spark", jqBuilder),
    ("jq_string", "_FUNC_(JSON, 'JQ') - first jq output as string", jqStringBuilder),
    ("jq_extract_all", "_FUNC_(JSON, 'JQ') - all jq outputs as array<string>", jqExtractAllBuilder),
    ("unicode_normalize", "_FUNC_(TEXT, 'NFC'|'NFD'|'NFKC'|'NFKD') - Unicode normalization", unicodeNormalizeBuilder),
    ("compression_ratio_ppm", "_FUNC_(TEXT) - deflate bytes over raw bytes, ppm", compressionRatioBuilder),
    ("phrase_occurrences", "_FUNC_(TEXT, 'w1 w2 ...') - consecutive-token phrase count", phraseOccurrencesBuilder),
    ("snippet_around", "_FUNC_(TEXT, 'terms ...', WINDOW) - context around the first query-term hit", snippetAroundBuilder),
    ("strip_markup", "_FUNC_(TEXT) - markup tags/entities removed, whitespace collapsed", stripMarkupBuilder))

  /** Sessions already registered — weak keys so dropped sessions don't pin. */
  private val registeredSessions =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean]())

  /** Idempotent per session, tracked with a session-scoped flag rather than
    * by probing the registry for same-named functions: a name-existence
    * probe would let any pre-existing user temp function named e.g. `jq`
    * silently shadow the graft builtins, whereas registering
    * deterministically on the session's first register() call matches the
    * reference's behavior (its UDTF registration always binds the name).
    * Subsequent calls are no-ops — no per-call "function replaced" log spam
    * from preambles that call register per query (e.g. the bench loop). */
  def register(spark: SparkSession): Unit =
    if (registeredSessions.put(spark, java.lang.Boolean.TRUE) == null) {
      val registry = spark.sessionState.functionRegistry
      all.foreach { case (name, _, builder) =>
        registry.createOrReplaceTempFunction(name, builder, "built-in")
      }
    }

  // ---- Column API (Scala-first surface) --------------------------------

  /** jq(col, program, types*) — generator Column; explodes to 0..N rows per
    * input row with the declared schema. */
  def jq(json: Column, program: String, types: String*): Column =
    ExpressionUtils.column(JsonQueryGenerator(
      ExpressionUtils.expression(json), program, types))

  def jqString(json: Column, program: String): Column =
    ExpressionUtils.column(JqString(ExpressionUtils.expression(json), program))

  def jqExtractAll(json: Column, program: String): Column =
    ExpressionUtils.column(JqExtractAll(ExpressionUtils.expression(json), program))

}

/** `--conf spark.sql.extensions=graft.GraftExtensions` — injects the SAME
  * function surface as [[Graft.register]] (jq trio + the text scalars), so
  * a cluster deployed via `spark.sql.extensions` and a notebook calling
  * `register` see one SQL surface. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  def apply(e: SparkSessionExtensions): Unit = {
    Graft.all.foreach { case (name, _, builder) =>
      e.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft", name), builder))
    }
    // opt-in cartesian guardrail (spark.graft.failOnCartesian) — see
    // CartesianGuard scaladoc; a no-op single conf read when disabled
    e.injectOptimizerRule(_ => graft.plans.CartesianGuard)
  }
}
