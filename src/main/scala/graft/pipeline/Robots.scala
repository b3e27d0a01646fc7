package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.{GraftShim => E}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** robots.txt parsing + evaluation (RFC 9309 / the Google REP spec) —
  * the politeness gate a crawl pipeline must apply BEFORE any fetch is
  * even counted: per-domain rule groups selected by user-agent token,
  * longest-match precedence between Allow and Disallow, `*` wildcards
  * and the `$` end anchor.
  *
  * Semantics implemented (the deterministic core of RFC 9309):
  *  - groups: consecutive `User-agent:` lines open a group (blank
  *    lines are INSIGNIFICANT per RFC 9309 §2.2 — UA lines merge into
  *    one group even across blanks); rules bind to it; a `User-agent:`
  *    after rules starts a NEW group; comments (`#`…) and unknown
  *    fields ignored; field names case-insensitive.
  *  - selection: ALL groups naming the crawler's token (exact,
  *    case-insensitive) merge; if none, the `*` groups merge; if none,
  *    everything is allowed (no applicable rules).
  *  - matching: rule paths anchor at the path START; `*` matches any
  *    span; a trailing `$` anchors the END. Empty rule paths are
  *    ignored (an empty Disallow historically means "allow all").
  *  - precedence: the matching rule with the LONGEST raw path wins;
  *    at equal length Allow wins; no matching rule = allowed.
  *
  * Scale shape: robots bodies are PER-DOMAIN rows (thousands), the URL
  * corpus is the big side — [[gate]] parses rules domain-side (small),
  * broadcasts them, and evaluates each URL with a single pure-map
  * expression: one broadcast join, zero corpus shuffles. */
object Robots {

  /** Parse `robotsTxt` and return the rules applicable to `userAgent`
    * as (allow, rawPath) pairs, document order. */
  def rulesFor(robotsTxt: String, userAgent: String): Seq[(Boolean, String)] = {
    if (robotsTxt == null) return Seq.empty
    val ua = userAgent.trim.toLowerCase
    // groups under construction: (ua tokens, rules)
    val groups = scala.collection.mutable.ArrayBuffer
      .empty[(scala.collection.mutable.ArrayBuffer[String],
              scala.collection.mutable.ArrayBuffer[(Boolean, String)])]
    var openUa = false // last meaningful line was a user-agent line
    robotsTxt.split("\r\n|\n|\r", -1).foreach { raw =>
      val line = raw.indexOf('#') match {
        case -1 => raw
        case h => raw.substring(0, h)
      }
      val colon = line.indexOf(':')
      if (colon > 0) {
        val field = line.substring(0, colon).trim.toLowerCase
        val value = line.substring(colon + 1).trim
        field match {
          case "user-agent" =>
            if (!openUa || groups.isEmpty) {
              groups += ((scala.collection.mutable.ArrayBuffer.empty[String],
                scala.collection.mutable.ArrayBuffer.empty[(Boolean, String)]))
              openUa = true
            }
            groups.last._1 += value.toLowerCase
          case "allow" | "disallow" =>
            openUa = false
            // rules before any user-agent line have no group: ignored
            if (groups.nonEmpty && value.nonEmpty)
              groups.last._2 += ((field == "allow", value))
            ()
          case _ => openUa = false // sitemap, crawl-delay, unknown: skip
        }
      }
    }
    val exact = groups.filter(_._1.contains(ua)).flatMap(_._2)
    if (exact.nonEmpty || groups.exists(_._1.contains(ua))) exact.toSeq
    else groups.filter(_._1.contains("*")).flatMap(_._2).toSeq
  }

  /** RFC 9309 rule-path match: anchored at the path start, `*` matches
    * any span, trailing `$` anchors the end. */
  def matches(path: String, rulePath: String): Boolean = {
    val anchored = rulePath.endsWith("$")
    val pat = if (anchored) rulePath.substring(0, rulePath.length - 1)
              else rulePath
    val parts = pat.split("\\*", -1)
    if (!path.startsWith(parts(0))) return false
    var pos = parts(0).length
    var i = 1
    while (i < parts.length) {
      val seg = parts(i)
      if (i == parts.length - 1 && anchored) {
        // final segment must close the path
        if (path.length - pos < seg.length || !path.endsWith(seg)) return false
        pos = path.length
      } else {
        val at = path.indexOf(seg, pos)
        if (at < 0) return false
        pos = at + seg.length
      }
      i += 1
    }
    if (anchored && parts.length == 1) pos == path.length else true
  }

  /** Longest-match verdict: (allowed, winning raw rule path or null). */
  def evaluate(rules: Seq[(Boolean, String)],
               path: String): (Boolean, String) = {
    var bestLen = -1
    var bestAllow = true
    var bestRule: String = null
    rules.foreach { case (allow, rp) =>
      if (matches(path, rp)) {
        val len = rp.length
        if (len > bestLen || (len == bestLen && allow && !bestAllow)) {
          bestLen = len; bestAllow = allow; bestRule = rp
        }
      }
    }
    if (bestLen < 0) (true, null) else (bestAllow, bestRule)
  }

  /** The distributed gate: URLs (big) against per-domain robots bodies
    * (small). Rules parse on the ROBOTS side ([[RobotsRules]], one row
    * per domain), broadcast, and each URL evaluates in a pure map
    * ([[RobotsEval]]) — one broadcast join, zero corpus shuffles.
    * Domains with no robots row (or no applicable group) default to
    * allowed with a null rule. Output: the input columns + `allowed,
    * rule`. */
  def gate(urls: DataFrame, domainCol: String, pathCol: String,
           robots: DataFrame, robotsDomainCol: String,
           robotsTxtCol: String, userAgent: String): DataFrame = {
    require(userAgent.trim.nonEmpty, "userAgent must be non-empty")
    val rules = robots.select(
      col(robotsDomainCol).as("__robots_domain"),
      E.column(RobotsRules(E.expression(col(robotsTxtCol)), userAgent))
        .as("__rules"))
    urls.join(broadcast(rules),
        urls(domainCol) === col("__robots_domain"), "left")
      .withColumn("__v",
        E.column(RobotsEval(E.expression(col(pathCol)),
          E.expression(col("__rules")))))
      .withColumn("allowed", coalesce(col("__v.allowed"), lit(true)))
      .withColumn("rule", col("__v.rule"))
      .drop("__robots_domain", "__rules", "__v")
  }
}

/** robots_rules(txt) → array<struct<allow boolean, rule string>> — the
  * [[Robots.rulesFor]] group selection for a CONSTANT user-agent token
  * as a scalar expression (runs on the small per-domain side). */
case class RobotsRules(child: Expression, userAgent: String)
    extends UnaryExpression with CodegenFallback {

  override def nullSafeEval(input: Any): Any = {
    val rules = Robots.rulesFor(input.asInstanceOf[UTF8String].toString,
      userAgent)
    new GenericArrayData(rules.map { case (a, p) =>
      InternalRow(a, UTF8String.fromString(p))
    }.toArray[Any])
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"robots_rules expects STRING, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("allow", BooleanType, nullable = false),
    StructField("rule", StringType, nullable = false))),
    containsNull = false)
  override protected def withNewChildInternal(newChild: Expression): RobotsRules =
    copy(child = newChild)
  override def prettyName: String = "robots_rules"
}

/** robots_eval(path, rules) → struct<allowed boolean, rule string> —
  * [[Robots.evaluate]] longest-match as a scalar expression (the
  * corpus-side pure map; null rules → null, the caller coalesces to
  * allowed). */
case class RobotsEval(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def nullSafeEval(pathIn: Any, rulesIn: Any): Any = {
    val path = pathIn.asInstanceOf[UTF8String].toString
    val arr = rulesIn.asInstanceOf[ArrayData]
    val rules = (0 until arr.numElements()).map { i =>
      val r = arr.getStruct(i, 2)
      (r.getBoolean(0), r.getUTF8String(1).toString)
    }
    val (allowed, rule) = Robots.evaluate(rules, path)
    InternalRow(allowed,
      if (rule == null) null else UTF8String.fromString(rule))
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, ArrayType(StructType(fs), _))
          if fs.length == 2 && fs(0).dataType == BooleanType &&
            fs(1).dataType == StringType =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"robots_eval expects (STRING, ARRAY<STRUCT<allow BOOLEAN, rule " +
          s"STRING>>), got (${l.catalogString}, ${r.catalogString})")
    }

  override def dataType: DataType = StructType(Seq(
    StructField("allowed", BooleanType, nullable = false),
    StructField("rule", StringType, nullable = true)))
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): RobotsEval =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "robots_eval"
}
