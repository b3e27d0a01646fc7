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

  private final class RGroup {
    val uas = scala.collection.mutable.ArrayBuffer.empty[String]
    val rules = scala.collection.mutable.ArrayBuffer.empty[(Boolean, String)]
    var delay: String = null // first Crawl-delay line wins within a group
  }

  /** The shared line walk: rule groups (with their crawl-delay) plus
    * the group-independent `Sitemap:` directives, document order. */
  private def parseGroups(robotsTxt: String): (Seq[RGroup], Seq[String]) = {
    val groups = scala.collection.mutable.ArrayBuffer.empty[RGroup]
    val sitemaps = scala.collection.mutable.ArrayBuffer.empty[String]
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
              groups += new RGroup
              openUa = true
            }
            groups.last.uas += value.toLowerCase
          case "allow" | "disallow" =>
            openUa = false
            // rules before any user-agent line have no group: ignored
            if (groups.nonEmpty && value.nonEmpty)
              groups.last.rules += ((field == "allow", value))
            ()
          case "crawl-delay" =>
            openUa = false
            if (groups.nonEmpty && groups.last.delay == null && value.nonEmpty)
              groups.last.delay = value
          case "sitemap" =>
            openUa = false
            // group-INDEPENDENT per the sitemaps protocol: collected
            // globally wherever the line sits
            if (value.nonEmpty) sitemaps += value
          case _ => openUa = false // unknown fields: skip
        }
      }
    }
    (groups.toSeq, sitemaps.toSeq)
  }

  /** Parse `robotsTxt` and return the rules applicable to `userAgent`
    * as (allow, rawPath) pairs, document order. */
  def rulesFor(robotsTxt: String, userAgent: String): Seq[(Boolean, String)] = {
    if (robotsTxt == null) return Seq.empty
    val ua = userAgent.trim.toLowerCase
    val (groups, _) = parseGroups(robotsTxt)
    val exact = groups.filter(_.uas.contains(ua)).flatMap(_.rules)
    if (exact.nonEmpty || groups.exists(_.uas.contains(ua))) exact.toSeq
    else groups.filter(_.uas.contains("*")).flatMap(_.rules).toSeq
  }

  /** Crawl-delay for the crawler — the de-facto politeness directive
    * (not in RFC 9309, honored by most non-Google crawlers): the same
    * group selection as [[rulesFor]] (exact-token groups, else `*`),
    * first delay among the selected groups, parsed as an EXACT decimal
    * (Yandex-style fractional seconds legal) into integer
    * MILLISECONDS; malformed or out-of-range (>1h) reads null, never a
    * guessed pace. */
  def crawlDelayMs(robotsTxt: String, userAgent: String): Integer = {
    if (robotsTxt == null) return null
    val ua = userAgent.trim.toLowerCase
    val (groups, _) = parseGroups(robotsTxt)
    val exactGroups = groups.filter(_.uas.contains(ua))
    val selected = if (exactGroups.nonEmpty) exactGroups
                   else groups.filter(_.uas.contains("*"))
    selected.iterator.map(_.delay).collectFirst { case d if d != null => d }
      .map(parseDelayMs).orNull
  }

  private def parseDelayMs(s: String): Integer = {
    val t = s.trim
    if (t.isEmpty || t.length > 12) return null
    val dot = t.indexOf('.')
    val (ip, fp) = if (dot < 0) (t, "") else (t.substring(0, dot), t.substring(dot + 1))
    if (ip.isEmpty && fp.isEmpty) return null
    if (!(ip.forall(_.isDigit) && fp.forall(_.isDigit))) return null
    if (fp.length > 3 && fp.drop(3).exists(_ != '0')) return null
    val ipv = if (ip.isEmpty) 0L else ip.toLong
    if (ipv > 3600L) return null // >1h is hostile, not politeness
    val f3 = (fp + "000").substring(0, 3)
    val v = ipv * 1000L + f3.toInt
    if (v > 3600000L) null else Integer.valueOf(v.toInt)
  }

  /** The `Sitemap:` directives — how a crawler DISCOVERS the frontier
    * seed [[Sitemaps]] then parses; group-independent, document
    * order, duplicates kept (the caller's dedup is a distinct). */
  def sitemapUrls(robotsTxt: String): Seq[String] = {
    if (robotsTxt == null) return Seq.empty
    parseGroups(robotsTxt)._2
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
object RobotsFixtures {
  import org.apache.spark.sql.functions.col

  /** Per-doc robots bodies exercising the directive surface: an
    * exact-token `graftbot` group on id%3==0 (delay `<id%5>.5` s), a
    * `*` group (delay `<id%7>` s), one or two `Sitemap:` lines.
    * Plants: id%37==0 junk text (no directives at all — delay null,
    * sitemaps empty), id%37==5 unparsable delay VALUES in both groups
    * (a malformed politeness number must read null, never a guessed
    * pace). */
  def synthesizeRobotsBodies(docs: DataFrame, idCol: String): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col(idCol).cast("long")).as[Long].map { id =>
      val txt =
        if (id % 37 == 0) s"deadbeef junk ${id} no directives here"
        else {
          val exactDelay = if (id % 37 == 5) "soon" else s"${id % 5}.5"
          val starDelay = if (id % 37 == 5) "whenever" else (id % 7).toString
          val exact =
            if (id % 3 == 0)
              s"User-agent: graftbot\nCrawl-delay: $exactDelay\nDisallow: /private\n\n"
            else ""
          val star = s"User-agent: *\nCrawl-delay: $starDelay\nAllow: /\n"
          val maps = s"Sitemap: https://example.com/sm_${id}_1.xml\n" +
            (if (id % 2 == 1) s"Sitemap: https://example.com/sm_${id}_2.xml\n"
             else "")
          s"# graft fixture\n$exact$star$maps"
        }
      (id, txt)
    }.toDF("doc_id", "robots_txt")
  }
}

/** robots_directives(txt) → struct<crawl_delay_ms, sitemaps> — the
  * scheduling half of the robots file: [[Robots.crawlDelayMs]] for the
  * configured crawler plus the group-independent `Sitemap:` discovery
  * list. Pure map over per-domain rows. */
case class RobotsDirectives(child: Expression, userAgent: String)
    extends UnaryExpression with CodegenFallback {

  override def nullSafeEval(input: Any): Any = {
    val txt = input.asInstanceOf[UTF8String].toString
    val d = Robots.crawlDelayMs(txt, userAgent)
    val sm = Robots.sitemapUrls(txt)
    InternalRow(if (d == null) null else d.intValue(),
      new GenericArrayData(sm.map(UTF8String.fromString).toArray[Any]))
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"robots_directives expects STRING, got ${other.catalogString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("crawl_delay_ms", IntegerType, nullable = true),
    StructField("sitemaps", ArrayType(StringType, containsNull = false),
      nullable = false)))
  override protected def withNewChildInternal(newChild: Expression): RobotsDirectives =
    copy(child = newChild)
  override def prettyName: String = "robots_directives"
}

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
