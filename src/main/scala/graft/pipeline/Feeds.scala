package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.{GraftShim => E}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** RSS 2.0 / Atom feed parsing — the third per-domain discovery
  * artifact after [[Robots]] and [[Sitemaps]]: feeds announce NEW
  * content with timestamps, which is how an incremental crawl finds
  * today's documents without re-walking the site. Same tolerant-scan
  * family as [[Sitemaps]] (shared entity decoding), plus the two
  * quirks real feeds force: CDATA-wrapped titles (`<![CDATA[…]]>`
  * passes through RAW, no entity decode inside — the two encodings of
  * the same title must converge) and Atom's attribute-valued links
  * (`<link href="…"/>` self-closing, with the sloppy text-content
  * form also accepted).
  *
  * Per item: `kind` (rss|atom), title, link, published (RSS `pubDate`;
  * Atom `published` else `updated`), guid (RSS `guid`; Atom `id`) —
  * all raw trimmed strings, entity-decoded outside CDATA. Torn/hostile
  * contract: complete `<item>`/`<entry>` elements only, junk before
  * the root disqualifies (decl/comment/BOM tolerated), hostile item
  * counts capped at 50 000. Never throws.
  *
  * Scale shape: feeds are per-DOMAIN rows; [[explode]] is a pure map +
  * generator — never a corpus shuffle. */
object Feeds {

  private val MaxItems = 50000

  final case class Item(kind: String, title: String, link: String,
                        published: String, guid: String)

  /** Locate `<tag>` / `<tag …>` / `<tag …/>` from `from` with a token
    * boundary: (openStart, contentStart, attrText, selfClosing);
    * openStart -1 when absent. */
  private def openTag(span: String, tag: String,
                      from: Int): (Int, Int, String, Boolean) = {
    var i = from
    while (i >= 0) {
      val a = span.indexOf("<" + tag, i)
      if (a < 0) return (-1, -1, null, false)
      val after = a + 1 + tag.length
      if (after < span.length && (span.charAt(after) == '>' ||
          span.charAt(after).isWhitespace || span.charAt(after) == '/')) {
        val gt = span.indexOf('>', after)
        if (gt < 0) return (-1, -1, null, false)
        val selfClosing = span.charAt(gt - 1) == '/'
        val attrEnd = if (selfClosing) gt - 1 else gt
        return (a, gt + 1,
          if (attrEnd > after) span.substring(after, attrEnd) else "",
          selfClosing)
      }
      i = a + 1
    }
    (-1, -1, null, false)
  }

  /** First `<tag>…</tag>` text inside `span`: CDATA passes through
    * raw, everything else entity-decodes; null when absent/unclosed. */
  private def childText(span: String, tag: String): String = {
    val (a, cs, _, self) = openTag(span, tag, 0)
    if (a < 0 || self) return null
    val e = span.indexOf("</" + tag + ">", cs)
    if (e < 0) return null
    val raw = span.substring(cs, e).trim
    if (raw.startsWith("<![CDATA[") && raw.endsWith("]]>"))
      raw.substring(9, raw.length - 3)
    else Sitemaps.decodeEntities(raw)
  }

  private def attrOf(attrs: String, name: String): String = {
    if (attrs == null) return null
    val re = (java.util.regex.Pattern.quote(name) +
      "\\s*=\\s*[\"']([^\"']*)[\"']").r
    re.findFirstMatchIn(attrs)
      .map(m => Sitemaps.decodeEntities(m.group(1))).orNull
  }

  /** The link: Atom's `href` attribute first, else element text. */
  private def linkOf(span: String): String = {
    val (a, cs, attrs, self) = openTag(span, "link", 0)
    if (a < 0) return null
    val href = attrOf(attrs, "href")
    if (href != null) href
    else if (self) null
    else {
      val e = span.indexOf("</link>", cs)
      if (e < 0) null else Sitemaps.decodeEntities(span.substring(cs, e).trim)
    }
  }

  /** Parse one feed body: items from `<rss>` (kind `rss`, `<item>`
    * elements) or an Atom `<feed>` (kind `atom`, `<entry>`). Empty on
    * anything else. */
  def items(xml: String): Seq[Item] = {
    if (xml == null) return Seq.empty
    val rss = xml.indexOf("<rss")
    val atom = xml.indexOf("<feed")
    val (kind, itemTag, rootAt) =
      if (rss >= 0 && (atom < 0 || rss < atom)) ("rss", "item", rss)
      else if (atom >= 0) ("atom", "entry", atom)
      else return Seq.empty
    val prefix = xml.substring(0, rootAt).replaceAll("(?s)<\\?.*?\\?>", "")
      .replaceAll("(?s)<!--.*?-->", "").replace("\uFEFF", "").trim
    if (prefix.nonEmpty) return Seq.empty
    val out = scala.collection.mutable.ArrayBuffer[Item]()
    val close = "</" + itemTag + ">"
    var cur = rootAt
    while (out.size < MaxItems && cur < xml.length) {
      val (a, cs, _, self) = openTag(xml, itemTag, cur)
      if (a < 0) cur = xml.length
      else if (self) cur = cs
      else {
        val e = xml.indexOf(close, cs)
        if (e < 0) cur = xml.length // torn: complete elements only
        else {
          val span = xml.substring(cs, e)
          val published =
            if (kind == "rss") childText(span, "pubDate")
            else {
              val p = childText(span, "published")
              if (p != null) p else childText(span, "updated")
            }
          out += Item(kind, childText(span, "title"), linkOf(span),
            published,
            if (kind == "rss") childText(span, "guid")
            else childText(span, "id"))
          cur = e + close.length
        }
      }
    }
    out.toSeq
  }

  /** Explode [[FeedItems]] over a feed-body column: one row per
    * complete item — non-feed bodies yield no rows. Pure map +
    * generator; stream-safe. */
  def explode(df: DataFrame, xmlCol: String): DataFrame =
    df.withColumn("__f",
        org.apache.spark.sql.functions.explode(
          E.column(FeedItems(E.expression(col(xmlCol))))))
      .select(df.columns.filterNot(_ == xmlCol).map(col).toSeq :+ col("__f.*"): _*)

  /** Per-doc feed bodies with id-derived items: RSS on even ids, Atom
    * on odd, `1 + id%3` items each; titles carry `A&B` — entity-escaped
    * on even (id+k), CDATA-wrapped on odd, and BOTH must decode to the
    * SAME string (the convergence gate); Atom links ride the href
    * attribute, RSS links element text. Plants: id%37==0 garbage (not
    * a feed → no rows), id%37==5 TORN inside the last item (the
    * complete `id%3` survive). */
  def synthesizeFeeds(docs: DataFrame, idCol: String): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col(idCol).cast("long")).as[Long].map { id =>
      val xml =
        if (id % 37 == 0)
          java.util.Base64.getEncoder.encodeToString(
            java.security.MessageDigest.getInstance("MD5")
              .digest(id.toString.getBytes("US-ASCII")))
        else {
          val rss = id % 2 == 0
          val sb = new StringBuilder("<?xml version=\"1.0\"?>\n")
          sb.append(if (rss) "<rss version=\"2.0\">\n<channel>\n"
                    else "<feed xmlns=\"http://www.w3.org/2005/Atom\">\n")
          (0L to id % 3).foreach { k =>
            val title =
              if ((id + k) % 2 == 0) s"Post $id/$k A&amp;B"
              else s"<![CDATA[Post $id/$k A&B]]>"
            val link = s"https://example.com/post/$id/$k"
            val date = f"2026-01-${1 + (id + k) % 28}%02dT00:00:00Z"
            val guid = s"tag:example.com:$id:$k"
            if (rss)
              sb.append(s"<item>\n<title>$title</title>\n<link>$link</link>\n" +
                s"<pubDate>$date</pubDate>\n<guid isPermaLink=\"false\">$guid</guid>\n</item>\n")
            else
              sb.append(s"<entry>\n<title type=\"text\">$title</title>\n" +
                s"""<link rel="alternate" href="$link"/>""" + "\n" +
                s"<published>$date</published>\n<id>$guid</id>\n</entry>\n")
          }
          sb.append(if (rss) "</channel>\n</rss>\n" else "</feed>\n")
          val full = sb.toString
          if (id % 37 == 5) {
            val tag = if (rss) "<item>" else "<entry>"
            full.substring(0, full.lastIndexOf(tag) + tag.length + 4)
          } else full
        }
      (id, xml)
    }.toDF("doc_id", "feed_xml")
  }
}

/** feed_items(string) → array<struct<kind, title, link, published,
  * guid>> — [[Feeds.items]] as a scalar expression: empty on non-feed
  * text, complete elements only. Pure map. */
case class FeedItems(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def nullSafeEval(input: Any): Any = {
    val es = Feeds.items(input.asInstanceOf[UTF8String].toString)
    def s(x: String) = if (x == null) null else UTF8String.fromString(x)
    new GenericArrayData(es.map { e =>
      InternalRow(UTF8String.fromString(e.kind), s(e.title), s(e.link),
        s(e.published), s(e.guid))
    }.toArray[Any])
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"feed_items expects STRING, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("kind", StringType, nullable = false),
    StructField("title", StringType, nullable = true),
    StructField("link", StringType, nullable = true),
    StructField("published", StringType, nullable = true),
    StructField("guid", StringType, nullable = true))),
    containsNull = false)
  override protected def withNewChildInternal(newChild: Expression): FeedItems =
    copy(child = newChild)
  override def prettyName: String = "feed_items"
}
