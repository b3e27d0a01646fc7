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

/** sitemap.xml parsing (the sitemaps.org protocol) — the FRONTIER-side
  * twin of [[Robots]]: robots.txt says where a crawler may not go,
  * the sitemap says where the site wants it to go. A crawl pipeline
  * reads both per domain: sitemap entries seed the fetch frontier,
  * the robots verdict gates them, lastmod/changefreq/priority drive
  * scheduling.
  *
  * Semantics (the deterministic core of the protocol):
  *  - `<urlset>` documents yield one entry per COMPLETE `<url>`
  *    element (kind `url`); `<sitemapindex>` documents yield one per
  *    complete `<sitemap>` element (kind `sitemap`) — the index is how
  *    sites shard past the 50 000-URL/50 MB per-file limits.
  *  - per element: `<loc>` required (an element without one is
  *    skipped), `<lastmod>` kept as its raw trimmed W3C-datetime
  *    string, `<changefreq>` as its token, `<priority>` parsed as an
  *    EXACT decimal into integer milli (0..1000 — no float on the
  *    readout path); out-of-range or malformed priority reads null.
  *  - XML entities in text values decode (`&amp; &lt; &gt; &quot;
  *    &apos;`, `&#n;`, `&#xn;`) — loc values are entity-escaped per
  *    protocol; an unknown entity stays literal (tolerant).
  *  - the protocol's 50 000-entry cap is ENFORCED: the walk stops
  *    there, so a hostile sitemap can't blow the row count.
  *
  * Torn/hostile contract (the [[graft.sources.Warc]] discipline):
  * never throws; not-a-sitemap bytes yield no entries; a torn tail
  * keeps exactly the complete elements that arrived. Tag matching is
  * case-sensitive lowercase (the protocol's own casing) but tolerates
  * attributes (`<urlset xmlns=…>`), comments, CDATA-free whitespace,
  * and a BOM/XML-declaration prefix.
  *
  * Scale shape: sitemaps are PER-DOMAIN rows (small); [[explode]] is a
  * pure map + generator — the frontier build never shuffles the
  * corpus, and the downstream robots gate stays broadcast. */
object Sitemaps {

  /** Protocol cap: a single sitemap file may carry at most 50 000
    * entries — enforced, not assumed. */
  private[pipeline] val MaxEntries = 50000

  final case class Entry(kind: String, loc: String, lastmod: String,
                         changefreq: String, priorityMilli: Integer)

  /** XML entity decode over element text (named 5 + numeric). */
  private[pipeline] def decodeEntities(s: String): String = {
    if (s == null || s.indexOf('&') < 0) return s
    val out = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        if (semi > i && semi - i <= 10) {
          val ent = s.substring(i + 1, semi)
          ent match {
            case "amp" => out.append('&'); i = semi + 1
            case "lt" => out.append('<'); i = semi + 1
            case "gt" => out.append('>'); i = semi + 1
            case "quot" => out.append('"'); i = semi + 1
            case "apos" => out.append('\''); i = semi + 1
            case _ if ent.length > 1 && ent.charAt(0) == '#' =>
              val hex = ent.length > 2 && (ent.charAt(1) == 'x' || ent.charAt(1) == 'X')
              val digits = if (hex) ent.substring(2) else ent.substring(1)
              val radix = if (hex) 16 else 10
              val ok = digits.nonEmpty && digits.forall(d =>
                Character.digit(d, radix) >= 0)
              if (ok) {
                try {
                  val cp = Integer.parseInt(digits, radix)
                  if (Character.isValidCodePoint(cp)) {
                    out.appendCodePoint(cp); i = semi + 1
                  } else { out.append('&'); i += 1 }
                } catch { case _: NumberFormatException => out.append('&'); i += 1 }
              } else { out.append('&'); i += 1 }
            case _ => out.append('&'); i += 1 // unknown entity: literal
          }
        } else { out.append('&'); i += 1 }
      } else { out.append(c); i += 1 }
    }
    out.toString
  }

  /** Exact-decimal priority → integer milli in [0, 1000]; null on
    * malformed or out-of-range (the protocol bounds). */
  private[pipeline] def priorityMilli(s: String): Integer = {
    if (s == null) return null
    val t = s.trim
    if (t.isEmpty || t.length > 8) return null
    val dot = t.indexOf('.')
    val (ip, fp) = if (dot < 0) (t, "") else (t.substring(0, dot), t.substring(dot + 1))
    if (ip.isEmpty && fp.isEmpty) return null
    if (!(ip.forall(_.isDigit) && fp.forall(_.isDigit))) return null
    if (fp.length > 3 && fp.drop(3).exists(_ != '0')) return null
    val ipv = if (ip.isEmpty) 0 else ip.toInt
    val f3 = (fp + "000").substring(0, 3)
    val v = ipv * 1000 + f3.toInt
    if (v > 1000) null else Integer.valueOf(v)
  }

  /** First `<tag>text</tag>` inside `span`, entity-decoded and trimmed;
    * null when absent or unclosed. */
  private def childText(span: String, tag: String): String = {
    val open = "<" + tag + ">"
    val i = span.indexOf(open)
    if (i < 0) return null
    val start = i + open.length
    val j = span.indexOf("</" + tag + ">", start)
    if (j < 0) return null
    decodeEntities(span.substring(start, j).trim)
  }

  /** Parse one sitemap body: entries from a `<urlset>` (kind `url`) or
    * `<sitemapindex>` (kind `sitemap`). Empty on anything else. */
  def entries(xml: String): Seq[Entry] = {
    if (xml == null) return Seq.empty
    // the root element decides the item tag; tolerate decl/comments/BOM
    val urlset = xml.indexOf("<urlset")
    val index = xml.indexOf("<sitemapindex")
    val (rootAt, itemTag) =
      if (urlset >= 0 && (index < 0 || urlset < index)) (urlset, "url")
      else if (index >= 0) (index, "sitemap")
      else return Seq.empty
    // nothing but decl/comment/whitespace may precede the root
    val prefix = xml.substring(0, rootAt)
    val cleaned = prefix.replaceAll("(?s)<\\?.*?\\?>", "")
      .replaceAll("(?s)<!--.*?-->", "").replace("\uFEFF", "").trim
    if (cleaned.nonEmpty) return Seq.empty
    val out = scala.collection.mutable.ArrayBuffer[Entry]()
    val openA = "<" + itemTag + ">"
    val openB = "<" + itemTag + " "
    val close = "</" + itemTag + ">"
    var cur = rootAt
    while (out.size < MaxEntries && cur < xml.length) {
      val a = xml.indexOf(openA, cur)
      val b = xml.indexOf(openB, cur)
      val open = if (a < 0) b else if (b < 0) a else math.min(a, b)
      if (open < 0) cur = xml.length
      else {
        val bodyAt = xml.indexOf('>', open)
        val end = if (bodyAt < 0) -1 else xml.indexOf(close, bodyAt + 1)
        if (end < 0) cur = xml.length // torn: complete elements only
        else {
          val span = xml.substring(bodyAt + 1, end)
          val loc = childText(span, "loc")
          if (loc != null && loc.nonEmpty)
            out += Entry(itemTag, loc, childText(span, "lastmod"),
              childText(span, "changefreq"),
              priorityMilli(childText(span, "priority")))
          cur = end + close.length
        }
      }
    }
    out.toSeq
  }

  /** Explode [[SitemapEntries]] over a sitemap-body column: one row per
    * complete entry — non-sitemap bodies yield no rows. Pure map +
    * generator; stream-safe. */
  def explode(df: DataFrame, xmlCol: String): DataFrame =
    df.withColumn("__s",
        org.apache.spark.sql.functions.explode(
          E.column(SitemapEntries(E.expression(col(xmlCol))))))
      .select(df.columns.filterNot(_ == xmlCol).map(col).toSeq :+ col("__s.*"): _*)

  /** Deterministic sitemap XML (the exporter twin): `entries` as
    * (loc, lastmod, changefreq, priority) — null fields omitted. */
  def build(entries: Seq[(String, String, String, String)],
            index: Boolean = false): String = {
    val itemTag = if (index) "sitemap" else "url"
    val root = if (index) "sitemapindex" else "urlset"
    def esc(s: String): String = s.replace("&", "&amp;").replace("<", "&lt;")
      .replace(">", "&gt;")
    val sb = new java.lang.StringBuilder()
    sb.append("<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n")
    sb.append(s"""<$root xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n""")
    entries.foreach { case (loc, lastmod, changefreq, priority) =>
      sb.append(s"  <$itemTag>\n    <loc>${esc(loc)}</loc>\n")
      if (lastmod != null) sb.append(s"    <lastmod>$lastmod</lastmod>\n")
      if (changefreq != null) sb.append(s"    <changefreq>$changefreq</changefreq>\n")
      if (priority != null) sb.append(s"    <priority>$priority</priority>\n")
      sb.append(s"  </$itemTag>\n")
    }
    sb.append(s"</$root>\n")
    sb.toString
  }

  /** Per-doc sitemap bodies with id-derived entries over the documents
    * table (the fixture convention): every non-plant id carries a
    * `<urlset>` of `1 + id%3` URLs `https://example.com/page/<id>/<k>
    * ?k=<k>&v=<id>` (the `&` entity-escaped in XML — decode gated),
    * lastmod `2026-01-<dd>`, changefreq cycling daily/weekly/monthly,
    * priority `(id+k)%11 / 10`. Plants: id%37==0 md5-garbage text (not
    * a sitemap → no rows), id%37==5 TORN inside the LAST url element
    * (the complete `id%3` survive), id%37==11 a `<sitemapindex>` of two
    * shard entries (kind `sitemap`). */
  def synthesizeSitemaps(docs: DataFrame, idCol: String): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col(idCol).cast("long")).as[Long].map { id =>
      val xml =
        if (id % 37 == 0)
          java.util.Base64.getEncoder.encodeToString(
            java.security.MessageDigest.getInstance("MD5")
              .digest(id.toString.getBytes("US-ASCII")))
        else if (id % 37 == 11)
          build(Seq(
            (s"https://example.com/sitemap_${id}_a.xml", "2026-01-01", null, null),
            (s"https://example.com/sitemap_${id}_b.xml", "2026-01-02", null, null)),
            index = true)
        else {
          val freqs = Seq("daily", "weekly", "monthly")
          val es = (0L to id % 3).map { k =>
            (s"https://example.com/page/$id/$k?k=$k&v=$id",
              f"2026-01-${1 + (id + k) % 28}%02d",
              freqs(((id + k) % 3).toInt),
              s"0.${(id + k) % 11}".replace("0.10", "1.0"))
          }
          val full = build(es)
          if (id % 37 == 5) {
            val cut = full.lastIndexOf("<url>") + 8
            full.substring(0, cut)
          } else full
        }
      (id, xml)
    }.toDF("doc_id", "sitemap_xml")
  }
}

/** sitemap_entries(string) → array<struct<kind, loc, lastmod,
  * changefreq, priority_milli>> — [[Sitemaps.entries]] as a scalar
  * expression: empty array on non-sitemap text, complete elements
  * only. Pure map. */
case class SitemapEntries(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def nullSafeEval(input: Any): Any = {
    val es = Sitemaps.entries(input.asInstanceOf[UTF8String].toString)
    new GenericArrayData(es.map { e =>
      InternalRow(UTF8String.fromString(e.kind), UTF8String.fromString(e.loc),
        if (e.lastmod == null) null else UTF8String.fromString(e.lastmod),
        if (e.changefreq == null) null else UTF8String.fromString(e.changefreq),
        if (e.priorityMilli == null) null else e.priorityMilli.intValue())
    }.toArray[Any])
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"sitemap_entries expects STRING, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("kind", StringType, nullable = false),
    StructField("loc", StringType, nullable = false),
    StructField("lastmod", StringType, nullable = true),
    StructField("changefreq", StringType, nullable = true),
    StructField("priority_milli", IntegerType, nullable = true))),
    containsNull = false)
  override protected def withNewChildInternal(newChild: Expression): SitemapEntries =
    copy(child = newChild)
  override def prettyName: String = "sitemap_entries"
}
