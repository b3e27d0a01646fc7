package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

class SitemapsSpec extends AnyFunSuite {

  test("urlset round-trip: loc/lastmod/changefreq/priority incl. entity decode") {
    val xml = Sitemaps.build(Seq(
      ("https://example.com/a?x=1&y=2", "2026-01-05", "daily", "0.8"),
      ("https://example.com/b", null, null, null)))
    assert(xml.contains("&amp;")) // the builder escaped it
    val es = Sitemaps.entries(xml)
    assert(es.size == 2)
    assert(es(0) == Sitemaps.Entry("url", "https://example.com/a?x=1&y=2",
      "2026-01-05", "daily", 800))
    assert(es(1) == Sitemaps.Entry("url", "https://example.com/b",
      null, null, null))
  }

  test("sitemapindex yields kind=sitemap entries") {
    val xml = Sitemaps.build(Seq(
      ("https://example.com/s1.xml", "2026-01-01", null, null),
      ("https://example.com/s2.xml", null, null, null)), index = true)
    val es = Sitemaps.entries(xml)
    assert(es.map(_.kind).distinct == Seq("sitemap"))
    assert(es.map(_.loc) == Seq("https://example.com/s1.xml",
      "https://example.com/s2.xml"))
  }

  test("priority parses as exact decimal milli, protocol bounds loud-by-null") {
    assert(Sitemaps.priorityMilli("0.5") == 500)
    assert(Sitemaps.priorityMilli("1.0") == 1000)
    assert(Sitemaps.priorityMilli("1") == 1000)
    assert(Sitemaps.priorityMilli("0") == 0)
    assert(Sitemaps.priorityMilli(".25") == 250)
    assert(Sitemaps.priorityMilli("0.125") == 125)
    assert(Sitemaps.priorityMilli("0.1250") == 125)
    assert(Sitemaps.priorityMilli("1.001") == null) // out of range
    assert(Sitemaps.priorityMilli("2") == null)
    assert(Sitemaps.priorityMilli("0.1251") == null) // sub-milli precision
    assert(Sitemaps.priorityMilli("-0.5") == null)
    assert(Sitemaps.priorityMilli("abc") == null)
    assert(Sitemaps.priorityMilli("") == null)
    assert(Sitemaps.priorityMilli(".") == null)
  }

  test("entity decode: named, numeric, hex, unknown stays literal") {
    assert(Sitemaps.decodeEntities("a&amp;b&lt;c&gt;d&quot;e&apos;f")
      == "a&b<c>d\"e'f")
    assert(Sitemaps.decodeEntities("x&#65;y&#x42;z") == "xAyBz")
    assert(Sitemaps.decodeEntities("u&bogus;v") == "u&bogus;v")
    assert(Sitemaps.decodeEntities("dangling&") == "dangling&")
    assert(Sitemaps.decodeEntities("&#xZZ;") == "&#xZZ;")
  }

  test("torn tail keeps exactly the complete elements") {
    val xml = Sitemaps.build(Seq(
      ("https://e.com/1", null, null, null),
      ("https://e.com/2", null, null, null),
      ("https://e.com/3", null, null, null)))
    val fullCount = Sitemaps.entries(xml).size
    assert(fullCount == 3)
    var step = 0
    var lastN = -1
    while (step < xml.length) {
      val n = Sitemaps.entries(xml.substring(0, step)).size
      assert(n <= 3)
      // counts can only make sense as complete-prefix counts
      assert(n >= 0 && n >= lastN - 3)
      lastN = n
      step += 5
    }
    // cut inside the LAST element: first two survive
    val cut = xml.lastIndexOf("<url>") + 8
    assert(Sitemaps.entries(xml.substring(0, cut)).map(_.loc)
      == Seq("https://e.com/1", "https://e.com/2"))
  }

  test("garbage / non-sitemap / leading-junk read as no entries") {
    assert(Sitemaps.entries(null).isEmpty)
    assert(Sitemaps.entries("").isEmpty)
    assert(Sitemaps.entries("<html><body>hi</body></html>").isEmpty)
    assert(Sitemaps.entries("random text").isEmpty)
    // junk BEFORE the root disqualifies (not a sitemap document)
    assert(Sitemaps.entries("<html>\n<urlset><url><loc>x</loc></url></urlset>")
      .isEmpty)
    // decl + comment + BOM before the root are fine
    val ok = "﻿<?xml version=\"1.0\"?>\n<!-- c -->\n" +
      "<urlset xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">" +
      "<url><loc>https://e.com/x</loc></url></urlset>"
    assert(Sitemaps.entries(ok).map(_.loc) == Seq("https://e.com/x"))
  }

  test("an element without a loc is skipped; hostile entry counts capped") {
    val xml = "<urlset><url><lastmod>2026-01-01</lastmod></url>" +
      "<url><loc>https://e.com/ok</loc></url></urlset>"
    assert(Sitemaps.entries(xml).map(_.loc) == Seq("https://e.com/ok"))
    // 50k cap: 50_001 tiny elements stop at 50_000
    val sb = new StringBuilder("<urlset>")
    (0 until 50001).foreach(i => sb.append(s"<url><loc>u$i</loc></url>"))
    sb.append("</urlset>")
    assert(Sitemaps.entries(sb.toString).size == 50000)
  }

  test("Spark explode path: plants fall out exactly as declared") {
    val spark = graft.operators.SharedSpark.session
    import spark.implicits._
    val docs = Seq(0L, 1L, 2L, 5L, 6L, 11L).toDF("doc_id")
    val maps = Sitemaps.synthesizeSitemaps(docs, "doc_id")
    val got = Sitemaps.explode(maps, "sitemap_xml")
      .select("doc_id", "kind", "loc")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .sortBy(t => (t._1, t._3))
    // id 0: garbage → none; id 1: 2 urls; id 2: 3 urls; id 5: torn keeps
    // id%3=2 of 3; id 11: index → 2 shard entries; id 42: 1 url
    assert(got.count(_._1 == 0L) == 0)
    assert(got.count(_._1 == 1L) == 2)
    assert(got.count(_._1 == 2L) == 3)
    assert(got.filter(_._1 == 5L).map(_._3).toSeq == Seq(
      "https://example.com/page/5/0?k=0&v=5",
      "https://example.com/page/5/1?k=1&v=5"))
    assert(got.filter(_._1 == 11L).map(_._3).toSeq == Seq(
      "https://example.com/sitemap_11_a.xml",
      "https://example.com/sitemap_11_b.xml"))
    assert(got.filter(_._1 == 11L).forall(_._2 == "sitemap"))
    assert(got.count(_._1 == 6L) == 1)
  }
}
