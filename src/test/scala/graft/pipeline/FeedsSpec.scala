package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

class FeedsSpec extends AnyFunSuite {

  private val rssFeed =
    """<?xml version="1.0"?>
<rss version="2.0">
<channel>
<title>chan</title>
<item>
<title>Plain &amp; escaped</title>
<link>https://e.com/1</link>
<pubDate>2026-01-01T00:00:00Z</pubDate>
<guid isPermaLink="false">g1</guid>
</item>
<item>
<title><![CDATA[Plain & escaped]]></title>
<link>https://e.com/2</link>
</item>
</channel>
</rss>
"""

  private val atomFeed =
    """<feed xmlns="http://www.w3.org/2005/Atom">
<entry>
<title type="text">A1</title>
<link rel="alternate" href="https://e.com/a1"/>
<published>2026-02-01T00:00:00Z</published>
<id>id1</id>
</entry>
<entry>
<title>A2</title>
<link>https://e.com/a2</link>
<updated>2026-02-02T00:00:00Z</updated>
<id>id2</id>
</entry>
</feed>
"""

  test("rss: items, entity and CDATA titles converge, attr-bearing guid") {
    val is = Feeds.items(rssFeed)
    assert(is.size == 2)
    assert(is(0) == Feeds.Item("rss", "Plain & escaped", "https://e.com/1",
      "2026-01-01T00:00:00Z", "g1"))
    assert(is(1).title == "Plain & escaped") // CDATA converges
    assert(is(1).link == "https://e.com/2" && is(1).published == null &&
      is(1).guid == null)
  }

  test("atom: href links, published-else-updated, id") {
    val is = Feeds.items(atomFeed)
    assert(is.size == 2)
    assert(is(0) == Feeds.Item("atom", "A1", "https://e.com/a1",
      "2026-02-01T00:00:00Z", "id1"))
    // sloppy text-content link + updated fallback
    assert(is(1) == Feeds.Item("atom", "A2", "https://e.com/a2",
      "2026-02-02T00:00:00Z", "id2"))
  }

  test("torn and garbage: complete items only, junk-before-root disqualifies") {
    val cut = rssFeed.lastIndexOf("<item>") + 9
    assert(Feeds.items(rssFeed.substring(0, cut)).map(_.guid) == Seq("g1"))
    assert(Feeds.items(null).isEmpty)
    assert(Feeds.items("not xml").isEmpty)
    assert(Feeds.items("<html><rss><item><title>x</title></item></rss>").isEmpty)
    var step = 0
    while (step < atomFeed.length) {
      assert(Feeds.items(atomFeed.substring(0, step)).size <= 2)
      step += 7
    }
  }

  test("hostile item count capped") {
    val sb = new StringBuilder("<rss><channel>")
    (0 until 50001).foreach(i =>
      sb.append(s"<item><guid>g$i</guid></item>"))
    sb.append("</channel></rss>")
    assert(Feeds.items(sb.toString).size == 50000)
  }

  test("Spark explode path: plants fall out exactly as declared") {
    val spark = graft.operators.SharedSpark.session
    import spark.implicits._
    val docs = Seq(0L, 2L, 3L, 5L).toDF("doc_id")
    val feeds = Feeds.synthesizeFeeds(docs, "doc_id")
    val got = Feeds.explode(feeds, "feed_xml")
      .select("doc_id", "kind", "title", "guid")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3))).sortBy(t => (t._1, t._4))
    assert(got.count(_._1 == 0L) == 0)
    assert(got.filter(_._1 == 2L).map(_._3).toSeq == Seq(
      "Post 2/0 A&B", "Post 2/1 A&B", "Post 2/2 A&B")) // both encodings converge
    assert(got.filter(_._1 == 2L).forall(_._2 == "rss"))
    assert(got.filter(_._1 == 3L).map(_._4).toSeq == Seq(
      "tag:example.com:3:0"))
    assert(got.filter(_._1 == 3L).forall(_._2 == "atom"))
    assert(got.filter(_._1 == 5L).map(_._4).toSeq == Seq(
      "tag:example.com:5:0", "tag:example.com:5:1")) // torn keeps id%3=2
  }
}
