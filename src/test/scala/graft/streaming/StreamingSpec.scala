package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SharedSpark

class StreamingSpec extends AnyFunSuite {

  lazy val spark = SharedSpark.session
  import spark.implicits._

  test("streaming windowed agg over events matches the batch twin") {
    val dir = "/root/testdata/sf0.001"
    // file-source streaming requires a directory → stage the table into one
    val staged = java.nio.file.Files.createTempDirectory("events_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      staged.resolve("part-0.parquet"))
    val stream = EventStreams.readEvents(spark, staged.toString)
    val q = EventStreams.windowedAgg(stream)
      .writeStream.outputMode("complete")
      .format("memory").queryName("win_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("win_out")
        .select($"h", $"event_type", $"n", $"value_cents")
        .orderBy("h", "event_type").collect()

      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val batch = EventStreams.normalizeEventTs(
        spark.read.parquet(s"$dir/events.parquet"))
        .groupBy(date_trunc("hour", $"ts").as("h"), $"event_type")
        .agg(count("*").as("n"),
          sum(floor($"value" * 100 + 0.5).cast("long")).as("value_cents"))
        .orderBy("h", "event_type").collect()

      assert(streamed.length == batch.length)
      assert(streamed.toSeq == batch.toSeq)
    } finally q.stop()
  }

  test("stateful sessionization closes sessions on gap") {
    def ts(min: Int) = new Timestamp(1700000000000L + min * 60000L)
    val events = Seq(
      EventStreams.Event(1, ts(0), 1L, "view", 1.0),
      EventStreams.Event(2, ts(5), 1L, "click", 1.0),
      EventStreams.Event(3, ts(60), 1L, "view", 1.0), // gap > 30min → new session
      EventStreams.Event(4, ts(0), 2L, "view", 1.0)
    ).toDS()

    // run the same state function through the streaming engine via memory source
    implicit val sqlCtx = spark.sqlContext
    val src = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[EventStreams.Event]
    src.addData(Seq(
      EventStreams.Event(1, ts(0), 1L, "view", 1.0),
      EventStreams.Event(2, ts(5), 1L, "click", 1.0),
      EventStreams.Event(3, ts(60), 1L, "view", 1.0),
      EventStreams.Event(4, ts(0), 2L, "view", 1.0)): _*)
    val sessions = EventStreams.sessionize(spark, src.toDS(), gapMinutes = 30)
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("sess_out").start()
    try {
      q.processAllAvailable()
      // only the CLOSED session (gap observed in-batch) is emitted; open ones wait for timeout
      val closed = spark.table("sess_out").as[EventStreams.UserSession].collect()
      assert(closed.length == 1)
      assert(closed.head.user_id == 1L && closed.head.n_events == 2)
      assert(closed.head.session_start == ts(0) && closed.head.session_end == ts(5))
    } finally q.stop()
  }

  test("jq generator runs unchanged over a stream (Spark-first extension)") {
    // the reference UDTF is batch-only; here the same jq generator column
    // rides a readStream microbatch pipeline with a downstream filter
    implicit val sqlCtx = spark.sqlContext
    val src = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[String]
    src.addData(
      """{"k": 1, "tags": ["a", "b"]}""",
      """{"k": 2, "tags": ["c"]}""",
      """{"k": 3, "tags": []}""")
    val out = src.toDF().toDF("json")
      .select(graft.Graft.jq($"json", "{k, t: .tags[]}", "k:int", "t:string"))
      .where($"k" < 3)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("jq_stream_out").start()
    try {
      q.processAllAvailable()
      val rows = spark.table("jq_stream_out").as[(Int, String)].collect().toSet
      assert(rows == Set((1, "a"), (1, "b"), (2, "c")))
    } finally q.stop()
  }

  test("streaming decontamination: incoming docs checked against a static benchmark") {
    // the curation gate as a stream: docs arrive on a readStream, the
    // benchmark gram set is a static broadcast side — same operator code
    // as the batch text_decontam query
    implicit val sqlCtx = spark.sqlContext
    val src = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    src.addData(
      (0L, "w1 w2 w3 w4 w5 w6"),   // shares the 3-gram "w2 w3 w4" with bench
      (1L, "x1 x2 x3 x4 x5 x6"),   // clean
      (2L, "w2 w3 w4 w9 w10 w11")) // shares it too
    val bench = Seq(Tuple1("w2 w3 w4")).toDF("text")
    val flagged = graft.pipeline.TextAnalysis.contamination(
      src.toDF().toDF("doc_id", "text"), bench, "doc_id", "text", n = 3)
    val q = flagged.writeStream.outputMode("complete")
      .format("memory").queryName("decontam_stream_out").start()
    try {
      q.processAllAvailable()
      val rows = spark.table("decontam_stream_out").as[(Long, Long)].collect().toMap
      assert(rows == Map(0L -> 1L, 2L -> 1L))
    } finally q.stop()
  }

  test("streaming stratified sampling: pure-map gate works unchanged on a stream") {
    // stratifiedSample is a stateless map (md5 bucket < per-stratum cut),
    // so the SAME operator code runs in append mode with no watermark or
    // state store — and must select exactly the rows the batch run selects
    implicit val sqlCtx = spark.sqlContext
    val rows = (0L until 200L).map(i => (i, if (i % 2 == 0) "en" else "de"))
    val src = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    src.addData(rows: _*)
    val fractions = Map("en" -> 0.5, "de" -> 0.25)
    val sampled = graft.pipeline.TextAnalysis.stratifiedSample(
      src.toDF().toDF("id", "lang"), "id", "lang", fractions)
    val q = sampled.writeStream.outputMode("append")
      .format("memory").queryName("strat_stream_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("strat_stream_out").as[(Long, String)].collect().toSet
      val batch = graft.pipeline.TextAnalysis.stratifiedSample(
        rows.toDF("id", "lang"), "id", "lang", fractions)
        .as[(Long, String)].collect().toSet
      assert(streamed == batch && batch.nonEmpty)
    } finally q.stop()
  }

  test("streaming sample-table walk + tokenizer encode: the r15 pure maps run unchanged on a stream") {
    // probeVideoTracks (byte walk + explode) and a trained BPE encode
    // (plan-constant piece table) are stateless maps — the same operator
    // code runs in append mode, byte-identical to the batch run
    implicit val sqlCtx = spark.sqlContext
    val docs = (0L until 30L).map(i =>
      (i, s"alpha beta beta gamma$i delta alpha beta"))
    val model = graft.pipeline.Bpe.trainFromCounts(
      Seq(("alpha", 10L), ("beta", 14L), ("gamma1", 2L), ("delta", 5L)),
      nMerges = 20)
    val media = graft.pipeline.Multimodal.synthesizeMp4SampleTablePayloads(
      docs.toDF("doc_id", "text"), "doc_id")
    val msrc = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Array[Byte])]
    msrc.addData(media.as[(Long, Array[Byte])].collect().toSeq: _*)
    val tracks = graft.pipeline.Multimodal.probeVideoTracks(
      msrc.toDF().toDF("doc_id", "payload"), "payload")
    val tsrc = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    tsrc.addData(docs: _*)
    val toks = tsrc.toDF().toDF("doc_id", "text")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.size(
          graft.pipeline.Bpe.encode(model,
            org.apache.spark.sql.functions.col("text"))).as("n_tokens"))
    // the crawl chain's WARC walk is the same pure-map shape
    val wsrc = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Array[Byte])]
    val warcBlobs = graft.sources.Warc.synthesizeWarcPayloads(
      docs.toDF("doc_id", "text"), "doc_id", "text")
    wsrc.addData(warcBlobs.as[(Long, Array[Byte])].collect().toSeq: _*)
    val warcRecs = graft.sources.Warc.records(
        wsrc.toDF().toDF("doc_id", "payload"), "payload")
      .withColumn("payload",
        org.apache.spark.sql.functions.col("payload").cast("string"))
    val q3 = warcRecs.writeStream.outputMode("append")
      .format("memory").queryName("warc_stream_out").start()
    val q1 = tracks.writeStream.outputMode("append")
      .format("memory").queryName("tracks_stream_out").start()
    val q2 = toks.writeStream.outputMode("append")
      .format("memory").queryName("bpe_stream_out").start()
    try {
      q1.processAllAvailable(); q2.processAllAvailable()
      val bTracks = graft.pipeline.Multimodal.probeVideoTracks(media, "payload")
        .collect().map(_.toString).toSet
      val sTracks = spark.table("tracks_stream_out")
        .collect().map(_.toString).toSet
      assert(sTracks == bTracks && bTracks.nonEmpty)
      val bToks = docs.toDF("doc_id", "text")
        .select(org.apache.spark.sql.functions.col("doc_id"),
          org.apache.spark.sql.functions.size(
            graft.pipeline.Bpe.encode(model,
              org.apache.spark.sql.functions.col("text"))).as("n_tokens"))
        .as[(Long, Int)].collect().toSet
      val sToks = spark.table("bpe_stream_out").as[(Long, Int)].collect().toSet
      assert(sToks == bToks && bToks.nonEmpty)
      q3.processAllAvailable()
      val bWarc = graft.sources.Warc.records(warcBlobs, "payload")
        .withColumn("payload",
          org.apache.spark.sql.functions.col("payload").cast("string"))
        .collect().map(_.toString).toSet
      val sWarc = spark.table("warc_stream_out")
        .collect().map(_.toString).toSet
      assert(sWarc == bWarc && bWarc.nonEmpty)
      // no state store: stateless maps only
      assert(q1.lastProgress == null ||
        q1.lastProgress.stateOperators.isEmpty)
    } finally { q1.stop(); q2.stop(); q3.stop() }
  }

  test("streaming zip/tar/warc-scan/chunk walks: the r16 pure maps run unchanged on a stream") {
    // Zip.read (CD walk + verified inflate), Tar.read (ustar walk),
    // Warc.scanStats (drop accounting) and probeVideoChunks (stsc/stco
    // walk) are all stateless per-row byte walks — the same operator
    // code runs in append mode, byte-identical to the batch run
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.col
    val docs = (0L until 40L).map(i => (i, s"zip tar stream doc $i body"))
    val zipBlobs = graft.sources.Zip.synthesizeZipPayloads(
      docs.toDF("doc_id", "text"), "doc_id", "text")
    val tarBlobs = graft.sources.Tar.synthesizeTarPayloads(
      docs.toDF("doc_id", "text"), "doc_id", "text")
    val warcBlobs = graft.sources.Warc.synthesizeWarcPayloads(
      docs.toDF("doc_id", "text"), "doc_id", "text")
    val mp4Blobs = graft.pipeline.Multimodal.synthesizeMp4SampleTablePayloads(
      docs.toDF("doc_id", "text"), "doc_id")
    def stream(name: String, blobs: org.apache.spark.sql.DataFrame,
               f: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame) = {
      val src = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Array[Byte])]
      src.addData(blobs.as[(Long, Array[Byte])].collect().toSeq: _*)
      val q = f(src.toDF().toDF("doc_id", "payload")).writeStream
        .outputMode("append").format("memory").queryName(name).start()
      q.processAllAvailable()
      val got = spark.table(name).collect().map(_.toString).toSet
      val want = f(blobs).collect().map(_.toString).toSet
      assert(got == want && want.nonEmpty, s"$name: stream != batch")
      assert(q.lastProgress == null || q.lastProgress.stateOperators.isEmpty,
        s"$name must be stateless")
      q.stop()
    }
    stream("zip_stream_out", zipBlobs,
      df => graft.sources.Zip.read(df, "payload")
        .withColumn("content", col("content").cast("string")))
    stream("tar_stream_out", tarBlobs,
      df => graft.sources.Tar.read(df, "payload")
        .withColumn("content", col("content").cast("string")))
    stream("warcscan_stream_out", warcBlobs,
      df => graft.sources.Warc.scanStats(df, "payload", maxRecordBytes = 512L))
    stream("chunks_stream_out", mp4Blobs,
      df => graft.pipeline.Multimodal.probeVideoChunks(df, "payload"))
    val id3Blobs = graft.pipeline.Multimodal.synthesizeId3Payloads(
      docs.toDF("doc_id", "text"), "doc_id")
    stream("id3_stream_out", id3Blobs,
      df => graft.pipeline.Multimodal.probeId3Meta(df, "payload"))
    // r16 PDF extractor + the chain-v3 content-type router: object
    // scan, inflate, and text-operator walk are all per-row pure maps
    val pdfBlobs = graft.sources.Pdf.synthesizePdfPayloads(
      docs.toDF("doc_id", "text"), "doc_id", "text")
    stream("pdf_stream_out", pdfBlobs,
      df => graft.sources.Pdf.read(df, "payload"))
    val httpPdfBlobs = graft.sources.Warc.synthesizeWarcHttpPdfPayloads(
      docs.toDF("doc_id", "text"), "doc_id", "text")
    stream("chainpdf_stream_out", httpPdfBlobs, { df =>
      val split = graft.sources.Warc.httpSplit(
        graft.sources.Warc.records(df, "payload")
          .where(col("warc_type") === "response")
          .drop("content_type"), "payload")
        .where(col("status") === 200)
      split.where(col("content_type") === "application/pdf")
        .select(col("doc_id"),
          graft.sources.Pdf.textColumn(col("body")).as("clean"))
        .where(col("clean").isNotNull)
    })
    // r16 Ogg page walk: CRC gate + stream readout is a per-row pure map
    val oggBlobs = graft.pipeline.Multimodal.synthesizeOggPayloads(
      docs.toDF("doc_id", "text").select("doc_id"), "doc_id")
    stream("ogg_stream_out", oggBlobs,
      df => graft.pipeline.Multimodal.probeOggStreams(df, "payload"))
    stream("oggtags_stream_out", oggBlobs,
      df => graft.pipeline.Multimodal.probeOggTags(df, "payload"))
    // r16 PNG text-chunk walk + PDF /Info + HTTP wire decode: pure maps
    val pngBlobs = graft.pipeline.Multimodal.synthesizePngMetaPayloads(
      docs.toDF("doc_id", "text").select("doc_id"), "doc_id")
    stream("pngmeta_stream_out", pngBlobs,
      df => graft.pipeline.Multimodal.probePngMeta(df, "payload"))
    val pdfInfoBlobs = graft.sources.Pdf.synthesizePdfInfoPayloads(
      docs.toDF("doc_id", "text"), "doc_id", "text")
    stream("pdfinfo_stream_out", pdfInfoBlobs,
      df => graft.sources.Pdf.read(df, "payload"))
    val httpEncBlobs = graft.sources.Warc.synthesizeWarcHttpEncodedPayloads(
      docs.toDF("doc_id", "text"), "doc_id", "text")
    stream("httpbody_stream_out", httpEncBlobs, { df =>
      graft.sources.Warc.httpBody(
        graft.sources.Warc.records(df, "payload")
          .where(col("warc_type") === "response").drop("content_type"),
        "payload")
        .withColumn("body", col("body").cast("string"))
    })
  }

  test("streaming sitemap explode: the frontier seed runs unchanged on a stream") {
    implicit val sqlCtx = spark.sqlContext
    val ids = (0L until 40L).toSeq
    val maps = graft.pipeline.Sitemaps.synthesizeSitemaps(
      ids.toDF("doc_id"), "doc_id")
    val src = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    src.addData(maps.as[(Long, String)].collect().toSeq: _*)
    val q = graft.pipeline.Sitemaps.explode(
        src.toDF().toDF("doc_id", "sitemap_xml"), "sitemap_xml")
      .writeStream.outputMode("append")
      .format("memory").queryName("sitemap_stream_out").start()
    q.processAllAvailable()
    val got = spark.table("sitemap_stream_out").collect().map(_.toString).toSet
    val want = graft.pipeline.Sitemaps.explode(maps, "sitemap_xml")
      .collect().map(_.toString).toSet
    assert(got == want && want.nonEmpty)
    assert(q.lastProgress == null || q.lastProgress.stateOperators.isEmpty)
    q.stop()
    // the feed explode is the same pure-map shape
    val feeds = graft.pipeline.Feeds.synthesizeFeeds(ids.toDF("doc_id"), "doc_id")
    val fsrc = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    fsrc.addData(feeds.as[(Long, String)].collect().toSeq: _*)
    val fq = graft.pipeline.Feeds.explode(
        fsrc.toDF().toDF("doc_id", "feed_xml"), "feed_xml")
      .writeStream.outputMode("append")
      .format("memory").queryName("feed_stream_out").start()
    fq.processAllAvailable()
    val fgot = spark.table("feed_stream_out").collect().map(_.toString).toSet
    val fwant = graft.pipeline.Feeds.explode(feeds, "feed_xml")
      .collect().map(_.toString).toSet
    assert(fgot == fwant && fwant.nonEmpty)
    assert(fq.lastProgress == null || fq.lastProgress.stateOperators.isEmpty)
    fq.stop()
  }

  test("streaming robots gate + multi-pattern screen: stream-static broadcast and pure map") {
    // the politeness gate is a stream-static BROADCAST join + pure map
    // (RobotsEval) — stateless in append mode; multi_match is a plain
    // scalar over the stream. Both equal their batch runs byte for byte.
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.{col, explode}
    import org.apache.spark.sql.graftshim.{GraftShim => E}
    val urls = (0L until 60L).map(i =>
      (i, if (i % 2 == 0) "a.com" else "b.com", s"/p/$i"))
    val robots = Seq(
      ("a.com", "User-agent: *\nDisallow: /p/1\nAllow: /p/12$\n"),
      ("b.com", "User-agent: *\nDisallow: /\n")).toDF("domain", "robots_txt")
    val usrc = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String, String)]
    usrc.addData(urls: _*)
    val gated = graft.pipeline.Robots.gate(
      usrc.toDF().toDF("id", "domain", "path"), "domain", "path",
      robots, "domain", "robots_txt", "graftbot")
    val q = gated.writeStream.outputMode("append")
      .format("memory").queryName("robots_stream_out").start()
    val msrc = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    msrc.addData((0L until 40L).map(i => (i, s"scan the table $i tab")): _*)
    val pats = Seq("scan", "tab", "table")
    def screen(df: org.apache.spark.sql.DataFrame) =
      df.select(col("id"), explode(E.column(graft.functions.MultiMatch(
        E.expression(col("text")), pats))).as("h"))
        .select(col("id"), col("h.pattern"), col("h.n"))
    val q2 = screen(msrc.toDF().toDF("id", "text")).writeStream
      .outputMode("append").format("memory").queryName("mm_stream_out").start()
    try {
      q.processAllAvailable(); q2.processAllAvailable()
      val want = graft.pipeline.Robots.gate(urls.toDF("id", "domain", "path"),
          "domain", "path", robots, "domain", "robots_txt", "graftbot")
        .collect().map(_.toString).toSet
      val got = spark.table("robots_stream_out").collect().map(_.toString).toSet
      assert(got == want && want.nonEmpty, "robots gate: stream != batch")
      assert(q.lastProgress == null || q.lastProgress.stateOperators.isEmpty)
      val wantM = screen((0L until 40L).map(i => (i, s"scan the table $i tab"))
        .toDF("id", "text")).collect().map(_.toString).toSet
      val gotM = spark.table("mm_stream_out").collect().map(_.toString).toSet
      assert(gotM == wantM && wantM.nonEmpty, "multi_match: stream != batch")
      assert(q2.lastProgress == null || q2.lastProgress.stateOperators.isEmpty)
    } finally { q.stop(); q2.stop() }
  }

  test("streaming sentence chunking + ROUGE + video probe: the r14 pure maps run unchanged on a stream") {
    // sentenceChunks, rougeN, and probeVideoMeta are all stateless maps
    // (regex/fold/byte-walk per row) — the SAME operator code runs in
    // append mode with no watermark or state store, byte-identical to
    // the batch run
    implicit val sqlCtx = spark.sqlContext
    val rows = (0L until 24L).map(i =>
      (i, s"Alpha $i. Beta beta! Gamma? delta tail $i"))
    val src = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    src.addData(rows: _*)
    val in = src.toDF().toDF("doc_id", "text")
    val chunked = graft.pipeline.TextAnalysis.sentenceChunks(
      in, "doc_id", "text", maxSentences = 2, overlap = 1)
    val rouge = graft.pipeline.TextAnalysis.rougeN(
      in.withColumn("cand", org.apache.spark.sql.functions.expr(
        "concat('alpha ', CAST(doc_id AS STRING), ' beta beta')")),
      "text", "cand", n = 2)
      .select("doc_id", "overlap_grams", "rouge_f1_ppm")
    val q1 = chunked.writeStream.outputMode("append")
      .format("memory").queryName("sent_stream_out").start()
    val q2 = rouge.writeStream.outputMode("append")
      .format("memory").queryName("rouge_stream_out").start()
    try {
      q1.processAllAvailable(); q2.processAllAvailable()
      val bChunk = graft.pipeline.TextAnalysis.sentenceChunks(
        rows.toDF("doc_id", "text"), "doc_id", "text", 2, 1)
        .as[(Long, Int, String, Long, Long)].collect().toSet
      val sChunk = spark.table("sent_stream_out")
        .as[(Long, Int, String, Long, Long)].collect().toSet
      assert(sChunk == bChunk && bChunk.nonEmpty)
      val bRouge = graft.pipeline.TextAnalysis.rougeN(
        rows.toDF("doc_id", "text").withColumn("cand",
          org.apache.spark.sql.functions.expr(
            "concat('alpha ', CAST(doc_id AS STRING), ' beta beta')")),
        "text", "cand", n = 2)
        .select("doc_id", "overlap_grams", "rouge_f1_ppm")
        .as[(Long, Long, Long)].collect().toSet
      val sRouge = spark.table("rouge_stream_out")
        .as[(Long, Long, Long)].collect().toSet
      assert(sRouge == bRouge && bRouge.nonEmpty)
    } finally { q1.stop(); q2.stop() }
    // the MP4 probe on a binary stream: header-only pure map
    val vsrc = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Array[Byte])]
    val ftypOnly = {
      val bb = java.nio.ByteBuffer.allocate(16)
      bb.putInt(16); bb.put("ftyp".getBytes("US-ASCII"))
      bb.put("isom".getBytes("US-ASCII")); bb.putInt(0)
      bb.array()
    }
    vsrc.addData((1L, ftypOnly), (2L, "not a video".getBytes))
    val probed = graft.pipeline.Multimodal.probeVideoMeta(
      vsrc.toDF().toDF("doc_id", "payload"), "payload")
      .select("doc_id", "format")
    val q3 = probed.writeStream.outputMode("append")
      .format("memory").queryName("vprobe_stream_out").start()
    try {
      q3.processAllAvailable()
      val got = spark.table("vprobe_stream_out").as[(Long, String)].collect().toSet
      assert(got == Set((1L, "mp4"), (2L, "unknown")), got.toString)
    } finally q3.stop()
  }

  test("streaming markup strip + script profile: stateless maps, stream == batch") {
    // stripMarkup and scriptProfile are pure codegen'd maps (plan-asserted
    // joinless/shuffleless in PlanSpec), so the crawl-normalization front
    // of a pipeline runs UNCHANGED on micro-batches — no watermark, no
    // state store, and byte-identical output to the batch run
    implicit val sqlCtx = spark.sqlContext
    val rows = (0L until 50L).map(i =>
      (i, s"<p>doc $i &amp; привет</p><script>x=$i</script>"))
    val src = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    src.addData(rows: _*)
    val streamed = graft.pipeline.TextAnalysis.scriptProfile(
      src.toDF().toDF("id", "html")
        .withColumn("clean", graft.pipeline.TextAnalysis.stripMarkup($"html")),
      "clean")
    val q = streamed.writeStream.outputMode("append")
      .format("memory").queryName("markup_stream_out").start()
    try {
      q.processAllAvailable()
      val got = spark.table("markup_stream_out")
        .select("id", "clean", "n_latin", "n_cyrillic", "dominant")
        .as[(Long, String, Long, Long, String)].collect().toSet
      val batch = graft.pipeline.TextAnalysis.scriptProfile(
        rows.toDF("id", "html")
          .withColumn("clean", graft.pipeline.TextAnalysis.stripMarkup($"html")),
        "clean")
        .select("id", "clean", "n_latin", "n_cyrillic", "dominant")
        .as[(Long, String, Long, Long, String)].collect().toSet
      assert(got == batch && batch.nonEmpty)
      assert(batch.forall(_._2.contains("привет")))
      assert(batch.forall(!_._2.contains("<p>")))
    } finally q.stop()
  }

  test("streaming cross-corpus gate: fresh stream anti-joined against the shipped corpus") {
    // the incremental-batch dedup gate as a stream: arriving docs pass only
    // if their normalized content is absent from a STATIC reference corpus
    // (stream-static LEFT ANTI join, append mode, no state store) — same
    // operator code as the batch dedup_crosscorpus query
    implicit val sqlCtx = spark.sqlContext
    val ref = Seq((100L, "The quick   brown fox")).toDF("doc_id", "text")
    val src = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    src.addData(
      (1L, "the quick brown fox"), // normalized duplicate of ref 100
      (2L, "an entirely new document"))
    val admitted = graft.pipeline.Dedup.crossCorpus(
      src.toDF().toDF("doc_id", "text"), ref, "text", broadcastRef = true)
    val q = admitted.writeStream.outputMode("append")
      .format("memory").queryName("crosscorpus_stream_out").start()
    try {
      q.processAllAvailable()
      val ids = spark.table("crosscorpus_stream_out").select("doc_id").as[Long].collect().toSet
      assert(ids == Set(2L))
    } finally q.stop()
  }

  test("streaming NEAR-dup gate: arriving docs blocked against a static corpus by MinHash bands") {
    // the approximate sibling of the streaming cross-corpus gate: the
    // fresh side is a pure map (signature → band keys) + stream-static
    // equi join, so the SAME operator code runs in append mode
    implicit val sqlCtx = spark.sqlContext
    val ref = Seq(
      (100L, "the quick brown fox jumps over the lazy dog near the river bank today"))
      .toDF("doc_id", "text")
    val src = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    src.addData(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank tonight"),
      (2L, "totally unrelated content regarding quantum chromodynamics"))
    val cands = graft.pipeline.Dedup.minhashCrossCandidates(
      src.toDF().toDF("doc_id", "text"), ref, "doc_id", "text",
      numHashes = 128, bands = 32)
    val q = cands.writeStream.outputMode("append")
      .format("memory").queryName("neardup_stream_out").start()
    try {
      q.processAllAvailable()
      val pairs = spark.table("neardup_stream_out").as[(Long, Long)].collect().toSet
      assert(pairs.contains((1L, 100L)), s"planted near-dup not blocked on the stream: $pairs")
      assert(!pairs.exists(_._1 == 2L), "unrelated doc must not collide in any band")
      // the no-state contract: pure map + stream-static join — a streaming
      // dropDuplicates here would park every pair in an unbounded state store
      assert(q.lastProgress.stateOperators.isEmpty,
        s"streaming gate must be stateless, got ${q.lastProgress.stateOperators.mkString(",")}")
    } finally q.stop()
  }

  test("streaming batches gate against a PERSISTED near-dup gate (daily-crawl lifecycle)") {
    // build once on the reference corpus, then gate a stream against the
    // STORED bucket table: the reference corpus is not read at all on the
    // query path, and the stream side stays a stateless pure map + join —
    // the shape an incremental crawl pipeline runs every day
    implicit val sqlCtx = spark.sqlContext
    val ref = Seq(
      (100L, "the quick brown fox jumps over the lazy dog near the river bank today"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("neardup_gate_stream").toString
    graft.pipeline.Dedup.buildNearDupGate(ref, "doc_id", "text", dir,
      numHashes = 128, bands = 32)
    val src = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    src.addData(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank tonight"),
      (2L, "totally unrelated content regarding quantum chromodynamics"))
    val cands = graft.pipeline.Dedup.queryNearDupGate(
      src.toDF().toDF("doc_id", "text"), "doc_id", "text", dir)
    val q = cands.writeStream.outputMode("append")
      .format("memory").queryName("neardup_persisted_out").start()
    try {
      q.processAllAvailable()
      // second micro-batch reuses the same stored gate
      src.addData((3L, "the quick brown fox jumps over the lazy dog near the river bank sometimes"))
      q.processAllAvailable()
      val pairs = spark.table("neardup_persisted_out").as[(Long, Long)].collect().toSet
      assert(pairs.contains((1L, 100L)) && pairs.contains((3L, 100L)),
        s"planted near-dups not blocked via the persisted gate: $pairs")
      assert(!pairs.exists(_._1 == 2L), "unrelated doc must not collide in any band")
      assert(q.lastProgress.stateOperators.isEmpty,
        s"persisted gate must be stateless on the stream, got ${q.lastProgress.stateOperators.mkString(",")}")
    } finally q.stop()
  }

  test("streaming image fingerprints gate against a PERSISTED hamming index") {
    // the dHash twin of the near-dup gate: reference fingerprints banded
    // once on storage; micro-batches probe with a pure map + stream-static
    // join and exact Hamming64 verify — no state store
    implicit val sqlCtx = spark.sqlContext
    val ref = Seq((100L, 0x0F0F0F0FL), (200L, 0x7777000012345678L))
      .toDF("img_id", "dhash")
    val dir = java.nio.file.Files.createTempDirectory("hamming_gate").toString
    graft.pipeline.Dedup.buildHammingGate(ref, "img_id", "dhash", dir, maxHamming = 3)
    val src = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long)]
    src.addData(
      (1L, 0x0F0F0F0EL),          // 1 bit from ref 100 -> gated
      (2L, 0x00000000DEADBEEFL))  // far from both refs -> passes
    val hits = graft.pipeline.Dedup.queryHammingGate(
      src.toDF().toDF("img_id", "dhash"), "img_id", "dhash", dir)
    val q = hits.writeStream.outputMode("append")
      .format("memory").queryName("hamming_gate_out").start()
    try {
      q.processAllAvailable()
      // second micro-batch reuses the same stored index
      src.addData((3L, 0x7777000012345679L)) // 1 bit from ref 200
      q.processAllAvailable()
      val got = spark.table("hamming_gate_out")
        .select("id", "ref_id").as[(Long, Long)].collect().toSet
      assert(got.contains((1L, 100L)) && got.contains((3L, 200L)),
        s"planted near-dup fingerprints not gated: $got")
      assert(!got.exists(_._1 == 2L), s"distant fingerprint wrongly gated: $got")
      assert(q.lastProgress.stateOperators.isEmpty,
        s"hamming gate must be stateless on the stream, got ${q.lastProgress.stateOperators.mkString(",")}")
    } finally q.stop()
  }

  test("hamming gate batch path dedups multi-band hits and matches the radius join") {
    val ref = Seq((100L, 0L), (200L, -1L)).toDF("img_id", "dhash")
    val dir = java.nio.file.Files.createTempDirectory("hamming_gate_b").toString
    graft.pipeline.Dedup.buildHammingGate(ref, "img_id", "dhash", dir, maxHamming = 3)
    // fp == ref 100 exactly: every C(6,3)=20 key subset matches — batch
    // output must still be ONE row
    val fresh = Seq((1L, 0L), (2L, 7L), (3L, 0x00FFFFFFFFFFFFFFL)).toDF("img_id", "dhash")
    val got = graft.pipeline.Dedup.queryHammingGate(fresh, "img_id", "dhash", dir)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    // 1->100 hamming 0; 2->100 hamming 3; 3 is 8 bits from -1 (outside)
    assert(got == Map((1L, 100L) -> 0, (2L, 100L) -> 3), s"got $got")
    // a re-crawled id carrying two fingerprints reports the MINIMUM
    // hamming deterministically, not a partition-dependent pick
    val dup = Seq((9L, 7L), (9L, 1L)).toDF("img_id", "dhash") // h=3 and h=1 vs ref 0
    val d = graft.pipeline.Dedup.queryHammingGate(dup, "img_id", "dhash", dir)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    assert(d == Map((9L, 100L) -> 1), s"got $d")
  }

  test("buildHammingGate applies the maxBucket skew guard at build time") {
    // 5 identical reference fingerprints with maxBucket=4: every band
    // bucket overflows and is dropped — a probe at distance 0 finds
    // nothing (recall traded for join survival, the minhash-gate contract)
    val ref = (1L to 5L).map(i => (i, 42L)).toDF("img_id", "dhash")
    val dir = java.nio.file.Files.createTempDirectory("hamming_gate_skew").toString
    graft.pipeline.Dedup.buildHammingGate(ref, "img_id", "dhash", dir,
      maxHamming = 3, maxBucket = 4)
    val fresh = Seq((1L, 42L)).toDF("img_id", "dhash")
    assert(graft.pipeline.Dedup.queryHammingGate(fresh, "img_id", "dhash", dir).count() == 0L,
      "overflowing reference bucket must be dropped by the build-time guard")
    // under the cap the same probe hits
    val dir2 = java.nio.file.Files.createTempDirectory("hamming_gate_ok").toString
    graft.pipeline.Dedup.buildHammingGate(ref.limit(3), "img_id", "dhash", dir2,
      maxHamming = 3, maxBucket = 4)
    assert(graft.pipeline.Dedup.queryHammingGate(fresh, "img_id", "dhash", dir2).count() == 3L)
  }

  test("mergeable sketches run as streaming aggregates: heavy hitters + quantiles") {
    // the bounded-state sketches are TypedImperativeAggregates, so
    // Structured Streaming runs them incrementally with NO extra code —
    // the state store holds one k-bounded summary per group, never a
    // per-distinct-key map. Exact regime → results equal the batch twin
    // after every micro-batch.
    implicit val sqlCtx = spark.sqlContext
    val src = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[String]
    src.addData("alpha beta alpha", "gamma alpha beta")
    val hhAgg = org.apache.spark.sql.graftshim.GraftShim.column(
      graft.functions.HeavyHitters(
        org.apache.spark.sql.graftshim.GraftShim.expression(col("token")), 16)
        .toAggregateExpression())
    val tokens = src.toDF().toDF("text")
      .select(explode(graft.pipeline.TextAnalysis.words(col("text"))).as("token"))
    val q = tokens.groupBy().agg(hhAgg.as("hh"),
        graft.functions.QuantileSketch.sketchQuantiles(
          length(col("token")).cast("double"), 64, Seq(0.5)).as("qs"))
      .writeStream.outputMode("complete").format("memory")
      .queryName("sketch_stream_out").start()
    try {
      q.processAllAvailable()
      src.addData("alpha delta")
      q.processAllAvailable()
      val row = spark.table("sketch_stream_out").head
      val counts = row.getSeq[org.apache.spark.sql.Row](0)
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      // alpha 4, beta 2, gamma 1, delta 1 over both micro-batches
      assert(counts == Map("alpha" -> 4L, "beta" -> 2L, "gamma" -> 1L, "delta" -> 1L),
        s"streaming exact-regime counts must match the batch truth: $counts")
      val median = row.getSeq[Double](1).head
      assert(median == 5.0, s"median token length over 8 tokens must be 5.0, got $median")
    } finally q.stop()
  }

  test("streaming join maintenance: per-batch deltas fold into the stored join output") {
    // the joinDelta lifecycle under Structured Streaming: each micro-batch
    // carries new rows for ONE side; foreachBatch appends
    // joinDelta(storedA, storedB, batch, empty) to the stored join output
    // and the batch to its side — after any number of batches the output
    // equals the full join recompute, and no batch ever re-joined history
    implicit val sqlCtx = spark.sqlContext
    import graft.pipeline.Maintenance
    import org.apache.spark.sql.functions.col
    var a = Seq((1L, 10L), (2L, 20L)).toDF("k", "av")
    val b = Seq((1L, 100L), (2L, 200L), (3L, 300L)).toDF("k", "bv")
    var out = a.join(b, "k").select("k", "av", "bv")
    val emptyB = Seq.empty[(Long, Long)].toDF("k", "bv")
    val src = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long)]
    val q = src.toDF().toDF("k", "av").writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val delta = Maintenance.joinDelta(a, b, batch, emptyB, "k")
          .select("k", "av", "bv")
        out = out.unionByName(delta).localCheckpoint(true)
        a = a.unionByName(batch).localCheckpoint(true)
        ()
      }.start()
    try {
      src.addData((3L, 30L)); q.processAllAvailable()
      src.addData((1L, 11L), (9L, 90L)); q.processAllAvailable()
      val got = out.collect().map(_.toString).sorted.toSeq
      val full = a.join(b, "k").select("k", "av", "bv")
        .collect().map(_.toString).sorted.toSeq
      assert(got == full, s"stream-maintained join != recompute:\n$got\nvs\n$full")
    } finally q.stop()
  }

  test("kmeansScore is a pure map: a stream scores against frozen centroids, stream == batch") {
    // train once on a static corpus; the scorer is an array-literal fold
    // (no join, no shuffle), so it runs unchanged on a readStream frame —
    // the nearest-cluster router for arriving embeddings
    implicit val sqlCtx = spark.sqlContext
    val train = Seq(
      (1L, Seq(1.0f, 1.0f)), (2L, Seq(0.9f, 1.1f)),
      (3L, Seq(-1.0f, -1.0f)), (4L, Seq(-1.1f, -0.9f))
    ).toDF("vec_id", "embedding")
    val src = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Seq[Float])]
    val batchRows = Seq((10L, Seq(0.95f, 0.95f)), (11L, Seq(-0.95f, -1.05f)))
    src.addData(batchRows: _*)
    val q = graft.pipeline.Clustering.kmeansScore(
        train, src.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding",
        k = 2, rounds = 2)
      .writeStream.outputMode("append").format("memory")
      .queryName("kmeans_stream_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("kmeans_stream_out")
        .as[(Long, Long, Long)].collect().toSet
      val batch = graft.pipeline.Clustering.kmeansScore(
          train, batchRows.toDF("vec_id", "embedding"), "vec_id", "embedding",
          k = 2, rounds = 2)
        .as[(Long, Long, Long)].collect().toSet
      assert(streamed == batch, s"stream must equal batch: $streamed vs $batch")
      // the two probes must land in DIFFERENT clusters (they sit on the
      // two training blobs)
      assert(streamed.map(_._2).size == 2, s"blob routing: $streamed")
    } finally q.stop()
  }

  test("KMV sketch folds incrementally on a stream: audience overlap without storing members") {
    // the r8 bottom-k synopsis is a TypedImperativeAggregate too — a live
    // per-source distinct-audience sketch costs <= k longs of state per
    // group, and after every micro-batch equals the batch sketch of all
    // rows so far (exact merge, no approximation in the state fold)
    implicit val sqlCtx = spark.sqlContext
    val src = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, Long)]
    src.addData(("a", 1L), ("a", 2L), ("b", 2L))
    val df = src.toDF().toDF("g", "v")
    val q = graft.pipeline.Sketches.kmvSketches(df, Seq("g"), "v", k = 8)
      .writeStream.outputMode("complete").format("memory")
      .queryName("kmv_stream_out").start()
    try {
      q.processAllAvailable()
      src.addData(("a", 2L), ("a", 3L), ("b", 9L))
      q.processAllAvailable()
      val got = spark.table("kmv_stream_out")
        .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toSeq).toMap
      val batch = graft.pipeline.Sketches.kmvSketches(
          Seq(("a", 1L), ("a", 2L), ("b", 2L), ("a", 2L), ("a", 3L), ("b", 9L))
            .toDF("g", "v"), Seq("g"), "v", k = 8)
        .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toSeq).toMap
      assert(got == batch,
        s"streaming KMV state must equal the batch sketch: $got vs $batch")
      assert(got("a").size == 3 && got("b").size == 2, "dedup inside the state")
    } finally q.stop()
  }

  test("stream-stream interval join: clicks attributed to views within 20 minutes") {
    implicit val sqlCtx = spark.sqlContext
    def ts(min: Int) = new Timestamp(1700000000000L + min * 60000L)
    val views = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Timestamp)]
    val clicks = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Timestamp)]
    views.addData((1L, ts(0)), (1L, ts(30)), (2L, ts(5)))
    clicks.addData((1L, ts(10)), (2L, ts(50)))
    val v = views.toDF().toDF("user_id", "vts").withWatermark("vts", "1 hour")
    val c = clicks.toDF().toDF("cuser", "cts").withWatermark("cts", "1 hour")
    val joined = v.join(c,
      expr("user_id = cuser AND cts BETWEEN vts AND vts + interval 20 minutes"))
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ssj_out").start()
    try {
      q.processAllAvailable()
      val rows = spark.table("ssj_out").select($"user_id", $"vts", $"cts")
        .as[(Long, Timestamp, Timestamp)].collect().toSet
      // only user 1's click@10 falls inside a view's 20-minute window
      assert(rows == Set((1L, ts(0), ts(10))))
    } finally q.stop()
  }

  test("streaming exact dedup: dropDuplicates with watermark keeps first occurrence") {
    implicit val sqlCtx = spark.sqlContext
    def ts(min: Int) = new Timestamp(1700000000000L + min * 60000L)
    val src = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Timestamp, String)]
    src.addData((1L, ts(0), "a"), (2L, ts(1), "b"), (1L, ts(2), "a-dup"), (3L, ts(3), "c"), (2L, ts(4), "b-dup"))
    val out = src.toDF().toDF("event_id", "ts", "payload")
      .withWatermark("ts", "10 minutes")
      .dropDuplicates("event_id")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    try {
      q.processAllAvailable()
      val rows = spark.table("dedup_out").select($"event_id", $"payload")
        .as[(Long, String)].collect().toSet
      assert(rows == Set((1L, "a"), (2L, "b"), (3L, "c")))
    } finally q.stop()
  }

  test("batch sessionization matches hand-computed sessions") {
    def ts(min: Int) = new Timestamp(1700000000000L + min * 60000L)
    val df = Seq(
      (1L, ts(0), 1L), (2L, ts(5), 1L), (3L, ts(60), 1L), (4L, ts(0), 2L)
    ).toDF("event_id", "ts", "user_id")
    val out = EventStreams.sessionizeBatch(df, gapMinutes = 30)
      .select($"user_id", $"session_id", $"n_events")
      .as[(Long, Long, Long)].collect().toSet
    assert(out == Set((1L, 1L, 2L), (1L, 2L, 1L), (2L, 1L, 1L)))
  }
  test("streaming DSIR scoring: the model-literal pure map gates a stream") {
    // the daily-crawl lifecycle: the llr model is built ONCE from the
    // reference corpora, then every arriving micro-batch scores + gates
    // as a stateless map (the model is one array literal) — no join, no
    // state store, append mode
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.col
    val raw = (0L until 50L).map(i =>
      (i, if (i % 2 == 0) "the data pipeline runs and it is fine today"
          else "lorem ipsum dolor sit amet nothing matches here")).toDF("doc_id", "text")
    // 40 target copies: shared tokens get ct=40 (bitlen 6) vs cr=25
    // (bitlen 5) -> llr +1; "today"/odd-doc tokens get 1-5 = -4, so even
    // docs land at +4 and odd docs at -32 — the sign IS the gate
    val target = (0L until 40L)
      .map(j => (100L + j, "the data pipeline runs and it is fine"))
      .toDF("doc_id", "text")
    val model = graft.pipeline.TextAnalysis.importanceModel(raw, target, "text")
    // one stateless branch: score against the model literal, gate on sign
    def pipe3(df: org.apache.spark.sql.DataFrame) =
      graft.pipeline.TextAnalysis.scoreWithImportanceModel(
        df.toDF("doc_id", "text"), "doc_id", "text", model)
        .where(col("dsir_score") > 0)
    val src = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    src.addData((0L until 50L).map(i =>
      (i, if (i % 2 == 0) "the data pipeline runs and it is fine today"
          else "lorem ipsum dolor sit amet nothing matches here")): _*)
    val q = pipe3(src.toDF()).writeStream.outputMode("append")
      .format("memory").queryName("dsir_stream_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("dsir_stream_out")
        .as[(Long, Long, Long)].collect().toSet
      val batch = pipe3(raw).as[(Long, Long, Long)].collect().toSet
      assert(streamed == batch && batch.nonEmpty, s"stream $streamed != batch $batch")
      // only the target-like half survives the score gate
      assert(streamed.map(_._1) == (0L until 50L).filter(_ % 2 == 0).toSet)
    } finally q.stop()
  }

  test("streaming phrase alert + weighted sample: r7 pure maps run unchanged on a stream") {
    // phraseOccurrences counts within each row's own token array and
    // weightedSample is a cross-multiplied md5 keep test — both stateless
    // maps, so the SAME operator code runs append-mode with no state
    // store, selecting exactly what the batch run selects
    implicit val sqlCtx = spark.sqlContext
    val rows = (0L until 100L).map(i =>
      (i, if (i % 3 == 0) "alpha beta gamma alpha beta" else "alpha gamma beta alpha"))
    val src = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    src.addData(rows: _*)
    def pipe(df: org.apache.spark.sql.DataFrame) =
      graft.pipeline.TextAnalysis.weightedSample(
        graft.pipeline.Search.phraseCount(df.toDF("doc_id", "text"), "doc_id", "text",
          Seq("alpha", "beta")),
        "doc_id", org.apache.spark.sql.functions.lit(600000L))
    val q = pipe(src.toDF()).writeStream.outputMode("append")
      .format("memory").queryName("phrase_stream_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("phrase_stream_out").as[(Long, Long)].collect().toSet
      val batch = pipe(rows.toDF("a", "b")).as[(Long, Long)].collect().toSet
      assert(streamed == batch && batch.nonEmpty, s"stream $streamed != batch $batch")
      // multiplicity survives the stream: docs i%3==0 contain the phrase twice
      assert(streamed.forall { case (id, n) => n == (if (id % 3 == 0) 2L else 1L) })
    } finally q.stop()
  }

  test("streaming template mining: masked counts in complete mode equal the batch run") {
    // maskTemplate is a stateless pure map, so template counting on a
    // stream is mask → groupBy count in complete mode — the running
    // template census of a live log stream, no custom state
    implicit val sqlCtx = spark.sqlContext
    val rows = (0L until 60L).map(i =>
      // service name must be non-numeric — a digit would itself mask to <n>
      s"svc${('a' + (i % 3)).toChar} GET /u/${i * 37} sid=${"%012x".format(i * 1048573L)} took ${i}ms")
    val src = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[String]
    src.addData(rows: _*)
    val masked = graft.pipeline.TextAnalysis.maskTemplate(
      org.apache.spark.sql.functions.col("value"))
    val q = src.toDF().select(masked.as("template"))
      .groupBy("template").count()
      .writeStream.outputMode("complete")
      .format("memory").queryName("tpl_stream_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("tpl_stream_out").as[(String, Long)].collect().toSet
      val batch = graft.pipeline.TextAnalysis.logTemplates(
          rows.toDF("line"), "line", k = 10)
        .as[(String, Long)].collect().toSet
      assert(streamed == batch && batch.size == 3, s"stream $streamed != batch $batch")
    } finally q.stop()
  }

  test("streaming freshness audit: complete-mode aggregate equals the batch audit") {
    // freshnessAudit is one partial-aggregated pass of sums/max — it runs
    // natively as a complete-mode streaming aggregate: the live feed
    // dashboard needs no custom state
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq(
      ("a", "2024-01-30 12:00:00"), ("a", "2024-01-02 00:00:00"),
      ("b", "2023-12-01 00:00:00"), ("b", "2024-01-31 23:00:00"))
    val src = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, String)]
    src.addData(rows: _*)
    def audit(df: org.apache.spark.sql.DataFrame) =
      graft.pipeline.Maintenance.freshnessAudit(
        df.selectExpr("_1 AS src", "CAST(_2 AS TIMESTAMP) AS ts"), "src", "ts",
        org.apache.spark.sql.functions.to_timestamp(
          org.apache.spark.sql.functions.lit("2024-02-01 00:00:00")))
    val q = audit(src.toDF()).writeStream.outputMode("complete")
      .format("memory").queryName("fresh_stream_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("fresh_stream_out").collect().map(_.toSeq).toSet
      val batch = audit(rows.toDF("_1", "_2")).collect().map(_.toSeq).toSet
      assert(streamed == batch && batch.size == 2, s"stream $streamed != batch $batch")
    } finally q.stop()
  }

  test("streaming rollup maintenance: per-batch states fold into the stored rollup") {
    // the production shape of Maintenance.mergeRollups: each micro-batch
    // reduces to its keys-sized rollup state inside foreachBatch and
    // merges with the STORED state — history is never rescanned, and
    // after any number of batches the state equals the full recompute
    implicit val sqlCtx = spark.sqlContext
    import graft.pipeline.Maintenance
    val src = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, Double)]
    var state: Option[org.apache.spark.sql.DataFrame] = None
    val q = src.toDF().toDF("k", "v").writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val s = Maintenance.rollupState(batch, Seq("k"), "v")
        val merged = state.fold(s)(old => Maintenance.mergeRollups(Seq("k"), old, s))
        // pin the state OFF the transient batch frame, as a production
        // run's parquet write would; bounded by key cardinality
        state = Some(spark.createDataFrame(
          java.util.Arrays.asList(merged.collect(): _*), merged.schema))
        ()
      }.start()
    try {
      src.addData(("x", 1.004), ("x", 2.996), ("y", 5.0)); q.processAllAvailable()
      src.addData(("x", 0.5), ("z", -0.006)); q.processAllAvailable()
      val got = Maintenance.rollupReport(state.get).orderBy("k")
        .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
      val full = Maintenance.rollupReport(Maintenance.rollupState(
          Seq(("x", 1.004), ("x", 2.996), ("y", 5.0), ("x", 0.5), ("z", -0.006))
            .toDF("k", "v"), Seq("k"), "v")).orderBy("k")
        .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
      assert(got == full && got.size == 3, s"stream-maintained $got != recompute $full")
    } finally q.stop()
  }

  test("streaming moment maintenance: per-batch bivariate states fold, correlation == batch") {
    // the second-order extension of the rollup twin: each micro-batch
    // reduces to its six-number momentState per key, merges with the
    // stored state (plain component sums — a commutative monoid), and
    // the correlation readout equals the full recompute bit for bit
    implicit val sqlCtx = spark.sqlContext
    import graft.pipeline.Maintenance
    val src = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, Long, Long)]
    var state: Option[org.apache.spark.sql.DataFrame] = None
    val q = src.toDF().toDF("k", "x", "y").writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val s = Maintenance.momentState(batch, Seq("k"), "x", "y")
        val merged = state.fold(s)(old => Maintenance.mergeMomentStates(Seq("k"), old, s))
        state = Some(spark.createDataFrame(
          java.util.Arrays.asList(merged.collect(): _*), merged.schema))
        ()
      }.start()
    val all = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long)]
    def add(rows: (String, Long, Long)*): Unit = {
      src.addData(rows); q.processAllAvailable(); all ++= rows
    }
    try {
      add(("a", 1L, 10L), ("a", 2L, 19L), ("b", 5L, 5L))
      add(("a", 3L, 31L), ("b", 6L, 4L), ("c", 1L, 1L))
      add(("b", 7L, 3L)) // b is perfectly anti-correlated: corr_e9 = -1e9
      val got = Maintenance.correlationFromState(state.get).orderBy("k")
        .as[(String, Long, Option[Long])].collect().toSeq
      val full = Maintenance.correlationFromState(Maintenance.momentState(
          all.toSeq.toDF("k", "x", "y"), Seq("k"), "x", "y")).orderBy("k")
        .as[(String, Long, Option[Long])].collect().toSeq
      assert(got == full, s"stream-maintained $got != recompute $full")
      // IEEE sqrt rounding can land the −1 correlation a floor-ulp below
      assert(got.find(_._1 == "b").get._3.exists(v =>
        v == -1000000000L || v == -1000000001L), s"$got")
      assert(got.find(_._1 == "c").get._3.isEmpty, "single point has no variance")
    } finally q.stop()
  }

  test("streaming HLL maintenance: register states max-merge, estimate == batch, re-delivery safe") {
    // the distinct-count ledger the batch set-ops had no streaming twin
    // for: each micro-batch reduces to its (key, bucket)→max-rank
    // register table, max-merges into the stored state (HLL union —
    // IDEMPOTENT, so at-least-once delivery cannot inflate the count),
    // and the estimator readout equals the full recompute bit for bit
    implicit val sqlCtx = spark.sqlContext
    import graft.pipeline.Sketches
    val src = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, Long)]
    var state: Option[org.apache.spark.sql.DataFrame] = None
    val q = src.toDF().toDF("k", "v").writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val s = Sketches.hllState(batch, Seq("k"), "v", p = 6)
        val merged = state.fold(s)(old => Sketches.mergeHllStates(Seq("k"), old, s))
        state = Some(spark.createDataFrame(
          java.util.Arrays.asList(merged.collect(): _*), merged.schema))
        ()
      }.start()
    val all = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    def add(rows: (String, Long)*): Unit = {
      src.addData(rows); q.processAllAvailable(); all ++= rows
    }
    try {
      add((1L to 200L).map(i => ("a", i)): _*)
      add((150L to 400L).map(i => ("a", i)): _*) // overlap: union semantics
      add((1L to 90L).map(i => ("b", i * 7)): _*)
      val got = Sketches.distinctFromState(state.get, Seq("k"), p = 6)
        .orderBy("k").as[(String, Long, Long, Long)].collect().toSeq
      val full = Sketches.hllDistinct(all.toSeq.toDF("k", "v"), Seq("k"), "v", p = 6)
        .orderBy("k").as[(String, Long, Long, Long)].collect().toSeq
      assert(got == full, s"stream-maintained $got != recompute $full")
      // idempotence: re-merging the final state into itself is a no-op
      // (the at-least-once safety the additive ledgers don't have)
      val again = Sketches.distinctFromState(
          Sketches.mergeHllStates(Seq("k"), state.get, state.get), Seq("k"), p = 6)
        .orderBy("k").as[(String, Long, Long, Long)].collect().toSeq
      assert(again == got, s"re-delivery changed the state: $again vs $got")
    } finally q.stop()
  }

  test("streaming drift monitor: per-batch sign-bucket states fold, drift == batch") {
    // today's snapshot arrives as a stream; its signBucketState is a
    // monoid, so each micro-batch folds into a stored bucket×dim state
    // and the drift vs the fixed reference equals the full-batch recompute
    implicit val sqlCtx = spark.sqlContext
    import graft.pipeline.Similarity
    val ref = Seq((1L, Array(1.0f, 1.0f)), (2L, Array(1.0f, -1.0f)))
      .toDF("vec_id", "embedding")
    val src = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Array[Float])]
    var state: Option[org.apache.spark.sql.DataFrame] = None
    val q = src.toDF().toDF("vec_id", "embedding").writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val s = Similarity.signBucketState(batch, "embedding", signDims = 2)
        val merged = state.fold(s)(old => old.unionByName(s)
          .groupBy("bucket", "dim").agg(
            org.apache.spark.sql.functions.sum("s").as("s"),
            org.apache.spark.sql.functions.sum("n").as("n")))
        state = Some(spark.createDataFrame(
          java.util.Arrays.asList(merged.collect(): _*), merged.schema))
        ()
      }.start()
    val b1 = Seq((10L, Array(0.5f, 1.0f)), (11L, Array(1.0f, -0.5f)))
    val b2 = Seq((12L, Array(1.5f, 1.0f)))
    try {
      src.addData(b1: _*); q.processAllAvailable()
      src.addData(b2: _*); q.processAllAvailable()
      val got = Similarity.driftFromStates(
          Similarity.signBucketState(ref, "embedding", 2), state.get)
        .orderBy("bucket").collect().map(_.toString).toSeq
      val full = Similarity.centroidDrift(ref,
          (b1 ++ b2).toDF("vec_id", "embedding"), "embedding", signDims = 2)
        .orderBy("bucket").collect().map(_.toString).toSeq
      assert(got == full && got.nonEmpty,
        s"stream-maintained $got != batch $full")
    } finally q.stop()
  }

  test("streaming group maintenance: crawl batches fold into stored near-dup groups") {
    // the appendGroups lifecycle under Structured Streaming: each
    // micro-batch carries (new doc id, matched partner or -1); foreachBatch
    // folds the batch into the STORED (id, group_id) table — history is
    // never re-iterated, and after any number of batches the state equals
    // the full connectedComponents recompute over everything
    implicit val sqlCtx = spark.sqlContext
    import graft.pipeline.Dedup
    val seedIds = spark.range(0, 10).toDF("id")
    val seedPairs = Seq((0L, 1L), (4L, 5L)).toDF("a", "b")
    var state = spark.createDataFrame(
      java.util.Arrays.asList(Dedup.connectedComponents(seedIds, seedPairs).collect(): _*),
      new org.apache.spark.sql.types.StructType()
        .add("id", "long", false).add("group_id", "long", false))
    val src = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long)]
    val q = src.toDF().toDF("id", "partner").writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        import org.apache.spark.sql.functions.col
        val ids = batch.select(col("id")).distinct()
        val pairs = batch.where(col("partner") >= 0)
          .select(col("id").as("a"), col("partner").as("b"))
        val next = Dedup.appendGroups(state, ids, pairs)
        state = spark.createDataFrame(
          java.util.Arrays.asList(next.collect(): _*), state.schema)
        ()
      }.start()
    try {
      // batch 1: 20 joins group 0 (via 1); 21 a singleton
      src.addData((20L, 1L), (21L, -1L)); q.processAllAvailable()
      // batch 2: 30 bridges 21 and stored group 4 — a cross-batch merge
      src.addData((30L, 21L), (30L, 4L)); q.processAllAvailable()
      val got = state.as[(Long, Long)].collect().toMap
      val full = Dedup.connectedComponents(
          seedIds.union(Seq(20L, 21L, 30L).toDF("id")),
          seedPairs.union(Seq((20L, 1L), (30L, 21L), (30L, 4L)).toDF("a", "b")))
        .as[(Long, Long)].collect().toMap
      assert(got == full, s"stream-maintained $got != recompute $full")
      assert(got(30L) == 4L && got(21L) == 4L, s"cross-batch merge missing: $got")
    } finally q.stop()
  }

  test("streaming SCD2 maintenance: change batches fold into the stored " +
      "dimension, state == full recompute incl. a cross-batch interval close") {
    // the scd2Merge lifecycle under Structured Streaming (r13): each
    // micro-batch of change-log rows folds into the STORED SCD2 table
    // inside foreachBatch — history never rescanned beyond one key
    // semi/anti join; after any number of batches the state equals
    // TimeSeries.scd2 over every row so far
    implicit val sqlCtx = spark.sqlContext
    import graft.pipeline.TimeSeries
    def t(d: Int) = java.sql.Timestamp.valueOf(f"2024-03-$d%02d 00:00:00")
    val seed = Seq((1L, 1L, t(1), "a"), (2L, 2L, t(1), "x"))
      .toDF("user_id", "event_id", "ts", "v")
    var state = {
      val s0 = TimeSeries.scd2(seed, "user_id", "ts", "event_id", Seq("v"))
      spark.createDataFrame(java.util.Arrays.asList(s0.collect(): _*), s0.schema)
    }
    val src = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long, Int, String)]
    val q = src.toDF().toDF("user_id", "event_id", "d", "v")
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        import org.apache.spark.sql.functions.expr
        val changes = batch.withColumn("ts",
          expr("timestamp(date_add(DATE '2024-02-29', d))"))
        val next = TimeSeries.scd2Merge(state, changes,
          "user_id", "ts", "event_id", Seq("v"))
        state = spark.createDataFrame(
          java.util.Arrays.asList(next.collect(): _*), state.schema)
        ()
      }.start()
    val all = scala.collection.mutable.ArrayBuffer(
      (1L, 1L, t(1), "a"), (2L, 2L, t(1), "x"))
    try {
      // batch 1: key 1 flips a→b (closes the SEED interval across the
      // batch boundary); key 2 no-op collapse; key 3 appears
      src.addData((1L, 3L, 2, "b"), (2L, 4L, 2, "x"), (3L, 5L, 2, "z"))
      q.processAllAvailable()
      all ++= Seq((1L, 3L, t(2), "b"), (2L, 4L, t(2), "x"), (3L, 5L, t(2), "z"))
      // batch 2: key 3 flips (closing an interval OPENED BY A STREAM batch)
      src.addData((3L, 6L, 3, "w"))
      q.processAllAvailable()
      all += ((3L, 6L, t(3), "w"))
      val got = state.orderBy("user_id", "valid_from", "event_id")
        .collect().map(_.toString).toSeq
      val full = TimeSeries.scd2(
          all.toSeq.toDF("user_id", "event_id", "ts", "v"),
          "user_id", "ts", "event_id", Seq("v"))
        .orderBy("user_id", "valid_from", "event_id")
        .collect().map(_.toString).toSeq
      assert(got == full && got.size == 5,
        s"stream-maintained $got != recompute $full")
    } finally q.stop()
  }

  test("streaming Markov-attribution state: touch batches fold into the " +
      "transition monoid, read-time terminals == batch journeyTransitions") {
    // journeys are OPEN-ENDED on a stream: cross-batch edges ride the
    // per-user boundary row, terminals are derived at read time — after
    // any number of batches withTerminals(state) must equal
    // journeyTransitions over every touch so far
    implicit val sqlCtx = spark.sqlContext
    import graft.pipeline.Attribution
    var (counts, last) = Attribution.emptyTouchState(spark)
    def hold(p: (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame)) = {
      // pin each state frame (the scd2Merge twin's collect-and-recreate
      // discipline — foreachBatch frames don't outlive the batch)
      (spark.createDataFrame(java.util.Arrays.asList(p._1.collect(): _*), p._1.schema),
       spark.createDataFrame(java.util.Arrays.asList(p._2.collect(): _*), p._2.schema))
    }
    val src = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long, Long, Long)]
    val q = src.toDF().toDF("user_id", "ts", "event_id", "campaign")
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val next = Attribution.mergeTouchBatch(counts, last, batch,
          "user_id", "ts", "event_id", "campaign")
        val held = hold(next); counts = held._1; last = held._2
        ()
      }.start()
    val all = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
    def addBatch(rows: (Long, Long, Long, Long)*): Unit = {
      src.addData(rows); q.processAllAvailable(); all ++= rows
    }
    try {
      // batch 1: user 1 touches c0,c1; user 2 touches c2
      addBatch((1L, 1L, 1L, 0L), (1L, 2L, 2L, 1L), (2L, 1L, 3L, 2L))
      // batch 2: user 1 CONTINUES (bridge c1→c0 crosses the batch
      // boundary); user 3 appears with two touches
      addBatch((1L, 3L, 4L, 0L), (3L, 1L, 5L, 1L), (3L, 2L, 6L, 1L))
      // batch 3: user 2 continues; self-transition c1→c1 inside user 3
      addBatch((2L, 2L, 7L, 0L), (3L, 3L, 8L, 1L))
      val conv = Seq((1L, 10L), (3L, 5L)).toDF("user_id", "cents")
      val got = Attribution.withTerminals(counts, last, conv, "user_id")
        .orderBy("src", "dst").collect().map(_.toString).toSeq
      val full = Attribution.journeyTransitions(
          all.toSeq.toDF("user_id", "ts", "event_id", "campaign"),
          "user_id", "ts", "event_id", "campaign", conv)
        .orderBy("src", "dst").collect().map(_.toString).toSeq
      assert(got == full, s"stream-maintained $got != batch $full")
      // the boundary frame holds exactly one row per user
      assert(last.count() == 3L)
    } finally q.stop()
  }

  test("streaming PII audit: the Luhn gate is a pure map, stream == batch") {
    // luhnAudit is one nested higher-order expression per row — no state,
    // no watermark: the SAME operator code audits a stream in append mode
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq(
      (1L, "paid with 4111111111111111 today"),
      (2L, "paid with 4111111111111112 today"),
      (3L, "nothing numeric here"))
    val src = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    src.addData(rows: _*)
    val audited = graft.pipeline.TextAnalysis.luhnAudit(
      src.toDF().toDF("doc_id", "text"), "doc_id", "text")
    val q = audited.writeStream.outputMode("append")
      .format("memory").queryName("luhn_stream_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("luhn_stream_out")
        .as[(Long, Long, Long)].collect().toSet
      val batch = graft.pipeline.TextAnalysis.luhnAudit(
        rows.toDF("doc_id", "text"), "doc_id", "text")
        .as[(Long, Long, Long)].collect().toSet
      assert(streamed == batch && streamed == Set((1L, 1L, 1L), (2L, 1L, 0L), (3L, 0L, 0L)),
        streamed.toString)
    } finally q.stop()
  }

  test("streaming multi-benchmark gate: tagged broadcast grams screen a doc stream, stream == batch") {
    // contaminationBatch's benchmark side is a broadcast constant; the
    // per-(doc, bench) hit count is a streaming aggregation → COMPLETE
    // mode (the template-census convention; docs are micro-batch-unique
    // here, so complete == the batch run)
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq((1L, "a b c d e f g h tail"), (2L, "p q r s t u v w tail"),
      (3L, "clean text with nothing shared against either benchmark"))
    val benches = Seq(("bA", "a b c d e f g h"), ("bB", "p q r s t u v w"))
      .toDF("bench", "text")
    val src = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q = graft.pipeline.TextAnalysis.contaminationBatch(
        src.toDF().toDF("doc_id", "text"), benches, "doc_id", "text", "bench")
      .writeStream.outputMode("complete")
      .format("memory").queryName("decontam_batch_stream").start()
    try {
      src.addData(rows.take(2): _*); q.processAllAvailable()
      src.addData(rows.drop(2): _*); q.processAllAvailable()
      val streamed = spark.table("decontam_batch_stream")
        .collect().map(_.toString).toSet
      val batch = graft.pipeline.TextAnalysis.contaminationBatch(
          rows.toDF("doc_id", "text"), benches, "doc_id", "text", "bench")
        .collect().map(_.toString).toSet
      assert(streamed == batch && streamed.size == 2, s"$streamed vs $batch")
    } finally q.stop()
  }

  test("streaming C4 line cleaning: the rule battery is a pure map, per-batch accounting == batch") {
    // c4LineClean is higher-order filters per row — no state: the SAME
    // operator cleans a crawl stream in append mode, rejects accounted
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq(
      (1L, "alpha beta gamma delta epsilon.\nshort one.\nno punctuation here at all"),
      (2L, "braces { in this line anyway.\nenable javascript to continue now."))
    val src = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q = graft.pipeline.TextAnalysis.c4LineClean(
        src.toDF().toDF("doc_id", "text"), "doc_id", "text")
      .writeStream.outputMode("append")
      .format("memory").queryName("c4_stream_out").start()
    try {
      src.addData(rows.head); q.processAllAvailable()
      src.addData(rows(1)); q.processAllAvailable()
      val streamed = spark.table("c4_stream_out")
        .collect().map(_.toString).toSet
      val batch = graft.pipeline.TextAnalysis.c4LineClean(
        rows.toDF("doc_id", "text"), "doc_id", "text")
        .collect().map(_.toString).toSet
      assert(streamed == batch && streamed.size == 2, s"$streamed vs $batch")
    } finally q.stop()
  }

  test("streaming multimodal decode: real ImageIO metadata pass runs unchanged on a stream") {
    // blob ingestion shape: payload batches arrive as a stream; decodeMeta
    // is a stateless mapPartitions decode, so stream output == batch
    // decode of the same payloads
    implicit val sqlCtx = spark.sqlContext
    import graft.pipeline.Multimodal
    val payloads = Multimodal.synthesizeImagePayloads(
        Seq(2L, 3L, 5L).toDF("doc_id"), "doc_id")
      .collect().map(r => (r.getLong(0), r.getAs[Array[Byte]](1)))
    val src = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Array[Byte])]
    val q = Multimodal.decodeMeta(spark, src.toDF().toDF("doc_id", "payload"))
      .writeStream.format("memory").queryName("mm_decode").outputMode("append")
      .start()
    try {
      src.addData(payloads.take(2): _*); q.processAllAvailable()
      src.addData(payloads.drop(2): _*); q.processAllAvailable()
      val got = spark.table("mm_decode").orderBy("doc_id")
        .collect().map(_.toString).toSeq
      val full = Multimodal.decodeMeta(spark,
          Multimodal.synthesizeImagePayloads(Seq(2L, 3L, 5L).toDF("doc_id"), "doc_id"))
        .toDF().orderBy("doc_id").collect().map(_.toString).toSeq
      assert(got == full && got.size == 3, s"stream $got != batch $full")
    } finally q.stop()
  }

  test("streaming URL gate: the crawl's first filter runs unchanged on a URL stream") {
    // urlGate = urlParts regexes + a literal when-chain: a pure map, so
    // the frontier's URL stream gates append-mode before any fetch
    implicit val sqlCtx = spark.sqlContext
    val src = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val gated = graft.pipeline.TextAnalysis.urlGate(src.toDF().toDF("doc_id", "url"),
      "url", blockedDomains = Seq("bad.com"), bannedPathTokens = Seq("ref=spam"))
    val q = gated.writeStream.format("memory").queryName("url_gate")
      .outputMode("append").start()
    try {
      src.addData((1L, "https://www.bad.com/x"), (2L, "https://ok.com/fine"))
      q.processAllAvailable()
      src.addData((3L, "https://ok.com/p?ref=spam"))
      q.processAllAvailable()
      val got = spark.table("url_gate").orderBy("doc_id")
        .select("doc_id", "reject_reason", "keep")
        .collect().map(r => (r.getLong(0), Option(r.getString(1)), r.getBoolean(2))).toSeq
      assert(got == Seq((1L, Some("blocked_domain"), false), (2L, None, true),
        (3L, Some("banned_path"), false)), got.toString)
    } finally q.stop()
  }

  test("streaming resolution screen: the geometry gate runs unchanged on a payload stream") {
    // resolutionScreen = the stateless decoder seam + codegen'd verdicts,
    // so a crawl's blob stream gates append-mode with zero state:
    // stream output == batch screen of the same payloads
    implicit val sqlCtx = spark.sqlContext
    import graft.pipeline.Multimodal
    val ids = Seq(0L, 8L, 56L)
    val payloads = Multimodal.synthesizeImagePayloads(
        ids.toDF("doc_id"), "doc_id")
      .collect().map(r => (r.getLong(0), r.getAs[Array[Byte]](1)))
    val src = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Array[Byte])]
    val q = Multimodal.resolutionScreen(spark, src.toDF().toDF("doc_id", "payload"))
      .writeStream.format("memory").queryName("mm_screen").outputMode("append")
      .start()
    try {
      src.addData(payloads.take(1): _*); q.processAllAvailable()
      src.addData(payloads.drop(1): _*); q.processAllAvailable()
      val got = spark.table("mm_screen").orderBy("doc_id")
        .collect().map(_.toString).toSeq
      val full = Multimodal.resolutionScreen(spark,
          Multimodal.synthesizeImagePayloads(ids.toDF("doc_id"), "doc_id"))
        .orderBy("doc_id").collect().map(_.toString).toSeq
      assert(got == full && got.size == 3, s"stream $got != batch $full")
    } finally q.stop()
  }
}
