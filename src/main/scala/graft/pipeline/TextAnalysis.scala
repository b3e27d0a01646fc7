package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.{GraftShim => E}

import graft.functions.{RollingHash64, WordGramHashes, WordGrams, WordGramsTagged}

/** Text-analysis operators for training-data curation: language ID,
  * quality scoring, token counting, fingerprinting.
  *
  * Everything here is built-in-expression based (whole-stage codegen) —
  * per-row closures would halve scan throughput at 100 TB. The heuristics
  * are deliberately simple + deterministic so a DuckDB oracle can mirror
  * them exactly (SURVEY §2.4).
  */
object TextAnalysis {

  /** Stopword marker lists per language (tiny on purpose: they are baked
    * into the plan as literals and into the oracle SQL as the same lists). */
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is", "that", "it", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "auf"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "pour", "dans", "que"),
    "es" -> Seq("el", "la", "los", "y", "es", "un", "una", "para", "en", "que"))

  /** whitespace-token array of lowercased text */
  def words(text: Column): Column =
    filter(split(lower(text), "\\s+"), w => length(w) > 0)

  /** Count of tokens from `lang`'s stopword list present in the text. */
  def stopwordHits(text: Column, lang: String): Column = {
    val list = stopwords.toMap.apply(lang)
    size(array_intersect(array_distinct(words(text)), array(list.map(lit): _*)))
  }

  /** Heuristic language ID: argmax of stopword hits (priority order on
    * ties: en, de, fr, es; "und" = undetermined when nothing matches). */
  def langId(text: Column): Column = {
    val scores = stopwords.map { case (l, _) => (l, stopwordHits(text, l)) }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und"): Column) { case ((l, s), acc) =>
      when(s === best && best > 0, lit(l)).otherwise(acc)
    }
  }

  /** Mixed-language LINE SPANS (r14) — document-level language
    * segmentation: a crawled page is routinely bilingual (nav chrome in
    * one language, body in another; quote blocks; boilerplate), and a
    * per-DOC language id forces a single wrong label on the mix. Lines
    * get the [[langId]] verdict individually and CONSECUTIVE same-lang
    * lines collapse to spans (the gaps-and-islands construction:
    * island = line_no − per-lang rank, replayable in any engine), so
    * the downstream router can keep the `en` body and drop the `de`
    * chrome instead of choosing one label for both.
    *
    * Plan: one explode + two doc-partitioned windows on the line frame
    * (the dup-lines shuffle shape); spans per doc ≤ lines per doc.
    * Output: `idCol, span_id, lang, first_line, last_line, n_lines`
    * (line numbers 0-based; span_id 1-based in first-line order). */
  def langSpans(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lines = df
      .select(col(idCol), posexplode(split(col(textCol), "\n")).as(Seq("__ln", "__line")))
      .withColumn("__lang", langId(col("__line")))
    val wLang = Window.partitionBy(col(idCol), col("__lang")).orderBy(col("__ln"))
    val islands = lines.withColumn("__isl",
      col("__ln") - row_number().over(wLang))
    val spans = islands.groupBy(col(idCol), col("__lang"), col("__isl"))
      .agg(min(col("__ln")).cast("long").as("first_line"),
        max(col("__ln")).cast("long").as("last_line"),
        count(lit(1)).as("n_lines"))
    spans.withColumn("span_id",
        row_number().over(Window.partitionBy(col(idCol)).orderBy(col("first_line")))
          .cast("long"))
      .select(col(idCol), col("span_id"), col("__lang").as("lang"),
        col("first_line"), col("last_line"), col("n_lines"))
  }

  /** Integer quality components — exact on both engines. */
  def qualityComponents(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    df.withColumn("n_chars_obs", length(t).cast("long"))
      .withColumn("n_words", size(words(t)).cast("long"))
      .withColumn("n_punct",
        (length(t) - length(regexp_replace(t, "[\\.,;:!\\?]", ""))).cast("long"))
      .withColumn("n_stopwords", stopwordHits(t, "en").cast("long"))
      .withColumn("n_distinct_words", size(array_distinct(words(t))).cast("long"))
  }

  /** READABILITY scoring, integer-exact — the Flesch reading-ease family
    * as a curation signal (too-hard and too-trivial documents both skew
    * a pretraining mix; readability stratification is a standard recipe
    * axis). Syllables are the standard regex proxy — maximal
    * `[aeiouy]+` vowel groups per lowercased word ("readable" → 3 —
    * a dictionary-true syllabifier is model territory, the proxy is the
    * published heuristic); sentences are maximal `[.!?]+` runs, floored
    * at 1 so headline-like fragments score rather than divide by zero.
    * The Flesch formula's constants scale to milli-points and every
    * division is integer floor:
    *
    *   flesch_milli = 206835 − (1015·words) DIV sentences
    *                         − (84600·syllables) DIV words
    *
    * — bit-replayable in any engine ([aeiouy]+ and [.!?]+ mean the same
    * thing to Java regex and RE2). Empty/whitespace docs yield NULL
    * (no words → no readability, never a fake score). Output appends:
    * `n_sentences, n_words, n_syllables, flesch_milli`. */
  def readability(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    df.withColumn("n_sentences",
        greatest(size(regexp_extract_all(t, lit("[.!?]+"), lit(0))), lit(1)).cast("long"))
      .withColumn("n_words", size(words(t)).cast("long"))
      .withColumn("n_syllables",
        size(regexp_extract_all(lower(t), lit("[aeiouy]+"), lit(0))).cast("long"))
      .withColumn("flesch_milli",
        when(col("n_words") > 0,
          lit(206835L) - expr("(1015 * n_words) DIV n_sentences")
            - expr("(84600 * n_syllables) DIV n_words")))
  }

  /** Scalar quality score in [0, 1000]: length sweet-spot + stopword
    * density + lexical diversity, floor-scaled to an exact integer. */
  def qualityScore(df: DataFrame, textCol: String): DataFrame = {
    val q = qualityComponents(df, textCol)
    val lenScore = least(col("n_words").cast("double") / 100.0, lit(1.0))
    val stopScore = least(col("n_stopwords").cast("double") / 5.0, lit(1.0))
    val divScore = col("n_distinct_words").cast("double") /
      greatest(col("n_words").cast("double"), lit(1.0))
    q.withColumn("quality_score",
      floor((lenScore * 0.4 + stopScore * 0.3 + divScore * 0.3) * 1000.0 + 0.5).cast("long"))
  }

  /** BPE-ish pre-tokenizer pattern: letter runs / digit runs / single
    * other glyphs. No lookarounds — RE2 (DuckDB) and java.util.regex agree. */
  val bpePattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

  /** Token counting: whitespace tokens + BPE-ish regex segmentation count
    * (an upper bound on byte-pair merges, the usual pre-tokenizer shape). */
  def tokenCounts(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    df.withColumn("n_ws_tokens", size(words(t)).cast("long"))
      .withColumn("n_bpe_tokens", size(regexp_extract_all(t, lit(bpePattern), lit(0))).cast("long"))
  }

  /** Document fingerprints: md5 of normalized text (oracle-friendly) and a
    * 64-bit FNV-1a rolling hash (the scale path — 8 bytes/doc vs 32). */
  def fingerprints(df: DataFrame, textCol: String): DataFrame = {
    val norm = regexp_replace(lower(col(textCol)), "\\s+", " ")
    df.withColumn("fp_md5", md5(norm))
      .withColumn("fp_rolling", E.column(RollingHash64(E.expression(col(textCol)))))
  }

  /** URL decomposition via RE2-safe anchored regexes (one pure-map scan,
    * no java.net.URI — a parser object per row is a UDF in disguise, and
    * exceptions on crawl garbage would poison the task; a non-matching
    * component extracts as '' instead). Emits `scheme, host, path,
    * url_query, fragment` plus `domain` = host lowercased, `www.` and
    * `:port` stripped — the key every domain-level curation op (source
    * filters, blocklists, per-domain caps) groups on. */
  def urlParts(df: DataFrame, urlCol: String): DataFrame = {
    Seq("scheme", "host", "path", "url_query", "fragment", "domain").foreach(c =>
      require(!df.columns.contains(c),
        s"urlParts: input already has a '$c' column"))
    val u = col(urlCol)
    // authority = [userinfo@]host[:port]; strip userinfo through the
    // LAST '@' — 'https://trusted.com@spam.example/' keying its domain
    // as 'trusted.com…' is the classic URL-confusion trick against
    // exactly the blocklists/per-domain caps this op feeds
    val host = regexp_replace(
      regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1),
      "^.*@", "")
    df.withColumn("scheme", lower(regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1)))
      .withColumn("host", host)
      .withColumn("path", regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1))
      // anchored through the pre-fragment text: a '?' AFTER '#' is part
      // of the fragment, not a query component (URL syntax ends the
      // query scope at the first '#')
      .withColumn("url_query", regexp_extract(u, "^[^#]*?\\?([^#]*)", 1))
      .withColumn("fragment", regexp_extract(u, "#(.*)$", 1))
      .withColumn("domain",
        regexp_replace(regexp_replace(lower(host), "^www\\.", ""), ":[0-9]+$", ""))
  }

  /** URL GATE (r11) — the crawl pipeline's FIRST filter (C4/RefinedWeb
    * run a domain blocklist + path-keyword screen before a single byte
    * of content is fetched or tokenized): [[urlParts]] canonicalization
    * → broadcast-list verdicts with first-failing-rule attribution
    * (`blocked_domain` → `banned_path` → `non_http`, the
    * tolerant-decode accounting convention — every drop names its
    * rule). `bannedPathTokens` match case-insensitively as substrings
    * of path∥query (the published heuristic — token lists, not regex,
    * so the gate replays in any engine verbatim).
    *
    * Output: the input columns + `domain, reject_reason (NULL = kept),
    * keep`. Pure map over the corpus (the blocklist is a literal
    * when-chain — KBs for any real list); stream-safe, no shuffle. */
  def urlGate(df: DataFrame, urlCol: String, blockedDomains: Seq[String],
              bannedPathTokens: Seq[String]): DataFrame = {
    require(blockedDomains.nonEmpty || bannedPathTokens.nonEmpty,
      "urlGate with no rules gates nothing — pass at least one list")
    val parts = urlParts(df, urlCol)
    val pathq = lower(concat(col("path"), lit("?"), col("url_query")))
    val bannedHit = bannedPathTokens.sorted
      .map(t => pathq.contains(lit(t.toLowerCase)))
      .foldLeft(lit(false))(_ || _)
    parts
      .withColumn("reject_reason",
        when(col("domain").isin(blockedDomains.map(_.toLowerCase): _*), lit("blocked_domain"))
          .when(bannedHit, lit("banned_path"))
          .when(!col("scheme").isin("http", "https"), lit("non_http")))
      .withColumn("keep", col("reject_reason").isNull)
      .drop("scheme", "host", "path", "url_query", "fragment")
  }

  /** Writing-system profile: per-document counts of Latin letters,
    * Cyrillic, CJK (unified ideographs + kana), Arabic and ASCII digits,
    * plus the dominant script (ties break latin > cyrillic > cjk >
    * arabic — deterministic, oracle-replayable). The multilingual-corpus
    * router: stopword language ID ([[langId]]) only separates LANGUAGES
    * that share a script; script mixing inside one doc is also a spam /
    * mojibake signal. Counts via length-difference of a class-strip —
    * explicit \x{...} ranges (BMP only), identical in java.util.regex
    * and RE2. One pure-map scan. */
  def scriptProfile(df: DataFrame, textCol: String): DataFrame = {
    Seq("n_latin", "n_cyrillic", "n_cjk", "n_arabic", "n_digit", "dominant")
      .foreach(c => require(!df.columns.contains(c),
        s"scriptProfile: input already has a '$c' column"))
    val t = col(textCol)
    def cnt(cls: String): Column =
      (length(t) - length(regexp_replace(t, cls, ""))).cast("long")
    val out = df
      .withColumn("n_latin", cnt("[A-Za-z]"))
      .withColumn("n_cyrillic", cnt("[\\x{0400}-\\x{04FF}]"))
      // unified ideographs + kana + HANGUL (syllables and jamo) — Korean
      // is a top-10 web language; omitting it routed pure-Korean docs to
      // dominant 'none'
      .withColumn("n_cjk", cnt("[\\x{3040}-\\x{30FF}\\x{4E00}-\\x{9FFF}\\x{AC00}-\\x{D7AF}\\x{1100}-\\x{11FF}]"))
      .withColumn("n_arabic", cnt("[\\x{0600}-\\x{06FF}]"))
      .withColumn("n_digit", cnt("[0-9]"))
    out.withColumn("dominant",
      when(col("n_latin") >= greatest(col("n_cyrillic"), col("n_cjk"), col("n_arabic"))
        && col("n_latin") > 0, "latin")
        .when(col("n_cyrillic") >= greatest(col("n_cjk"), col("n_arabic"))
          && col("n_cyrillic") > 0, "cyrillic")
        .when(col("n_cjk") >= col("n_arabic") && col("n_cjk") > 0, "cjk")
        .when(col("n_arabic") > 0, "arabic")
        .otherwise("none"))
  }

  /** Encoding-damage (mojibake) audit — the "this text was decoded with
    * the wrong charset somewhere upstream" screen a crawl corpus needs
    * before training: counts per doc of (a) U+FFFD replacement chars
    * (decoder already gave up), (b) C1 control chars U+0080–U+009F
    * (legal Unicode but virtually always CP1252-bytes-read-as-Latin-1),
    * and (c) the classic UTF-8-read-as-Latin-1 digraphs (`Ã`/`Â`/`â`
    * followed by a continuation-range char — how “é” becomes “Ã©”).
    * Pure codegen'd regex counts (RE2-safe, the piiPatterns rule) + one
    * verdict column; NULL text → zero counts, clean verdict. Output:
    * idCol, `n_replacement, n_c1, n_mojibake_pairs, damaged` (1/0). */
  def mojibakeAudit(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = coalesce(col(textCol), lit(""))
    def cnt(cls: String): Column =
      ((length(t) - length(regexp_replace(t, cls, "")))).cast("long")
    // each digraph is 2 chars; count via occurrences not char deltas
    val pairs = "[\\x{00C2}\\x{00C3}\\x{00E2}][\\x{0080}-\\x{00BF}\\x{20AC}\\x{2122}\\x{201A}\\x{2019}\\x{2018}\\x{201C}\\x{201D}]"
    df.select(col(idCol),
        cnt("[\\x{FFFD}]").as("n_replacement"),
        cnt("[\\x{0080}-\\x{009F}]").as("n_c1"),
        ((length(t) - length(regexp_replace(t, pairs, ""))) / 2)
          .cast("long").as("n_mojibake_pairs"))
      .withColumn("damaged",
        when(col("n_replacement") + col("n_c1") + col("n_mojibake_pairs") > 0, 1L)
          .otherwise(0L))
  }

  /** PII redaction patterns: emails, IPv4, simple phone shapes. RE2-safe
    * (no lookaround/backrefs) so DuckDB oracles run the identical regex.
    * Order matters: IPs before phones (an IP would otherwise match the
    * digit-run phone shape). */
  val piiPatterns: Seq[(String, String)] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "[EMAIL]",
    "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b" -> "[IP]",
    "\\b[0-9]{3}[-. ][0-9]{3,4}[-. ][0-9]{4}\\b" -> "[PHONE]")

  /** Redact emails / IPv4s / phone numbers from a text column — the
    * standard scrub pass before training-data release. Pure
    * regexp_replace chain: codegen'd, one scan, no UDF. */
  def redactPii(text: Column): Column =
    piiPatterns.foldLeft(text) { case (c, (pat, repl)) =>
      regexp_replace(c, lit(pat), lit(repl))
    }

  /** Markup-removal regex chain, applied in order. Every pattern is
    * RE2-safe (no lookaround, no backrefs) so the DuckDB oracle replays
    * the identical chain: COMMENTS drop first (a commented-out
    * `<script>` opener — common in real pages — must not open a
    * swallow-to-the-next-real-`</script>` region, and a full commented
    * script block disappears with its comment; a comment opener INSIDE a
    * live script either closes inside it or matches nothing, so the
    * script pattern still takes the block), then script/style elements
    * WITH their content (code is not prose), then every remaining tag
    * becomes a space (so `a<br>b` keeps its word boundary). */
  val markupPatterns: Seq[(String, String)] = Seq(
    "(?s)<!--.*?-->" -> " ",
    "(?is)<script[^>]*>.*?</script>" -> " ",
    "(?is)<style[^>]*>.*?</style>" -> " ",
    "<[^>]+>" -> " ")

  /** Entity decodes applied AFTER tag removal, `&amp;` strictly last —
    * the lenient single-pass order every practical extractor uses
    * (`&amp;lt;` decodes to `&lt;` and stops, it does not double-decode
    * into a phantom `<`). */
  val markupEntities: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
    "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")

  /** Boilerplate markup stripping — the first step of every web-corpus
    * pipeline (raw crawl HTML → trainable prose). Deliberately a
    * DETERMINISTIC regex chain, not an HTML5 tree parser: at 100 TB the
    * value is a codegen'd pure map with bit-replayable output (the same
    * chain runs in the oracle), and malformed-markup edge cases degrade
    * to extra whitespace, never to an error. Tags → space, script/style/
    * comments removed with content, the predefined XML entities + &nbsp;
    * decoded (&amp; last), whitespace collapsed and trimmed. */
  def stripMarkup(text: Column): Column = {
    val noTags = markupPatterns.foldLeft(text) { case (c, (pat, repl)) =>
      regexp_replace(c, lit(pat), lit(repl))
    }
    val decoded = markupEntities.foldLeft(noTags) { case (c, (ent, v)) =>
      replace(c, lit(ent), lit(v))
    }
    // explicit class, not \s: Java \s includes \x0B, RE2's does not —
    // the one dialect divergence that could split the engines
    trim(regexp_replace(decoded, lit("[ \\t\\n\\r\\f]+"), lit(" ")))
  }

  /** Corpus vocabulary: the `topN` most frequent whitespace tokens with
    * counts, ordered (count DESC, token ASC). Plan: explode → groupBy
    * (map-side partial counts) → global sort+limit, which Spark executes
    * as TakeOrderedAndProject — per-partition top-N merged on the driver,
    * no full sort ever materializes. The explode fan-out is the unavoidable
    * cost; everything after it moves only (token, count) pairs. */
  /** VOCABULARY GROWTH curve (the Heaps'-law saturation readout): split
    * the corpus into `nBuckets` id-ordered slices and report, per
    * slice, how many distinct tokens appear there for the FIRST time
    * plus the cumulative vocabulary — "is more data still buying new
    * language, or just repetition?", the question behind every
    * scale-more-vs-curate-more decision. EXACT and one-pass: cumulative
    * distinct doesn't decompose over prefixes, but each token's first
    * appearance is just `min(bucket)` — one partial-aggregated groupBy
    * per distinct token, a bucket-sized rollup, and a running sum over
    * the `nBuckets`-row frame (the only window, trivially sized).
    * Bucketing is by `idCol DIV ceil(span/nBuckets)` over the observed
    * id range — deterministic, no sampling. Output:
    * `bucket, new_tokens, cum_vocab`. */
  def vocabGrowth(df: DataFrame, idCol: String, textCol: String,
                  nBuckets: Int = 10): DataFrame = {
    require(nBuckets >= 2 && nBuckets <= 10000,
      s"nBuckets must be in [2, 10000], got $nBuckets")
    graft.pipeline.Search.requireIntegralId(df, idCol, "vocabGrowth")
    val row = df.agg(min(col(idCol).cast("long")),
      max(col(idCol).cast("long"))).head
    require(!row.isNullAt(0), "vocabGrowth needs a non-empty corpus")
    val lo = row.getLong(0)
    val hi = row.getLong(1)
    val span = hi - lo + 1
    val width = span / nBuckets + (if (span % nBuckets == 0) 0 else 1)
    val bucket = least(lit(nBuckets - 1L),
      expr(s"(CAST(`$idCol` AS BIGINT) - ${lo}L) DIV ${width}L")).cast("int")
    val firstSeen = df.select(bucket.as("__b"), explode(words(col(textCol))).as("__t"))
      .groupBy("__t").agg(min("__b").as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("new_tokens"))
    // every bucket reports, even fully-saturated ones — a growth curve
    // with silent gaps hides exactly the flatness it exists to show
    val spine = df.sparkSession.range(nBuckets)
      .select(col("id").cast("int").as("bucket"))
    // BOUNDED unpartitioned window: the frame is the nBuckets-row spine
    // (caller-fixed, ≤ a few hundred) — never data-proportional, so no
    // RangeScan needed (r12 verdict #7)
    val w = org.apache.spark.sql.expressions.Window.orderBy("bucket")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    spine.join(firstSeen, Seq("bucket"), "left")
      .withColumn("new_tokens", coalesce(col("new_tokens"), lit(0L)))
      .withColumn("cum_vocab", sum("new_tokens").over(w))
  }

  /** Multinomial NAIVE BAYES document classifier — trained and scored in
    * ONE integer pipeline, so unlike a float-gradient model the whole
    * thing is bit-replayable and oracle-gateable (add-one smoothing;
    * McCallum & Nigam, AAAI'98 workshop).
    *
    * Log-probabilities use the r8 fixed-point base-2 grade (`lg64(x) ≈
    * 64·(log₂x + 1)`): per class c and token w,
    * `score_c(d) = lg64(docs_c) + Σ_w tf_w·(lg64(n_cw + 1) − lg64(n_c + V))`
    * — the constant `−lg64(docs)` prior denominator is dropped (same for
    * every class; documented). Prediction = argmax with ties to the
    * LARGEST class label (`max(struct(score, class))` — mirrored by the
    * oracle's ORDER BY). The grade's ≤1/64-bit step can flip an argmax
    * only when true log-scores are within ~1.6% of a doubling — the
    * deliberate determinism/fidelity trade the BM25 idf64 made.
    *
    * Plan: token counts (one shuffle), class-token table (collapsed,
    * vocab×classes), scoring = token frame × |classes| broadcast
    * explode + one left join on (token, class) + two aggregates — the
    * class count is bounded by definition (sources, languages), so the
    * explode is a small constant factor on the map side. V (vocab size)
    * is one bounded driver scalar (the zorder min/max convention).
    * Train = score corpus here (resubstitution accuracy — the
    * embedding-eval convention); leakage-safe splits via
    * [[groupAwareSplit]] compose on top. Output: idCol, `actual,
    * predicted, correct` (1/0) — EVERY labeled doc reports (the
    * wordEntropy left-join convention): a doc with NULL text or zero
    * tokens comes back `predicted` NULL, `correct` 0, so an
    * `avg(correct)` accuracy keeps the full denominator instead of
    * silently shrinking it. */
  def naiveBayesClassify(df: DataFrame, idCol: String, textCol: String,
                         labelCol: String): DataFrame = {
    def lg(x: String) = graft.functions.Lg64.sql(x)
    val toks = df.where(col(labelCol).isNotNull)
      .select(col(idCol), col(labelCol).as("__actual"),
        explode(words(col(textCol))).as("__w"))
      .groupBy(col(idCol), col("__actual"), col("__w"))
      .agg(count(lit(1)).as("__tf"))
    val classTok = toks.groupBy(col("__actual").as("__cls"), col("__w"))
      .agg(sum(col("__tf")).as("__ncw"))
    val classes = df.where(col(labelCol).isNotNull)
      .groupBy(col(labelCol).as("__cls"))
      .agg(count(lit(1)).as("__docs"))
    val nC = classTok.groupBy("__cls").agg(sum(col("__ncw")).as("__nc"))
    val v = classTok.select("__w").distinct().count()
    val scored = toks
      .crossJoin(broadcast(classes.select(col("__cls"))))
      .join(classTok, Seq("__cls", "__w"), "left")
      .na.fill(0L, Seq("__ncw"))
      .join(broadcast(nC), Seq("__cls"))
      .withColumn("__term",
        expr(s"__tf * (${lg("__ncw + 1")} - ${lg(s"__nc + ${v}L")})"))
      .groupBy(col(idCol), col("__actual"), col("__cls"))
      .agg(sum(col("__term")).as("__s"))
      .join(broadcast(classes), Seq("__cls"))
      .withColumn("__score", col("__s") + expr(lg("__docs")))
    val preds = scored.groupBy(col(idCol))
      .agg(max(struct(col("__score"), col("__cls"))).as("__b"))
      .select(col(idCol), col("__b.__cls").as("predicted"))
    df.where(col(labelCol).isNotNull)
      .select(col(idCol), col(labelCol).as("actual"))
      .join(preds, Seq(idCol), "left")
      .select(col(idCol), col("actual"), col("predicted"),
        when(col("actual") === col("predicted"), 1L).otherwise(0L)
          .as("correct"))
  }

  /** Per-doc Shannon entropy of the WORD distribution, in 64ths of a bit
    * — the repetition/diversity screen (keyword-stuffed, templated, or
    * looping text scores low even when char-level stats look normal;
    * natural prose lands near log₂ of its effective vocabulary).
    *
    * Transcendental-free: uses the r8 BM25 fixed-point base-2 grade
    * (`Search` idf64 — `lg64(x) = 64·bitlen(x) + (x·64) DIV 2^(bitlen−1)
    * − 64` ≈ 64·(log₂x + 1)), and the entropy identity
    * `Σ nᵢ·(lg N − lg nᵢ) = N·lg64(N) − Σ nᵢ·lg64(nᵢ)` (the +64 offsets
    * cancel), so the whole signal is one integer per doc, hash-replayable
    * in any engine with a binary-representation builtin. Resolution
    * 1/64 bit; `entropy64 = 64·H_bits ± the grade's affine error`.
    *
    * Plan: one explode → (doc, word) counts → one per-doc aggregate —
    * both groupBys partial-aggregate map-side, no window, stream-safe.
    * Magnitudes: `n·lg64(n)` ≤ N·lg64(N) — per-DOC bounded (docs are
    * MB-scale by nature), long-safe. Docs with no words: `n_words = 0`,
    * `entropy64` NULL (the left-join convention). */
  def wordEntropy(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    def lg64(x: String) = graft.functions.Lg64.sql(x)
    val ent = df
      .select(col(idCol), explode(words(col(textCol))).as("__w"))
      .groupBy(col(idCol), col("__w")).agg(count(lit(1)).as("__n"))
      .groupBy(col(idCol))
      .agg(sum(col("__n")).as("__nw"),
        sum(expr(s"__n * ${lg64("__n")}")).as("__s"))
      .select(col(idCol), col("__nw"),
        expr(s"(__nw * ${lg64("__nw")} - __s) DIV __nw").as("entropy64"))
    df.select(col(idCol)).join(ent, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("__nw"), lit(0L)).as("n_words"),
        col("entropy64"))
  }

  /** SIMPSON repeat probability per doc — the EXACT-integer companion to
    * [[wordEntropy]]'s log-grade: `10⁶·Σ nᵢ(nᵢ−1) DIV (N(N−1))` is the
    * probability two randomly drawn word tokens are the SAME word
    * (Simpson 1949), needing no logarithm at all — 0 = all distinct,
    * 10⁶ = one word repeated; high values flag keyword stuffing and
    * template loops with zero transcendental machinery. Docs with < 2
    * words have no pair to draw: `simpson_ppm` NULL. Same two
    * partial-aggregated passes as wordEntropy. Output: idCol,
    * `n_words, simpson_ppm`. */
  def simpsonRepeat(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val agg = df
      .select(col(idCol), explode(words(col(textCol))).as("__w"))
      .groupBy(col(idCol), col("__w")).agg(count(lit(1)).as("__n"))
      .groupBy(col(idCol))
      .agg(sum(col("__n")).as("__nw"),
        sum(expr("__n * (__n - 1)")).as("__rep"))
      .select(col(idCol), col("__nw"),
        when(col("__nw") >= 2,
          expr("(__rep * 1000000) DIV (__nw * (__nw - 1))")).as("simpson_ppm"))
    df.select(col(idCol)).join(agg, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("__nw"), lit(0L)).as("n_words"),
        col("simpson_ppm"))
  }

  def vocabulary(df: DataFrame, textCol: String, topN: Int = 100): DataFrame =
    df.select(explode(words(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token"))
      .limit(topN)

  /** Distinct hashed word `n`-grams of a text column (xxhash64 of the
    * space-joined window) — 8-byte keys instead of strings, so overlap
    * joins ship fixed-width longs. Documents shorter than `n` words have
    * no n-gram.
    *
    * Single-pass expression (WordGramHashes — one tokenize, one slide,
    * Spark's own XxHash64Function so hashes stay bit-identical to the
    * `xxhash64(array_join(slice(w, ...)))` built-in formulation): the
    * lambda form re-evaluated the full `split(lower(text))` per gram
    * after CollapseProject inlining — O(n_words²) per document, a
    * straggler stall on heavy-tailed web docs. */
  def ngramHashes(text: Column, n: Int): Column =
    E.column(WordGramHashes(E.expression(text), n))

  /** Benchmark decontamination: flags training docs that share at least
    * `minHits` distinct word `n`-grams with any benchmark doc (the overlap
    * check run before training so eval data does not leak into the corpus).
    *
    * Scale shape: the benchmark side is tiny by definition — its distinct
    * gram hashes are BROADCAST, so the training corpus (the 100 TB side) is
    * scanned exactly once and never shuffled; per-doc counting aggregates
    * the exploded grams with map-side partials. Output: (idCol,
    * n_overlap ≥ minHits) rows for contaminated docs only. */
  def contamination(train: DataFrame, bench: DataFrame, idCol: String,
                    textCol: String, n: Int = 8, minHits: Int = 1): DataFrame = {
    val trainGrams = train.select(col(idCol),
      explode(ngramHashes(col(textCol), n)).as("__g"))
    val benchGrams = bench.select(explode(ngramHashes(col(textCol), n)).as("__g")).distinct()
    trainGrams
      .join(broadcast(benchGrams), "__g")
      .groupBy(idCol).agg(count(lit(1)).as("n_overlap"))
      .where(col("n_overlap") >= minHits)
  }

  /** Contamination RUN-LENGTH severity (r11) — the Lee et al. '22
    * distinction [[contamination]]'s binary flag erases: 200 CONSECUTIVE
    * matching grams is a verbatim benchmark copy; 5 scattered matches
    * is phrase-level noise. Positional gram hashes
    * ([[graft.functions.WordGramHashesPos]] — same tokenizer/hash as
    * the distinct set) join the broadcast benchmark grams, matched
    * positions collapse to maximal runs via the gaps-and-islands
    * row_number trick (per-doc window — state bounded by one doc's
    * matches), and each contaminated doc reports its worst span.
    *
    * Output (matched docs only, the [[contamination]] convention):
    * `idCol, n_runs, n_matched, max_run, max_run_start` — run lengths
    * in GRAMS (a run of r covers r+n−1 tokens); max-run ties break to
    * the EARLIEST start. The train side is scanned once and never
    * shuffled beyond the per-doc window exchange. */
  def contaminationRuns(train: DataFrame, bench: DataFrame, idCol: String,
                        textCol: String, n: Int = 8): DataFrame = {
    val tg = train.select(col(idCol),
      posexplode(E.column(graft.functions.WordGramHashesPos(
        E.expression(col(textCol)), n))).as(Seq("__pos", "__g")))
    val bg = bench.select(explode(ngramHashes(col(textCol), n)).as("__g")).distinct()
    val matched = tg.join(broadcast(bg), "__g").select(col(idCol), col("__pos"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(idCol).orderBy("__pos")
    matched
      .withColumn("__grp", col("__pos") - row_number().over(w))
      .groupBy(col(idCol), col("__grp"))
      .agg(count(lit(1)).as("__run"), min("__pos").as("__start"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_runs"),
        sum(col("__run")).as("n_matched"),
        max(struct(col("__run"), (-col("__start")).as("__ns"))).as("__m"))
      .select(col(idCol), col("n_runs"), col("n_matched").cast("long").as("n_matched"),
        col("__m.__run").as("max_run"),
        (-col("__m.__ns")).cast("long").as("max_run_start"))
  }

  /** Token-budget WATER-FILLING mix planner — the recipe question
    * [[sourceMix]] answers backwards: sourceMix APPLIES a share recipe
    * to a corpus; this PLANS one — given per-source available tokens,
    * target shares (ppm, summing to 10⁶), an epoch cap, and a total
    * token budget, how many tokens does each source contribute when a
    * source can run out? The classic water-filling answer: sources
    * saturate in increasing capacity/weight order; the rest share the
    * remaining budget proportionally.
    *
    * EXACT: the saturation test at each source (sorted by cap/weight,
    * tie on source) is the cross-multiplied integer inequality
    * `cap_s·(10⁶ − prefixW) ≤ (B − prefixC)·w_s` in DECIMAL(38,0) —
    * no division until the final allocation `w_s·R DIV W_unsat`
    * (truncating; Σalloc ≤ B with the remainder documented). The SORT
    * key is integer-exact too: (cap DIV w, ((cap % w)·10¹²) DIV w,
    * source) — the house cross-multiplied discipline, so near-equal
    * ratios order identically on every engine (equal ratios saturate
    * together or not at all; the tie-break is the source name).
    * `epochs_milli = alloc·1000 DIV avail` exposes the repeat rate the
    * plan implies (NULL for empty sources); `achieved_ppm` the actual
    * mix share.
    *
    * Recipe sources absent from the corpus plan at 0 avail (their
    * budget flows to the others); corpus sources absent from the
    * recipe are EXCLUDED (the sourceMix contract).
    *
    * Output: `source, avail_tokens, target_ppm, capacity_tokens,
    * saturated, alloc_tokens, epochs_milli, achieved_ppm`.
    *
    * Plan: one partial-aggregated per-source token rollup, then
    * windows + a 1-row rollup over the ≤|sources| collapsed frame
    * (the single-partition-over-collapsed-frame pattern — bounded by
    * the recipe size, never the corpus). */
  def mixPlan(df: DataFrame, sourceCol: String, tokensCol: String,
              weights: Map[String, Long], budgetTokens: Long,
              maxEpochs: Int = 1): DataFrame = {
    require(budgetTokens >= 1, s"budgetTokens must be >= 1, got $budgetTokens")
    require(maxEpochs >= 1, s"maxEpochs must be >= 1, got $maxEpochs")
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      "weights must be non-empty with positive ppm shares")
    require(weights.values.sum == 1000000L,
      s"target shares must sum to 1e6 ppm, got ${weights.values.sum}")
    val dec = "decimal(38,0)"
    val spark = df.sparkSession
    import spark.implicits._
    val wf = weights.toSeq.toDF("source", "target_ppm")
    val avail = df.groupBy(col(sourceCol).cast("string").as("source"))
      .agg(sum(col(tokensCol).cast("long")).as("__av"))
    val base = wf.join(avail, Seq("source"), "left")
      .select(col("source"), col("target_ppm"),
        coalesce(col("__av"), lit(0L)).as("avail_tokens"),
        (coalesce(col("__av"), lit(0L)) * maxEpochs).as("__cap"))
    // EXACT saturation order (r10 verdict nit): the water-filling rank on
    // cap/weight is the integer pair (cap DIV w, ((cap % w)·10¹²) DIV w) —
    // quotient plus a scaled-remainder refinement. Distinct rationals with
    // denominators ≤ 10⁶ differ by ≥ 10⁻¹² = 1 after the 10¹² scaling, so
    // the floored refinement never collides on genuinely different ratios
    // (and the remainder < 10⁶ keeps the product < 10¹⁸, exact in LONG),
    // while equal ratios share both keys and fall to the source tie-break.
    // A DOUBLE ratio could order engine-dependently below double precision
    // at 10¹⁸-token capacities while the saturation test stayed exact.
    val ratioQ = expr("__cap DIV target_ppm")
    val ratioR = expr("((__cap % target_ppm) * 1000000000000L) DIV target_ppm")
    // BOUNDED unpartitioned window: one row per SOURCE (the collapsed
    // mix-plan frame — corpora have tens of sources, not millions), so
    // no RangeScan needed (r12 verdict #7)
    val before = org.apache.spark.sql.expressions.Window.orderBy(ratioQ, ratioR, col("source"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val staged = base
      .withColumn("__pc", coalesce(sum(col("__cap").cast(dec)).over(before),
        lit(0).cast(dec)))
      .withColumn("__pw", coalesce(sum(col("target_ppm").cast(dec)).over(before),
        lit(0).cast(dec)))
      .withColumn("saturated",
        col("__cap").cast(dec) * (lit(1000000L).cast(dec) - col("__pw")) <=
          (lit(budgetTokens).cast(dec) - col("__pc")) * col("target_ppm").cast(dec))
    val sat = staged.agg(
      coalesce(sum(when(col("saturated"), col("__cap")).otherwise(0L).cast(dec)),
        lit(0).cast(dec)).as("__csat"),
      coalesce(sum(when(col("saturated"), col("target_ppm")).otherwise(0L)),
        lit(0L)).as("__wsat"))
    staged.crossJoin(broadcast(sat))
      .withColumn("alloc_tokens",
        when(col("saturated"), col("__cap"))
          .otherwise(expr(
            s"CAST((CAST(target_ppm AS DECIMAL(38,0)) * " +
              s"(CAST($budgetTokens AS DECIMAL(38,0)) - __csat)) " +
              "DIV (1000000 - __wsat) AS DECIMAL(38,0))").cast("long")))
      .select(col("source"), col("avail_tokens"), col("target_ppm"),
        col("__cap").as("capacity_tokens"), col("saturated"),
        col("alloc_tokens"),
        when(col("avail_tokens") > 0,
          expr("(alloc_tokens * 1000L) DIV avail_tokens")).as("epochs_milli"),
        expr(s"(alloc_tokens * 1000000L) DIV ${budgetTokens}L").as("achieved_ppm"))
  }

  /** MULTI-benchmark decontamination in ONE corpus pass — the batch
    * twin of [[contamination]] for the real eval-governance shape
    * (MMLU + GSM8K + HumanEval + … screened together): per-benchmark
    * runs would rescan the 100 TB train side once PER BENCHMARK; here
    * every benchmark's distinct grams are TAGGED with `benchCol` and
    * broadcast together, so the corpus is gram-hashed and scanned
    * exactly once and the per-(doc, benchmark) hit counts fall out of
    * one partial-aggregated groupBy. Identical per-benchmark semantics
    * to [[contamination]] (distinct train grams per doc, a gram shared
    * by two benchmarks counts toward each).
    *
    * Output: `idCol, benchmark, n_overlap` (≥ minHits only — absence
    * means clean for that benchmark). */
  def contaminationBatch(train: DataFrame, benches: DataFrame,
                         idCol: String, textCol: String,
                         benchCol: String, n: Int = 8,
                         minHits: Int = 1): DataFrame = {
    val trainGrams = train.select(col(idCol),
      explode(ngramHashes(col(textCol), n)).as("__g"))
    val benchGrams = benches.select(col(benchCol).as("benchmark"),
      explode(ngramHashes(col(textCol), n)).as("__g")).distinct()
    trainGrams
      .join(broadcast(benchGrams), "__g")
      .groupBy(col(idCol), col("benchmark"))
      .agg(count(lit(1)).as("n_overlap"))
      .where(col("n_overlap") >= minHits)
  }

  /** Deterministic train/val/test split on a 16-way md5 digit of the id —
    * content-independent, stable across runs and engines (md5 exists in
    * both Spark and DuckDB, unlike xxhash64), and a pure map: no shuffle,
    * no state, works identically on a stream. `bucket` is the first hex
    * digit (0–15) of md5(id); callers carve ranges out of it (e.g. 0–13
    * train / 14 val / 15 test = 87.5 / 6.25 / 6.25). */
  def splitBucket(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 1), 16, 10).cast("int")

  /** LEAKAGE-SAFE split: bucket by the near-dup GROUP's id, not the
    * document's own. Near-duplicates scattered across train and test are
    * silent eval contamination — [[splitBucket]] on doc id does exactly
    * that scatter, because two near-identical docs have unrelated ids.
    * Feed the (id, group_id) frame from [[Dedup.connectedComponents]]
    * (group_id = min member id) and every member of a group hashes to the
    * SAME fold by construction.
    *
    * Plan: one equi join on id — (id, group_id) longs only, both sides
    * hash-partitioned; the groups build already paid its own shuffles.
    * Docs absent from `groups` fall back to their own id (a groups frame
    * that omits singletons stays valid). Output: input + `group_key` +
    * `bucket` (0–15, carve folds from it as with [[splitBucket]]). */
  def groupAwareSplitBucket(df: DataFrame, idCol: String,
                            groups: DataFrame): DataFrame = {
    // loud reserved-name guard (the quantileBuckets convention): silently
    // overwriting an existing bucket/group_key would hand downstream fold
    // carving the WRONG assignment with no error
    Seq("group_key", "bucket", "__gid", "__grp").foreach(c =>
      require(!df.columns.contains(c),
        s"groupAwareSplitBucket: input already has a '$c' column"))
    // a silent long cast on string ids would NULL the join and quietly
    // fall EVERY doc back to its own id — re-scattering near-dup groups
    // across folds, the exact leakage this op exists to prevent
    Search.requireIntegralId(df, idCol, "groupAwareSplitBucket")
    Search.requireIntegralId(groups, "id", "groupAwareSplitBucket", role = "groups id")
    Search.requireIntegralId(groups, "group_id", "groupAwareSplitBucket", role = "group_id")
    // duplicate id rows in a hand-built groups frame would FAN OUT doc
    // rows through the join; deterministic min-group per id (one small
    // keys-sized aggregate) instead of an arbitrary dropDuplicates pick
    val g1 = groups.select(col("id").cast("long").as("__gid"),
        col("group_id").cast("long").as("__grp"))
      .groupBy("__gid").agg(min(col("__grp")).as("__grp"))
    df.join(g1, col(idCol).cast("long") === col("__gid"), "left")
      .withColumn("group_key", coalesce(col("__grp"), col(idCol).cast("long")))
      .withColumn("bucket", splitBucket(col("group_key")))
      .drop("__gid", "__grp")
  }

  /** Source-level (domain-level) filtering — the C4/RefinedWeb curation
    * step that drops entire low-quality SOURCES rather than individual
    * documents (a domain whose average document is spam poisons even its
    * above-average pages). Keeps every doc whose source's MEAN
    * [[qualityScore]] is ≥ `minMeanQuality` (0–1000 scale).
    *
    * The mean test is integer-exact: `sum(q) ≥ minMeanQuality · count`
    * — no float division to drift cross-engine. Docs with a NULL source
    * form their own group and pass or fail TOGETHER on that group's mean
    * (the verdict join is null-safe — a plain equi-join would silently
    * drop every unattributed doc however good its group). Plan shape: one
    * scan computes the quality expressions map-side (materialized —
    * consumed by both the aggregate and the final filter join); the
    * per-source aggregate partial-aggregates map-side and the verdict
    * table — one row per source, tiny by construction — broadcasts back,
    * so the corpus never shuffles. */
  def sourceFilter(df: DataFrame, idCol: String, textCol: String,
                   sourceCol: String, minMeanQuality: Int): DataFrame = {
    val q = Materialize.cutLazy(qualityScore(df, textCol)
      .select(col(idCol), col(sourceCol), col("quality_score")))
    val verdict = q.groupBy(sourceCol)
      .agg(sum("quality_score").as("__sum"), count(lit(1)).as("__n"))
      .where(col("__sum") >= lit(minMeanQuality.toLong) * col("__n"))
      .select(col(sourceCol).as("__vsrc"))
    q.join(broadcast(verdict), col(sourceCol) <=> col("__vsrc"))
      .select(col(idCol), col(sourceCol), col("quality_score"))
  }

  /** Column-level data profiling — the monitoring pass a curation pipeline
    * runs per batch to catch schema/content drift (null spikes, cardinality
    * collapse, truncated text). One row per profiled column: nulls, exact
    * distinct count, min/max as strings. ONE aggregate pass over the data
    * (every stat partial-aggregates map-side); the per-column rows are
    * unpivoted from that single row, not one scan per column. */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap { c =>
      Seq(sum(col(c).isNull.cast("long")).as(s"__nn_$c"),
        count_distinct(col(c)).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__mn_$c"),
        max(col(c)).cast("string").as(s"__mx_$c"))
    }
    val one = df.agg(count(lit(1)).as("__rows"), aggs: _*)
    one.select(col("__rows"), explode(array(cols.map(c => struct(
        lit(c).as("col_name"),
        col(s"__nn_$c").as("n_nulls"),
        col(s"__nd_$c").as("n_distinct"),
        col(s"__mn_$c").as("min_value"),
        col(s"__mx_$c").as("max_value"))): _*)).as("__p"))
      .select(col("__p.col_name").as("col_name"), col("__rows").cast("long").as("n_rows"),
        col("__p.n_nulls").cast("long").as("n_nulls"),
        col("__p.n_distinct").cast("long").as("n_distinct"),
        col("__p.min_value"), col("__p.max_value"))
  }

  /** 256-way sampling bucket: the first two md5 hex digits of the id
    * (0–255). Same construction as [[splitBucket]], one more digit of
    * resolution so per-stratum fractions quantize to 1/256 steps. */
  def sampleBucket(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 2), 16, 10).cast("int")

  /** 65536-way sampling bucket: the first four md5 hex digits (0–65535).
    * The high-resolution variant for [[sourceMix]], where per-source cut
    * granularity bounds how far realized counts can undershoot the recipe
    * share (≤ n_s/65536 rows per source vs n_s/256 with [[sampleBucket]]). */
  def sampleBucket16(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 4), 16, 10).cast("int")

  /** Deterministic stratified sampling: keep a row iff its [[sampleBucket]]
    * falls below `floor(fraction(stratum) * 256)` — e.g. rebalancing a
    * corpus by language before training. Content-independent, identical
    * across engines and runs, and a PURE MAP (no shuffle, no state): works
    * unchanged on a stream and composes with any downstream op. Fractions
    * quantize to 1/256 (floor), so fraction 0.5 keeps buckets 0–127
    * exactly. Strata absent from `fractions` use `defaultFraction`. */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
                       fractions: Map[String, Double],
                       defaultFraction: Double = 0.0): DataFrame = {
    def thresh(f: Double): Int = {
      require(f >= 0.0 && f <= 1.0, s"fraction must be in [0,1], got $f")
      math.floor(f * 256).toInt
    }
    // sorted: Map iteration order is unspecified and the when-chain should
    // produce the same plan every run (conditions are disjoint either way)
    val cut = fractions.toSeq.sortBy(_._1).foldRight(lit(thresh(defaultFraction)): Column) {
      case ((s, f), acc) => when(col(stratumCol) === s, lit(thresh(f))).otherwise(acc)
    }
    df.where(sampleBucket(col(idCol)) < cut)
  }

  /** Unicode normalization ([[graft.functions.UnicodeNormalize]]): pin
    * composed/decomposed forms BEFORE any hash/shingle/dedup equality.
    * `form` ∈ NFC | NFD | NFKC | NFKD. */
  def normalizeUnicode(text: Column, form: String = "NFC"): Column =
    E.column(graft.functions.UnicodeNormalize(E.expression(text), form))

  /** zlib-ratio redundancy signal ([[graft.functions.CompressionRatioPpm]]):
    * deflate bytes / raw bytes in ppm — low = boilerplate/templated/
    * repetitive, ~1e6 = incompressible junk. */
  def compressionRatio(text: Column): Column =
    E.column(graft.functions.CompressionRatioPpm(E.expression(text)))

  /** Distribution DRIFT between two corpus snapshots — the monitoring
    * pass that catches "this week's crawl is suddenly all short docs"
    * before it poisons training: both sides bin a metric column into the
    * SAME fixed integer histogram (one partial-agg pass each — map-side
    * combine makes the shuffled state `bins` rows however big the
    * corpus), aligned on a full outer join over the tiny bin table.
    * ALL-INTEGER binning and ppm proportions (floor division), so the
    * histogram is bit-identical cross-engine and oracle-gated exactly;
    * derived scores that need floats (PSI = Σ(pA−pB)·ln(pA/pB)) are
    * computed FROM the gated ppm columns downstream (spec-asserted with
    * tolerance — ln is not cross-engine-exact).
    * Output: (bin, n_a, n_b, ppm_a, ppm_b), every bin present. */
  def drift(a: DataFrame, b: DataFrame, valueCol: String, bins: Int,
            lo: Long, hi: Long): DataFrame = {
    require(bins >= 2 && hi > lo, s"need bins >= 2 and hi > lo, got bins=$bins [$lo,$hi]")
    val span = hi - lo + 1
    require(span <= Long.MaxValue / bins,
      s"[$lo,$hi] x $bins bins overflows the bin arithmetic; narrow the range")
    // NULL metric rows are excluded from counts AND denominators (the
    // documented contract, mirrored in the oracle); values are clamped
    // into [lo,hi] BEFORE the multiply so an extreme value lands in the
    // edge bin instead of overflowing the product
    def hist(df: DataFrame, side: String): DataFrame =
      df.where(col(valueCol).isNotNull)
        .select(expr(
          s"CAST(((least($hi, greatest($lo, $valueCol)) - $lo) * $bins) DIV $span AS INT)")
          .as("bin"))
        .groupBy("bin").agg(count(lit(1)).as(s"n_$side"))
    val spark = a.sparkSession
    import spark.implicits._
    val allBins = (0 until bins).toDF("bin")
    allBins
      .join(hist(a, "a"), Seq("bin"), "left")
      .join(hist(b, "b"), Seq("bin"), "left")
      .na.fill(0L, Seq("n_a", "n_b"))
      .withColumn("ppm_a", expr("n_a * 1000000 DIV greatest(1, sum(n_a) OVER ())"))
      .withColumn("ppm_b", expr("n_b * 1000000 DIV greatest(1, sum(n_b) OVER ())"))
      .orderBy("bin")
  }

  /** PSI — population stability index (r11), the industry-standard
    * drift SCORE over a [[drift]] histogram, graduated from the
    * float-spec note on [[drift]] to an EXACT integer readout via the
    * house [[graft.functions.Lg64]] piecewise-linear log2 (the sourceKl
    * machinery — both engines replay it bit-for-bit, unlike `ln`):
    *
    *   psi_millibits = Σ_bins (ppmA − ppmB) ·
    *                   (lg64(max(1, ppmA)) − lg64(max(1, ppmB)))
    *                   · 1000 DIV (64 · 10⁶)
    *
    * Zero bins clamp to 1 ppm (the documented ε — the standard PSI
    * epsilon convention, replayed not approximated; the log base is 2,
    * so score against base-2 rules of thumb or multiply by ln2 ≈ 0.693
    * to compare with the ln-based 0.1/0.25 folklore thresholds). One
    * row: `n_a, n_b, psi_millibits`. Same plan as [[drift]] plus one
    * fold over the `bins`-row frame. */
  def psi(a: DataFrame, b: DataFrame, valueCol: String, bins: Int,
          lo: Long, hi: Long): DataFrame = {
    def lg(x: String) = graft.functions.Lg64.sql(x)
    drift(a, b, valueCol, bins, lo, hi)
      .groupBy()
      .agg(sum("n_a").as("n_a"), sum("n_b").as("n_b"),
        sum(expr(
          s"(ppm_a - ppm_b) * (${lg("greatest(1L, ppm_a)")} - ${lg("greatest(1L, ppm_b)")})"))
          .as("__s"))
      .selectExpr("n_a", "n_b",
        "CAST(__s * 1000 DIV (64 * 1000000) AS BIGINT) AS psi_millibits")
  }

  /** JENSEN–SHANNON divergence (r11) — [[psi]]'s bounded, symmetric
    * sibling over the same [[drift]] histogram: where PSI explodes on
    * bins one side lacks entirely, JS stays in [0, 1] bit — the score
    * to alert on when snapshots can have genuinely disjoint support
    * (a new source appears, a format vanishes). Exact via the same
    * Lg64 integer log2, with the midpoint folded in integer ppm:
    *
    *   js_millibits = Σ_bins [ pa·(lg64(2·pa') − lg64(pa'+pb'))
    *                         + pb·(lg64(2·pb') − lg64(pa'+pb')) ]
    *                  · 1000 DIV (2 · 64 · 10⁶),   p' = max(1, p)
    *
    * (the 1-ppm clamp only guards lg64's domain; a genuinely-zero side
    * contributes its full lg(2) ≈ 1-bit term through the OTHER side's
    * mass, which is what keeps JS bounded). The final sum is clamped at
    * 0 before the divide (r11 advice): Lg64's piecewise-linear chord
    * under-reads log2 by up to ~0.086 bits, and when both sides sit
    * mid-octave while their sum lands near a power of two the per-bin
    * approximation error can exceed the true non-negative JS term — the
    * clamp keeps the documented [0, 1]-bit bound honest (mirrored in
    * the oracle, so the hash gate still holds). One row: `n_a, n_b,
    * js_millibits`. Same plan as [[drift]] + one fold. */
  def jsDivergence(a: DataFrame, b: DataFrame, valueCol: String, bins: Int,
                   lo: Long, hi: Long): DataFrame = {
    def lg(x: String) = graft.functions.Lg64.sql(x)
    drift(a, b, valueCol, bins, lo, hi)
      .selectExpr("n_a", "n_b",
        "greatest(1L, ppm_a) AS pa", "greatest(1L, ppm_b) AS pb",
        "ppm_a", "ppm_b")
      .groupBy()
      .agg(sum("n_a").as("n_a"), sum("n_b").as("n_b"),
        sum(expr(
          s"ppm_a * (${lg("2 * pa")} - ${lg("pa + pb")}) + ppm_b * (${lg("2 * pb")} - ${lg("pa + pb")})"))
          .as("__s"))
      .selectExpr("n_a", "n_b",
        "CAST(greatest(0L, __s) * 1000 DIV (2 * 64 * 1000000) AS BIGINT) AS js_millibits")
  }

  /** Deterministic per-group k-sample — the "pull k exemplar docs per
    * language/source" step (eval-set construction, manual QA batches,
    * per-stratum debugging) WITHOUT a per-group window sort: bottom-k by
    * a content-independent md5 rank key through the bounded two-phase
    * [[graft.functions.TopKPairs]] aggregate, so each task reduces its
    * slice of a group to ≤ k entries map-side and only k-sized states
    * shuffle (`row_number() OVER (PARTITION BY group)` ships EVERY row of
    * a group to one reducer — a straggler when one source is 10^9 docs).
    *
    * The rank key — the first 60 bits of md5(id), ties on id — is
    * deterministic and engine-portable (DuckDB: `CAST('0x' || substr(md5,
    * 1, 15) AS BIGINT)`), so the selection is reproducible forever and
    * oracle-gated exactly. Output: (groupCol, rank 1..k, idCol). */
  def samplePerGroup(df: DataFrame, groupCol: String, idCol: String, k: Int): DataFrame = {
    // integral ids only (the TopKPairs.perGroup contract): a silent
    // cast("long") on a string id would null out every row and return an
    // EMPTY sample with no error
    val idType = df.schema(idCol).dataType
    val integral = idType match {
      case org.apache.spark.sql.types.ByteType | org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.LongType => true
      case d: org.apache.spark.sql.types.DecimalType => d.scale == 0
      case _ => false
    }
    require(integral,
      s"samplePerGroup id column '$idCol' must be an integral type, got $idType")
    val key = conv(substring(md5(col(idCol).cast("string")), 1, 15), 16, 10).cast("long")
    val agg = E.column(graft.functions.TopKPairs(
      E.expression(-key), E.expression(col(idCol).cast("long")), k).toAggregateExpression())
    df.groupBy(groupCol).agg(agg.as("__s"))
      .select(col(groupCol), posexplode(col("__s")).as(Seq("__pos", "__e")))
      .select(col(groupCol), (col("__pos") + 1).cast("int").as("rank"),
        col("__e.id").as(idCol))
  }

  /** Deterministic PER-ROW weighted sampling: keep a row with probability
    * `weightPpm / 10⁶`, decided by its own id — the "quality-weighted
    * downsample" step (keep high-quality docs at full rate, tail quality
    * at their score). The keep test cross-multiplies integers —
    * `bucket · 10⁶ < weightPpm · 65536` over the 65536-way md5 bucket —
    * so there is NO precomputed cut and NO floor loss: realized keep
    * probability is within 1/65536 of the weight, bit-identical across
    * engines/runs, and the decision is a PURE MAP (streams, composes,
    * no state). Weights outside [0, 10⁶] clamp naturally (≤0 keeps
    * nothing, ≥10⁶ keeps everything). */
  def weightedSample(df: DataFrame, idCol: String, weightPpm: Column): DataFrame =
    df.where(sampleBucket16(col(idCol)).cast("long") * 1000000L <
      weightPpm.cast("long") * 65536L)

  /** Corpus MIXING to target proportions — the "data recipe" step of a
    * training pipeline: given per-source target weights (ppm), keep the
    * LARGEST total corpus whose source composition matches the recipe.
    * The binding source sets the total (T = minₛ ⌊n_s·10⁶ / w_s⌋ — the
    * classic max-feasible-mixture bound); every other source downsamples
    * to its share k_s = ⌊w_s·T / 10⁶⌋ via a deterministic 65536-way md5
    * bucket ([[sampleBucket16]]; cut_s = ⌊k_s·65536 / n_s⌋).
    *
    * GRANULARITY: the cut quantizes each source's keep fraction to
    * 1/65536 steps (floor), so the realized count can undershoot k_s by
    * up to ~n_s/65536 rows — 1 row per 65k docs of a source, vs the
    * 1/256 steps (up to ~n_s/256 rows) of [[stratifiedSample]]'s bucket.
    * "Matches the recipe" means within that quantization, never over.
    *
    * All arithmetic is INTEGER (ppm weights, floor division) so the keep
    * decision is bit-identical across engines and runs. Sources absent
    * from `weightsPpm` are dropped (a recipe is exhaustive); a listed
    * source missing from the corpus makes the recipe infeasible → empty
    * output (loudly wrong beats silently skewed).
    *
    * Plan shape: one tiny per-source count aggregate (collected — one row
    * per source), then the keep filter is a PURE MAP over the corpus: no
    * shuffle, no join, composes downstream. The count pass makes this a
    * batch op; for streams, compute cuts on a batch profile and apply
    * [[stratifiedSample]] with the derived fractions. */
  def sourceMix(df: DataFrame, idCol: String, sourceCol: String,
                weightsPpm: Map[String, Long]): DataFrame = {
    require(weightsPpm.nonEmpty, "sourceMix needs at least one target weight")
    require(weightsPpm.values.forall(_ > 0), s"weights must be positive ppm: $weightsPpm")
    val counts = df.groupBy(sourceCol).agg(count(lit(1)).as("__n"))
      .collect().map(r => (Option(r.get(0)).map(_.toString).orNull, r.getLong(1))).toMap
    val total = weightsPpm.map { case (s, w) => counts.getOrElse(s, 0L) * 1000000L / w }.min
    val cut = weightsPpm.toSeq.sortBy(_._1).foldRight(lit(0): Column) {
      case ((s, w), acc) =>
        val n = counts.getOrElse(s, 0L)
        val keep = w * total / 1000000L
        val c = if (n == 0) 0 else math.min(65536L, keep * 65536L / n).toInt
        when(col(sourceCol) === s, lit(c)).otherwise(acc)
    }
    df.where(sampleBucket16(col(idCol)) < cut)
  }

  /** Corpus-trained bigram language-model scoring — the classic "how
    * typical is this document of the corpus" signal (cheap stand-in for
    * model perplexity in curation pipelines; low scores flag gibberish /
    * OCR noise, suspiciously high ones flag boilerplate).
    *
    * P(w2 | w1) is estimated from the corpus itself as c(w1,w2) / c(w1·)
    * (c(w1·) = bigrams starting with w1). Per-doc output: `n_bigrams`,
    * `ppm_sum` = Σ floor(1e6·c2 / c1) over the doc's bigrams, and their
    * ratio `lm_ppm` — all INTEGER arithmetic (1e6·c2 DIV c1), so the
    * DuckDB oracle matches bit-for-bit where a log-prob would drift ulps.
    *
    * Plan shape: the exploded bigram stream is materialized once and
    * consumed twice (bigram counts, re-join); the continuation count
    * c(w1·) is NOT a third pass over the grams — it is Σ_w2 c(w1,w2),
    * rolled up from the already-aggregated bigram table (vocabulary²-
    * sized, ≪ corpus). The probability join co-partitions grams and
    * counts on (w1,w2), and the per-doc rollup is one more keyed shuffle.
    * Docs with < 2 words survive with zero counts (left join back). */
  def bigramLmScore(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // single-pass WordGrams (one tokenize, one slide — see ngramHashes for
    // why not the transform-lambda form), split back into (w1, w2) AFTER the
    // explode: tokens contain no whitespace, so each bigram has exactly one
    // space and substring_index on the exploded scalar is O(gram), not
    // O(document)
    val grams = Materialize.cutLazy(df
      .select(col(idCol), explode(E.column(WordGrams(E.expression(col(textCol)), 2))).as("__bg"))
      .select(col(idCol),
        substring_index(col("__bg"), " ", 1).as("w1"),
        substring_index(col("__bg"), " ", -1).as("w2")))
    val bi = Materialize.cutLazy(grams.groupBy("w1", "w2").agg(count(lit(1)).as("c2")))
    val uni = bi.groupBy("w1").agg(sum("c2").as("c1")) // c(w1·) from the small table
    val probs = bi.join(uni, "w1")
      .select(col("w1"), col("w2"), expr("1000000 * c2 DIV c1").as("ppm"))
    val scored = grams.join(probs, Seq("w1", "w2"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_bigrams"), sum("ppm").as("ppm_sum"))
    df.select(col(idCol))
      .join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("ppm_sum"), lit(0L)).as("ppm_sum"),
        coalesce(expr("ppm_sum DIV n_bigrams"), lit(0L)).as("lm_ppm"))
  }

  /** Corpus collocations: the `k` adjacent word pairs most over-represented
    * vs independence — classic PMI-style collocation mining ("new york",
    * "machine learning"), here as the integer LIFT in ppm:
    *
    *   lift_ppm(a,b) = ((c_ab · 10⁶) DIV c_a) · T DIV c_b
    *
    * (T = total tokens; = 10⁶·P(ab)/(P(a)·P(b)) up to the two documented
    * staged floors — the same quantity as exp(PMI), monotone in PMI, and
    * integer-exact cross-engine where a log would drift ulps. The floors
    * are staged, (…DIV c_a)·T DIV c_b, so no intermediate exceeds
    * c_ab·10⁶·T ≈ 10²⁷ territory — the first floor caps the left factor
    * at ~10⁶·tf ratios before T multiplies in.) Pairs below `minCount`
    * occurrences are noise-floored out BEFORE ranking — rare pairs
    * otherwise dominate any PMI-family score.
    *
    * Output: `rank, w1, w2, n_ab, lift_ppm`, ordered by (lift_ppm DESC,
    * w1 ASC, w2 ASC — UTF-8 byte order both engines).
    *
    * Plan shape: one WordGrams slide per doc (no per-gram re-tokenize),
    * ONE bigram aggregate (vocabulary²-bounded, far smaller than the
    * corpus) from which both unigram margins roll up (w1 margin directly;
    * w2 margin re-aggregated from the same small table — the token
    * stream is touched once); ranking is the bounded global
    * [[graft.functions.TopKStrings]] over "w1 w2" keys (space 0x20 <
    * every printable byte, so concat order IS (w1, w2) pair order for
    * printable tokens; a token carrying a raw control byte < 0x20 — which
    * the \s+ tokenizer does not strip for 0x00-0x08/0x0E-0x1F — could
    * flip the DOCUMENTED tie order on exact lift ties; normalize such
    * bytes upstream if they occur), counts re-attached by broadcasting
    * the k winners against the small bigram table. */
  def collocations(df: DataFrame, textCol: String, minCount: Long,
                   k: Int): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    val grams = df
      .select(explode(E.column(WordGrams(E.expression(col(textCol)), 2))).as("__bg"))
      .select(substring_index(col("__bg"), " ", 1).as("w1"),
        substring_index(col("__bg"), " ", -1).as("w2"))
    val bi = Materialize.cutLazy(grams.groupBy("w1", "w2").agg(count(lit(1)).as("c_ab")))
    val uniA = bi.groupBy("w1").agg(sum("c_ab").as("c_a"))
    val uniB = bi.groupBy("w2").agg(sum("c_ab").as("c_b"))
    // T, c_a, c_b all live on the same measure — bigram SLOTS (tokens-1
    // per doc): c_a is the first-position margin, c_b the second-position
    // margin, T = sum(c_ab) their common total, so lift is a proper
    // ratio-of-frequencies on one sample space.
    val t = bi.agg(coalesce(sum("c_ab"), lit(0L))).head.getLong(0) // 0 on an empty corpus → empty output
    val scored = bi.where(col("c_ab") >= minCount)
      .join(uniA, "w1").join(uniB, "w2")
      .select(col("w1"), col("w2"), col("c_ab"),
        expr(s"((c_ab * 1000000L) DIV c_a) * ${t}L DIV c_b").as("lift_ppm"))
    val agg = E.column(graft.functions.TopKStrings(
      E.expression(col("lift_ppm")), E.expression(concat_ws(" ", col("w1"), col("w2"))),
      k).toAggregateExpression())
    val top = scored.agg(agg.as("__top"))
      .select(posexplode(col("__top")).as(Seq("__pos", "__e")))
      .select((col("__pos") + 1).cast("int").as("rank"),
        substring_index(col("__e.item"), " ", 1).as("w1"),
        substring_index(col("__e.item"), " ", -1).as("w2"),
        col("__e.score").as("lift_ppm"))
    broadcast(top).join(scored.select("w1", "w2", "c_ab"), Seq("w1", "w2"))
      .select(col("rank"), col("w1"), col("w2"), col("c_ab").as("n_ab"), col("lift_ppm"))
      .orderBy("rank")
  }

  /** Sequence packing: lay documents out into fixed-size context windows
    * (the "pack to 4096 tokens" step before tokenized training). Documents
    * are sharded (`idCol % shards` — mirrorable arithmetic), and within a
    * shard a running token prefix-sum assigns each doc the pack its FIRST
    * token lands in, plus its offset inside that pack. Docs stay WHOLE —
    * packs overflow/underfill around doc boundaries; [[packChop]] is the
    * splitting complement (exact-capacity bins, docs split at boundaries).
    *
    * Scale shape: one shuffle (the per-shard window); shards bound the
    * window's partition size, so no reducer sees more than corpus/shards
    * rows — shards should scale with the cluster, not the corpus. Output:
    * idCol, shard, n_tokens, pack_id, offset_tokens. */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
                    contextTokens: Int, shards: Int = 32): DataFrame = {
    // ROWS frame, not the default RANGE: with RANGE, duplicate ids are
    // peers and share one running sum — overlapping token ranges
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    df.withColumn("shard", (col(idCol) % shards).cast("int"))
      .withColumn("n_tokens", size(words(col(textCol))).cast("long"))
      .withColumn("__end", sum(col("n_tokens")).over(w))
      .withColumn("__start", col("__end") - col("n_tokens"))
      .withColumn("pack_id", floor(col("__start") / contextTokens).cast("long"))
      .withColumn("offset_tokens", (col("__start") % contextTokens).cast("long"))
      .select(col(idCol), col("shard"), col("n_tokens"), col("pack_id"), col("offset_tokens"))
  }

  /** Fixed-window chunking: one output row per `chunkWords`-word window
    * with a stable (doc_id, chunk_id) key — the context-window prep stage
    * of a training pipeline. Single-pass WordChunks expression (one
    * tokenize per document — the transform-lambda form re-evaluated the
    * split once per chunk, O(n_words²/chunkWords) on heavy-tailed docs).
    * NULL text keeps its historical contract: one (0, NULL) chunk row. */
  def wordChunks(df: DataFrame, idCol: String, textCol: String,
                 chunkWords: Int = 16): DataFrame = {
    val chunks = coalesce(
      E.column(graft.functions.WordChunks(E.expression(col(textCol)), chunkWords)),
      array(lit(null).cast("string")))
    df.select(col(idCol), posexplode(chunks).as(Seq("chunk_id", "chunk")))
      .withColumn("n_chars", length(col("chunk")).cast("long"))
  }

  /** ROUGE-N overlap (Lin '04) between a reference and a candidate text
    * column (r14) — the summarization/extraction EVAL the engine's
    * n-gram machinery was never pointed at: per row, the CLIPPED n-gram
    * overlap (each distinct candidate gram counts at most its reference
    * multiplicity — the clipping is what stops "the the the" gaming
    * precision) read out as exact integer ppm recall / precision / F1:
    *
    *   overlap = Σ_{g ∈ distinct(cand)} min(#cand(g), #ref(g))
    *   recall = overlap/|ref grams|, precision = overlap/|cand grams|,
    *   F1 = 2·overlap/(|ref| + |cand|)   (all ⌊·10⁶⌋, truncating DIV)
    *
    * PURE MAP: both texts live in the row, grams build with one in-row
    * transform, the clipped sum is one fold over the distinct candidate
    * grams — no explode, no shuffle, stream-safe; per-row cost
    * O(distinct · (|cand| + |ref|)), fine at document scale and
    * embarrassingly parallel at corpus scale. A side without enough
    * words for one gram reads NULL metrics (0/0 is not a score).
    * Output appends: `n_ref_grams, n_cand_grams, overlap_grams,
    * rouge_recall_ppm, rouge_precision_ppm, rouge_f1_ppm`. */
  def rougeN(df: DataFrame, refCol: String, candCol: String,
             n: Int = 2): DataFrame = {
    require(n >= 1 && n <= 8, s"n must be in [1, 8], got $n")
    def grams(c: String) =
      s"""CASE WHEN size(__w$c) >= $n THEN
            transform(sequence(0, size(__w$c) - $n), i ->
              ${(0 until n).map(j => s"element_at(__w$c, i + ${j + 1})")
                 .mkString("concat_ws(' ', ", ", ", ")")})
          ELSE CAST(array() AS ARRAY<STRING>) END"""
    df.withColumn("__wr", words(col(refCol)))
      .withColumn("__wc", words(col(candCol)))
      .withColumn("__gr", expr(grams("r")))
      .withColumn("__gc", expr(grams("c")))
      .withColumn("overlap_grams", expr(
        """aggregate(array_distinct(__gc), 0L, (acc, g) ->
             acc + least(size(filter(__gc, x -> x = g)),
                         size(filter(__gr, x -> x = g))))"""))
      .withColumn("n_ref_grams", size(col("__gr")).cast("long"))
      .withColumn("n_cand_grams", size(col("__gc")).cast("long"))
      .withColumn("rouge_recall_ppm",
        when(col("n_ref_grams") > 0,
          expr("(overlap_grams * 1000000) DIV n_ref_grams")))
      .withColumn("rouge_precision_ppm",
        when(col("n_cand_grams") > 0,
          expr("(overlap_grams * 1000000) DIV n_cand_grams")))
      .withColumn("rouge_f1_ppm",
        when(col("n_ref_grams") + col("n_cand_grams") > 0,
          expr("(2 * overlap_grams * 1000000) DIV (n_ref_grams + n_cand_grams)")))
      .withColumn("overlap_grams",
        when(col("n_ref_grams") + col("n_cand_grams") > 0, col("overlap_grams")))
      .drop("__wr", "__wc", "__gr", "__gc")
  }

  /** SENTENCE-boundary chunking (r14) — the RAG-prep variant of
    * [[wordChunks]]: windows of `maxSentences` sentences advancing by
    * `maxSentences − overlap`, so a fact straddling a window edge is
    * whole in the next one AND no window tears mid-sentence (the word
    * windows' failure mode on prose). Sentences are the readability
    * heuristic's: maximal `[.!?]+` runs terminate, a trailing
    * unterminated fragment is its own sentence — extracted with the
    * RE2-safe leftmost-first pattern `[^.!?]+[.!?]+|[^.!?]+` (no
    * lookbehind — java.util.regex and RE2 agree), trimmed, empties
    * dropped (a bare terminator run is a boundary, not a sentence).
    *
    * Trailing windows stop once a window reaches the last sentence:
    * n ≤ maxSentences is ONE chunk, else 1 + ⌈(n − maxSentences)/stride⌉
    * — never a redundant tail window wholly inside its predecessor.
    * NULL text and sentence-free text keep the wordChunks contract: one
    * (0, NULL) chunk row. Pure map (one regex pass + one in-row
    * transform), stream-safe, no shuffle. Output: `idCol, chunk_id,
    * chunk, n_sents, n_chars`. */
  def sentenceChunks(df: DataFrame, idCol: String, textCol: String,
                     maxSentences: Int, overlap: Int): DataFrame = {
    require(maxSentences >= 1 && maxSentences <= 4096,
      s"maxSentences must be in [1, 4096], got $maxSentences")
    require(overlap >= 0 && overlap < maxSentences,
      s"overlap must be in [0, maxSentences), got $overlap")
    val stride = maxSentences - overlap
    df.select(col(idCol), col(textCol).as("__t"))
      .withColumn("__s", expr(
        "filter(transform(regexp_extract_all(__t, '[^.!?]+[.!?]+|[^.!?]+', 0), " +
          "x -> trim(x)), x -> length(x) > 0)"))
      .withColumn("__n",
        when(col("__s").isNotNull, size(col("__s"))).otherwise(lit(0)))
      .withColumn("__cks", when(col("__n") > 0, expr(
        s"""transform(
              sequence(0, (greatest(__n - $maxSentences, 0) + ${stride - 1}) DIV $stride),
              k -> named_struct(
                'c', concat_ws(' ', slice(__s, k * $stride + 1, $maxSentences)),
                'ns', least($maxSentences, __n - k * $stride)))"""))
        .otherwise(expr("array(named_struct('c', CAST(NULL AS STRING), 'ns', 0))")))
      .select(col(idCol), posexplode(col("__cks")).as(Seq("chunk_id", "__ck")))
      .select(col(idCol), col("chunk_id"),
        col("__ck.c").as("chunk"), col("__ck.ns").cast("long").as("n_sents"),
        length(col("__ck.c")).cast("long").as("n_chars"))
  }

  /** OVERLAPPING context windows — [[wordChunks]] with a stride: windows
    * of `windowWords` tokens starting every `strideWords` tokens, so
    * `windowWords - strideWords` tokens of context repeat between
    * neighbors (the RAG-retrieval chunking shape: a fact straddling a
    * hard chunk boundary is whole in the next overlapped window). Same
    * single-pass expression, raw-split semantics, and NULL contract as
    * [[wordChunks]]; pure map, stream-safe. */
  def wordChunksOverlap(df: DataFrame, idCol: String, textCol: String,
                        windowWords: Int, strideWords: Int): DataFrame = {
    val chunks = coalesce(
      E.column(graft.functions.WordChunks(E.expression(col(textCol)), windowWords,
        Some(strideWords))),
      array(lit(null).cast("string")))
    df.select(col(idCol), posexplode(chunks).as(Seq("chunk_id", "chunk")))
      .withColumn("n_chars", length(col("chunk")).cast("long"))
  }

  /** Exploded (idCol, __pos, __line, __h, __elig) frame of a text column
    * split on newlines — the shared head of the line-dedup family. Lines
    * shorter than `minLineChars` are marked ineligible: blank lines and
    * short connectors ("===", "-") occur everywhere and would otherwise
    * link every document into one dup family. Hashes (not line strings)
    * are the join/shuffle keys — 8 fixed bytes per line. */
  private def lineFrame(df: DataFrame, idCol: String, textCol: String,
                        minLineChars: Int): DataFrame =
    df.select(col(idCol), posexplode(split(col(textCol), "\n")).as(Seq("__pos", "__line")))
      .withColumn("__h", xxhash64(col("__line")))
      .withColumn("__elig", length(col("__line")) >= minLineChars)

  /** Hashes of eligible lines present in ≥ `minDocs` DISTINCT documents.
    * Per-doc-distinct first (within-doc repeats don't vote), then the
    * doc-count partial-aggregates map-side; the result joins back
    * co-partitioned on the hash. */
  private def dupLineHashes(lines: DataFrame, idCol: String, minDocs: Int): DataFrame =
    lines.where(col("__elig"))
      .select(col(idCol), col("__h")).distinct()
      .groupBy("__h").agg(count(lit(1)).as("__docs"))
      .where(col("__docs") >= minDocs)
      .select(col("__h"), lit(true).as("__dup"))

  /** Corpus-duplicated LINE statistics — the line-granular sibling of
    * [[corpusDupNgrams]] and the signal behind C4/RefinedWeb-style
    * line-level dedup (Raffel et al. 2020 dedup paragraphs/lines repeated
    * across the corpus; boilerplate headers/footers/nav bars are exactly
    * such lines). Per doc: `n_lines`, `n_dup_lines` (occurrences of
    * eligible lines found in ≥ `minDocs` distinct docs), integer
    * `dup_line_ppm`.
    *
    * Scale shape: one explode; the dup-line table derives from a
    * (doc, hash)-distinct + hash-count (both partial-aggregating); the
    * flag join is co-partitioned on the 8-byte hash; one per-doc rollup;
    * left join back so every doc survives. */
  def dupLineStats(df: DataFrame, idCol: String, textCol: String,
                   minDocs: Int = 2, minLineChars: Int = 10): DataFrame = {
    val lines = Materialize.cutLazy(lineFrame(df, idCol, textCol, minLineChars))
    val perDoc = lines.join(dupLineHashes(lines, idCol, minDocs), Seq("__h"), "left")
      .groupBy(idCol).agg(
        count(lit(1)).as("n_lines"),
        sum(when(col("__dup") && col("__elig"), lit(1L)).otherwise(lit(0L))).as("n_dup_lines"))
    df.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_lines"), lit(0L)).as("n_lines"),
        coalesce(col("n_dup_lines"), lit(0L)).as("n_dup_lines"),
        coalesce(expr("1000000 * n_dup_lines DIV n_lines"), lit(0L)).as("dup_line_ppm"))
  }

  /** Line-level dedup REWRITE: drop every eligible line that appears in
    * ≥ `minDocs` distinct documents and reassemble each document's
    * remaining lines in order — the C4 curation step that strips
    * boilerplate from the corpus rather than merely scoring it. Docs
    * whose lines are all removed (or with NULL text) come back as ''.
    *
    * Reassembly is a per-doc collect_list sorted on the line position —
    * bounded by the document's own size (the same bound as the original
    * text column), never by corpus size. Output: (idCol, clean_text). */
  def removeDuplicateLines(df: DataFrame, idCol: String, textCol: String,
                           minDocs: Int = 2, minLineChars: Int = 10): DataFrame = {
    val lines = Materialize.cutLazy(lineFrame(df, idCol, textCol, minLineChars))
    val rebuilt = lines.join(dupLineHashes(lines, idCol, minDocs), Seq("__h"), "left")
      .where(col("__dup").isNull || !col("__elig"))
      .groupBy(idCol).agg(concat_ws("\n",
        transform(array_sort(collect_list(struct(col("__pos"), col("__line")))),
          x => x.getField("__line"))).as("clean_text"))
    df.select(col(idCol)).join(rebuilt, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  /** Within-document repetition signals — the Gopher/MassiveText-style
    * quality rules that catch boilerplate and degenerate (looping) text
    * (Rae et al. 2021, §A1.1: "fraction of characters in the most frequent
    * word 2-gram" / "in duplicated 3-grams"). Per doc:
    *
    *  - `dup_word_ppm` — repeated-word fraction: (n_words − n_distinct) / n_words
    *  - `top_bigram_ppm` — characters covered by the single best-covering
    *    bigram: max over bigrams of count·gram_chars, over total chars.
    *    (max of count·len, not "len of the max-count gram" — the latter is
    *    tie-ambiguous and would drift between engines)
    *  - `dup_trigram_ppm` — characters in trigrams occurring ≥ 2 times:
    *    Σ count·gram_chars over duplicated trigrams, over total chars.
    *    Overlapping occurrences double-count characters — the standard
    *    cheap form of the rule; identical in the oracle by construction.
    *
    * All ratios are integer ppm (`1e6·x DIV y`) — bit-exact cross-engine.
    * Scale shape: ONE explode produces both gram sizes (tagged structs from
    * the single-pass WordGramsTagged expression — one tokenize per document,
    * where the transform-lambda form re-evaluated the split per gram:
    * O(n_words²), a straggler stall on heavy-tailed docs), one (doc, n,
    * gram) count with map-side partials, one per-doc rollup, then a left
    * join back to the scan-side frame (docs under 2 words survive with
    * zeros). No driver work, no UDFs. */
  def repetitionSignals(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = words(col(textCol))
    val tagged = E.column(WordGramsTagged(E.expression(col(textCol)), Seq(2, 3)))
    val cnts = df.select(col(idCol), explode(tagged).as("__t"))
      .groupBy(col(idCol), col("__t.n").as("__n"), col("__t.g").as("__g"))
      .agg(count(lit(1)).as("__c"))
      .withColumn("__chars", col("__c") * length(col("__g")).cast("long"))
    val perDoc = cnts.groupBy(idCol).agg(
      max(when(col("__n") === 2, col("__chars"))).as("__top2"),
      sum(when(col("__n") === 3 && col("__c") >= 2, col("__chars"))).as("__dup3"))
    df.select(col(idCol),
        length(col(textCol)).cast("long").as("__nc"),
        size(w).cast("long").as("n_words"),
        size(array_distinct(w)).cast("long").as("__nd"))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol), col("n_words"),
        when(col("n_words") > 0,
          expr("1000000 * (n_words - __nd) DIV n_words")).otherwise(lit(0L))
          .as("dup_word_ppm"),
        when(col("__nc") > 0,
          coalesce(expr("1000000 * __top2 DIV __nc"), lit(0L))).otherwise(lit(0L))
          .as("top_bigram_ppm"),
        when(col("__nc") > 0,
          coalesce(expr("1000000 * __dup3 DIV __nc"), lit(0L))).otherwise(lit(0L))
          .as("dup_trigram_ppm"))
  }

  /** Cross-document duplicated n-gram fraction — the corpus-level twin of
    * [[repetitionSignals]] and the n-gram-granular form of exact-substring
    * deduplication (Lee et al. 2022, "Deduplicating Training Data Makes
    * Language Models Better": substrings repeated across documents are
    * memorization fuel). Per doc: how much of it also appears verbatim
    * (n consecutive words) in ANOTHER document.
    *
    *  - `n_grams` — distinct word n-grams in the doc (docs under n words → 0)
    *  - `n_dup_grams` — of those, grams present in ≥ 2 distinct docs
    *  - `dup_ngram_ppm` — 1e6·n_dup_grams DIV n_grams
    *
    * Scale shape: the inverted-index recipe. Grams are hashed to 8-byte
    * keys ([[ngramHashes]] — fixed-width longs cross the shuffle, never
    * gram strings); per-doc grams are DISTINCT at the source, so the
    * gram→doc-count aggregate partial-aggregates map-side; the count joins
    * back co-partitioned on the gram key (both sides of the join come out
    * of the same exchange — the gram stream is materialized once and
    * consumed twice); one final per-doc rollup. Short docs survive via the
    * left join back to the scan frame. */
  def corpusDupNgrams(df: DataFrame, idCol: String, textCol: String,
                      n: Int = 8): DataFrame = {
    val grams = Materialize.cutLazy(df.select(col(idCol),
      explode(ngramHashes(col(textCol), n)).as("__g")))
    val docCounts = grams.groupBy("__g").agg(count(lit(1)).as("__docs"))
    val perDoc = grams.join(docCounts, "__g")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("__docs") >= 2, lit(1L)).otherwise(lit(0L))).as("n_dup_grams"))
    df.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_dup_grams"), lit(0L)).as("n_dup_grams"),
        coalesce(expr("1000000 * n_dup_grams DIV n_grams"), lit(0L)).as("dup_ngram_ppm"))
  }

  /** Exact-substring span REMOVAL — the rewrite form of [[corpusDupNgrams]]
    * (Lee et al. 2022 ExactSubstr: substrings repeated across documents are
    * memorization fuel; the cure is cutting the span out of the corpus, not
    * merely scoring it). A token is removed when ANY word `n`-gram covering
    * it occurs in ≥ `minDocs` DISTINCT documents; runs of duplicated grams
    * merge into one excised span by construction (coverage is per token).
    * Like [[removeDuplicateLines]], the span is cut from EVERY document
    * holding it — keep-one-copy would need a global occurrence order, a
    * corpus-wide sequential dependency with no distributed justification.
    *
    * Output per input doc: `n_words`, `n_removed`, `clean_text` (the kept
    * tokens of the SHARED tokenizer stream — lowercased, single-space
    * joined; NULL-text/short docs come back as '' with zero counts).
    *
    * Scale shape: each document is tokenized exactly TWICE — once for the
    * positional token stream (materialized; consumed by the n_words
    * rollup and the anti-join) and once inside the single-pass
    * [[graft.functions.WordGrams]] expression (a lambda would re-split
    * per gram, O(n_words²)); gram strings are hashed to 8-byte keys IN
    * the explode's project, so only (doc, pos, hash) longs ever cross a
    * shuffle. The gram stream is materialized once and consumed twice
    * (dup-table build + coverage probe); the dup table derives from a
    * (doc, hash)-distinct + hash-count, both partial-aggregating;
    * coverage explodes each duplicated gram into its `n` covered
    * positions — output-proportional to the dup volume, never to the
    * corpus; the kept-token anti-join is co-partitioned on (doc, pos);
    * one per-doc rebuild bounded by the doc's own length.
    * 64-bit gram-hash collisions can over-remove a token pair per ~2^32
    * distinct grams — the same (documented) exposure as corpusDupNgrams. */
  def removeDuplicateSpans(df: DataFrame, idCol: String, textCol: String,
                           n: Int = 8, minDocs: Int = 2): DataFrame = {
    require(n > 0 && minDocs >= 2, s"need n > 0, minDocs >= 2; got n=$n minDocs=$minDocs")
    val toks = Materialize.cutLazy(df.select(col(idCol),
      posexplode(words(col(textCol))).as(Seq("__pos", "__w"))))
    val grams = Materialize.cutLazy(df.select(col(idCol),
        posexplode(E.column(WordGrams(E.expression(col(textCol)), n))).as(Seq("__pos", "__gs")))
      .select(col(idCol), col("__pos"), xxhash64(col("__gs")).as("__g")))
    val dup = grams.select(col(idCol), col("__g")).distinct()
      .groupBy("__g").agg(count(lit(1)).as("__docs"))
      .where(col("__docs") >= minDocs)
      .select("__g")
    val covered = grams.join(dup, "__g")
      .select(col(idCol), explode(sequence(col("__pos"), col("__pos") + lit(n - 1))).as("__pos"))
      .distinct()
    val perDoc = toks.join(covered, Seq(idCol, "__pos"), "left_anti")
      .groupBy(idCol).agg(
        count(lit(1)).as("__kept"),
        concat_ws(" ", transform(array_sort(collect_list(struct(col("__pos"), col("__w")))),
          x => x.getField("__w"))).as("clean_text"))
    // n_words rolls up from the SAME materialized token stream — a third
    // words(text) evaluation here would re-tokenize every doc end to end
    val nWords = toks.groupBy(idCol).agg(count(lit(1)).as("__nw"))
    df.select(col(idCol))
      .join(nWords, Seq(idCol), "left")
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("__nw"), lit(0L)).as("n_words"),
        (coalesce(col("__nw"), lit(0L)) - coalesce(col("__kept"), lit(0L))).as("n_removed"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  /** Gopher-style document quality rules (Rae et al. 2021 §A1.1 — the
    * MassiveText filter battery), ALL-INTEGER so the verdict is
    * bit-identical cross-engine (every ratio test is a cross-multiply,
    * never a float division):
    *
    *  - `ok_wordcount` — minWords ≤ n_words ≤ maxWords
    *  - `ok_meanlen`   — mean word length in [3, 10]:
    *                     3·n_words ≤ Σ len(w) ≤ 10·n_words
    *  - `ok_symbols`   — symbol-to-word ratio ≤ 1/10: '#' glyphs plus
    *                     non-overlapping '...' runs, 10·symbols ≤ n_words
    *  - `ok_alpha`     — ≥ 80% of words contain a letter:
    *                     5·n_alpha_words ≥ 4·n_words
    *  - `ok_stopwords` — ≥ 2 distinct hits on the en stopword list
    *                     ([[stopwordHits]] — the published rule's spirit
    *                     with this engine's marker list)
    *  - `gopher_pass`  — AND of the five
    *
    * Empty/NULL docs fail `ok_wordcount` (and so the verdict) rather than
    * erroring. The repetition battery from the same paper is
    * [[repetitionSignals]]; compose both for the full filter.
    *
    * Scale shape: pure per-row projection over ONE scan — no shuffle, no
    * state, stream-safe. Lambdas here range over their own array argument
    * (evaluated once per row), never an outer derived array — the
    * per-element re-evaluation trap does not apply. */
  def gopherRules(df: DataFrame, idCol: String, textCol: String,
                  minWords: Long = 50L, maxWords: Long = 100000L): DataFrame = {
    require(minWords >= 1 && maxWords >= minWords,
      s"need 1 <= minWords <= maxWords, got $minWords..$maxWords")
    val t = col(textCol)
    val w = words(t)
    val nWords = coalesce(size(w).cast("long"), lit(0L))
    val charTotal = coalesce(
      aggregate(w, lit(0L), (acc, x) => acc + length(x)), lit(0L))
    val nAlpha = coalesce(
      size(filter(w, x => x.rlike("[a-z]"))).cast("long"), lit(0L))
    val nHash = coalesce(
      (length(t) - length(replace(t, lit("#"), lit("")))).cast("long"), lit(0L))
    // chars removed by stripping '...' runs; always a multiple of 3
    val ellipsisChars = coalesce(
      (length(t) - length(replace(t, lit("..."), lit("")))).cast("long"), lit(0L))
    val nStop = coalesce(stopwordHits(t, "en").cast("long"), lit(0L))
    df.select(col(idCol),
        nWords.as("n_words"), charTotal.as("char_total"),
        nAlpha.as("n_alpha_words"), nHash.as("__nh"),
        ellipsisChars.as("__ec"), nStop.as("n_stopword_hits"))
      // integral DIV — Column `/` is double division, and the bit-exact
      // contract must not rest on a float-rounding argument
      .withColumn("n_symbols", expr("__nh + __ec DIV 3"))
      .drop("__nh", "__ec")
      .select(col(idCol), col("n_words"), col("char_total"),
        col("n_alpha_words"), col("n_symbols"), col("n_stopword_hits"))
      .withColumn("ok_wordcount",
        col("n_words") >= minWords && col("n_words") <= maxWords)
      .withColumn("ok_meanlen",
        col("n_words") > 0 && lit(3L) * col("n_words") <= col("char_total") &&
          col("char_total") <= lit(10L) * col("n_words"))
      .withColumn("ok_symbols", lit(10L) * col("n_symbols") <= col("n_words"))
      .withColumn("ok_alpha", lit(5L) * col("n_alpha_words") >= lit(4L) * col("n_words"))
      .withColumn("ok_stopwords", col("n_stopword_hits") >= 2L)
      .withColumn("gopher_pass",
        col("ok_wordcount") && col("ok_meanlen") && col("ok_symbols") &&
          col("ok_alpha") && col("ok_stopwords"))
  }

  /** Out-of-vocabulary statistics — per doc: `n_tokens`, `n_oov` (tokens
    * absent from `vocab`), integer `oov_ppm`. The check run before
    * committing to a tokenizer/vocab: a vocab whose OOV rate spikes on
    * some slice will shred that slice into byte fallbacks at training
    * time. `vocab` is a single-column frame of in-vocabulary tokens — a
    * tokenizer vocab is bounded by construction, so it BROADCASTS and
    * the corpus is scanned once, shuffling only for the per-doc rollup.
    * Docs with NULL/empty text survive with zeros. */
  def oovStats(df: DataFrame, idCol: String, textCol: String,
               vocab: DataFrame): DataFrame = {
    val vCol = vocab.columns match {
      case Array(c) => c
      case cs => sys.error(s"vocab must have exactly one column, got ${cs.mkString(",")}")
    }
    val v = vocab.select(col(vCol).cast("string").as("__t")).distinct()
      .select(col("__t"), lit(true).as("__in"))
    val perDoc = df.select(col(idCol), explode(words(col(textCol))).as("__t"))
      .join(broadcast(v), Seq("__t"), "left")
      .groupBy(idCol).agg(count(lit(1)).as("n_tokens"),
        sum(when(col("__in").isNull, 1L).otherwise(0L)).as("n_oov"))
    df.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_oov"), lit(0L)).as("n_oov"),
        coalesce(expr("1000000 * n_oov DIV n_tokens"), lit(0L)).as("oov_ppm"))
  }

  /** Corpus diversity card — one row of type-token ratios, the
    * self-repetition release metric (a corpus whose distinct-gram share
    * collapses is template/boilerplate-heavy however clean each doc
    * looks): `n_docs`, `n_tokens`, `uniq_unigram_ppm` (distinct tokens /
    * tokens), `uniq_bigram_ppm` (distinct word bigrams / bigrams) — both
    * 1e6·x DIV y, 0 on an empty corpus.
    *
    * Scale shape: BOTH gram sizes come from one tokenize pass
    * (WordGramsTagged) and one explode; grams hash to 8-byte keys before
    * the aggregate, so distinct-counting ships longs (distinct over
    * 64-bit hashes — the documented ~2⁻³² collision exposure shared by
    * the gram family); ONE aggregate computes all four gram counts
    * (count_distinct partial-aggregates map-side), cross-joined with the
    * one-row doc count. Exact distinct is the published number;
    * substitute approx_count_distinct when a 100 TB card can tolerate
    * ±2%. */
  def diversityCard(df: DataFrame, textCol: String): DataFrame = {
    val grams = df.select(
        explode(E.column(WordGramsTagged(E.expression(col(textCol)), Seq(1, 2)))).as("__t"))
      .select(col("__t.n").as("__n"), xxhash64(col("__t.g")).as("__h"))
    val gramAgg = grams.agg(
      sum(when(col("__n") === 1, 1L).otherwise(0L)).as("n_tokens"),
      count_distinct(when(col("__n") === 1, col("__h"))).as("__u1"),
      sum(when(col("__n") === 2, 1L).otherwise(0L)).as("__t2"),
      count_distinct(when(col("__n") === 2, col("__h"))).as("__u2"))
    // both sides are one-row aggregates; the broadcast hint states that
    // (and clears the gate session's CartesianGuard)
    df.agg(count(lit(1)).as("n_docs")).crossJoin(broadcast(gramAgg))
      .select(col("n_docs"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(expr("1000000 * __u1 DIV n_tokens"), lit(0L)).as("uniq_unigram_ppm"),
        coalesce(expr("1000000 * __u2 DIV __t2"), lit(0L)).as("uniq_bigram_ppm"))
  }

  /** Per-group score calibration: integer percent-rank of `scoreCol`
    * WITHIN each `groupCol` partition — `pct_ppm = (rank − 1)·10⁶ DIV
    * (n − 1)` (ties share a rank; single-row groups → 0). The curation
    * use: raw quality scores are not comparable across sources (every
    * scorer is biased by its source's register), so a single global
    * threshold over-prunes some sources and under-prunes others;
    * rank-calibrating per source first makes one cut ("drop the bottom
    * 20% OF EACH SOURCE") mean the same thing everywhere.
    *
    * Scale shape: one shuffle on the group key; the window sorts only
    * (group, score) plus the id — project before calling if the frame
    * carries document bodies. A mega-source skews its partition: at that
    * point switch to [[quantileBuckets]]-style boundary cuts (exact
    * percentile boundaries, no per-group total sort); the window form is
    * the exact-rank reference. NULL scores sort FIRST (Spark's ASC
    * default) and so calibrate to the bottom — an oracle must pin
    * `NULLS FIRST` explicitly, because DuckDB's ASC default is the
    * OPPOSITE (nulls_last). */
  def calibrateScores(df: DataFrame, idCol: String, groupCol: String,
                      scoreCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col(scoreCol).asc)
    val n = org.apache.spark.sql.expressions.Window.partitionBy(col(groupCol))
    df.select(col(idCol), col(groupCol), col(scoreCol))
      .withColumn("__r", rank().over(w).cast("long"))
      .withColumn("__n", count(lit(1)).over(n))
      .select(col(idCol), col(groupCol), col(scoreCol),
        when(col("__n") > 1L,
          expr("(__r - 1) * 1000000 DIV (__n - 1)")).otherwise(lit(0L))
          .as("pct_ppm"))
  }

  /** DSIR-style importance weights (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): score each RAW document
    * by how much its hashed-unigram profile looks like the TARGET corpus
    * (the quality exemplar — in DSIR, Wikipedia+books) rather than the raw
    * crawl. Per token with feature bucket b ([[sampleBucket16]] of the token, 65536-way):
    *
    *   llr(b) = bitlen(c_target(b) + 1) − bitlen(c_raw(b) + 1)
    *
    * where bitlen(x) = ⌊log2 x⌋ + 1 — the exact-integer stand-in for the
    * log-likelihood ratio (within 1 of log2; add-one smoothing keeps
    * unseen-in-target buckets finite). `dsir_score` = Σ llr over the doc's
    * tokens. The corpus-size normalizer (−n·log N_t + n·log N_r) is
    * deliberately dropped: it is per-token constant, so rankings at equal
    * token count are unchanged — compare scores of similar-length docs, or
    * feed (score, n_tokens) to a downstream cut (e.g. [[weightedSample]]).
    * Output: (idCol, n_tokens, dsir_score) for every raw doc (NULL/empty
    * text → 0, 0).
    *
    * Scale shape: the raw corpus is tokenized ONCE (materialized (id,
    * bucket) stream consumed by the count pass and the scoring pass); the
    * model is ≤ 65536 rows by construction — built with two partial
    * aggregates and BROADCAST back, so scoring is map-side and the corpus
    * shuffles only for the per-doc rollup. The target side is the small
    * exemplar corpus by definition. */
  def importanceWeights(raw: DataFrame, target: DataFrame, idCol: String,
                        textCol: String): DataFrame = {
    val toks = Materialize.cutLazy(raw.select(col(idCol),
      explode(words(col(textCol))).as("__t"))
      .select(col(idCol), sampleBucket16(col("__t")).cast("long").as("__b")))
    val perDoc = toks.join(broadcast(llrModel(toks, target, textCol)), Seq("__b"))
      .groupBy(idCol).agg(count(lit(1)).as("n_tokens"), sum("__llr").as("dsir_score"))
    raw.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("dsir_score"), lit(0L)).as("dsir_score"))
  }

  /** (bucket, llr) model frame shared by [[importanceWeights]] and
    * [[importanceModel]]. `rawToks` is the raw corpus' bucket stream —
    * every raw token's bucket is in cr by construction, so the target
    * side left-joins on. */
  private def llrModel(rawToks: DataFrame, target: DataFrame,
                       textCol: String): DataFrame = {
    val cr = rawToks.groupBy("__b").agg(count(lit(1)).as("__cr"))
    val ct = target.select(explode(words(col(textCol))).as("__t"))
      .groupBy(sampleBucket16(col("__t")).cast("long").as("__b")).agg(count(lit(1)).as("__ct"))
    cr.join(ct, Seq("__b"), "left")
      .select(col("__b"),
        (length(bin(coalesce(col("__ct"), lit(0L)) + lit(1L))) -
          length(bin(col("__cr") + lit(1L)))).cast("long").as("__llr"))
  }

  /** The [[importanceWeights]] llr model as a dense 65536-entry array —
    * a bounded driver collect (the IVF-centroid lifecycle: the model is
    * ≤ 65536 rows by construction, never corpus-sized). Buckets absent
    * from the raw corpus carry llr 0 (= bitlen(0+1) − bitlen(0+1):
    * unseen in both corpora — the neutral vote a genuinely novel token
    * deserves). Feed to [[scoreWithImportanceModel]]. */
  def importanceModel(raw: DataFrame, target: DataFrame,
                      textCol: String): Array[Long] = {
    val toks = raw.select(explode(words(col(textCol))).as("__t"))
      .select(sampleBucket16(col("__t")).cast("long").as("__b"))
    val out = Array.fill(65536)(0L)
    llrModel(toks, target, textCol).collect()
      .foreach(r => out(r.getLong(0).toInt) = r.getLong(1))
    out
  }

  /** Score docs against a prebuilt [[importanceModel]] as a PURE MAP —
    * the whole model rides the plan as one 512 KB array literal, each
    * row folds over its own token array (the lambda ranges over the
    * array argument and two constants — no per-element re-derivation),
    * so there is no join, no shuffle, no state: the same code scores a
    * structured stream append-mode (the daily-crawl lifecycle: build the
    * model once from the reference corpora, score every arriving batch).
    * Identical numbers to [[importanceWeights]] on the same inputs
    * (spec-pinned). Output: (idCol, n_tokens, dsir_score). */
  /** SOURCE VOCABULARY-OVERLAP matrix: for every pair of sources, the
    * Jaccard of their DISTINCT token sets in integer ppm — the
    * data-card answer to "how much does crawl source A actually differ
    * from B?" (near-identical vocabularies flag mirrored/duplicated
    * feeds; near-disjoint ones flag language/domain splits worth their
    * own mixing weights).
    *
    * Plan: one distinct collapse to (source, token) — the frame every
    * downstream step reads (materialized), vocabulary-sized, NOT
    * corpus-sized; per-source set sizes are a rollup of it; the
    * intersection join is an EQUI self-join on token, and a token
    * appears in ≤ S sources, so join fan-out is bounded by S² per
    * token — `vocab × sources²` total, independent of corpus row
    * count. Pairs with an EMPTY intersection are absent (their Jaccard
    * is 0; completing the matrix is a sources² cross join the caller
    * can do — emitting it here would smuggle one into every call).
    * Output: `s1, s2, n_s1, n_s2, intersection, jaccard_ppm`
    * (s1 < s2, each unordered pair once). */
  def sourceOverlap(df: DataFrame, sourceCol: String,
                    textCol: String): DataFrame = {
    val st = Materialize.cutLazy(
      df.where(col(sourceCol).isNotNull)
        .select(col(sourceCol).cast("string").as("__s"),
          explode(words(col(textCol))).as("__t"))
        .distinct())
    val sizes = st.groupBy("__s").agg(count(lit(1)).as("__n"))
    st.as("x").join(st.as("y"),
        col("x.__t") === col("y.__t") && col("x.__s") < col("y.__s"))
      .groupBy(col("x.__s").as("s1"), col("y.__s").as("s2"))
      .agg(count(lit(1)).as("intersection"))
      .join(sizes.select(col("__s").as("s1"), col("__n").as("n_s1")), "s1")
      .join(sizes.select(col("__s").as("s2"), col("__n").as("n_s2")), "s2")
      .select(col("s1"), col("s2"), col("n_s1"), col("n_s2"), col("intersection"),
        expr("CAST((intersection * 1000000) DIV (n_s1 + n_s2 - intersection) AS BIGINT)")
          .as("jaccard_ppm"))
  }

  /** LOG-TEMPLATE mining by deterministic masking: variable tokens —
    * UUIDs, long hex ids (≥ 8 chars), and numbers — collapse to
    * `<uuid>`/`<hex>`/`<n>` placeholders, and the surviving string IS the
    * template; counting templates turns a billion-line log/crawl stream
    * into its few hundred underlying message shapes (the Drain-family
    * observation, done as pure masking so the result is an exact function
    * of each line — no clustering state, stream-safe, engine-replayable).
    * Mask order matters and is fixed: uuid before hex (a UUID contains
    * 8-hex runs), hex before number (a hex run contains digit runs).
    * Pure regexp_replace chain — codegen'd, one scan, no UDF; patterns
    * are shared Java-regex/RE2 syntax so the oracle replays them
    * verbatim. Top-k templates by (count desc, template) as a
    * TakeOrdered. Output: `template, n`. */
  def logTemplates(df: DataFrame, textCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    df.select(maskTemplate(col(textCol)).as("template"))
      .where(col("template").isNotNull)
      .groupBy("template").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("template"))
      .limit(k)
  }

  /** The [[logTemplates]] masking pass as a reusable column. */
  def maskTemplate(text: Column): Column = {
    val uuid = "[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}"
    // case-insensitive like the uuid class: DEADBEEF0042 and deadbeef0042
    // are one message shape, not two case-dependent templates
    val hex = "\\b[0-9a-fA-F]{8,}\\b"
    val num = "[0-9]+(\\.[0-9]+)?"
    regexp_replace(
      regexp_replace(
        regexp_replace(text, uuid, "<uuid>"),
        hex, "<hex>"),
      num, "<n>")
  }

  /** Adjacent-pair POINTWISE MUTUAL INFORMATION — the log-domain twin
    * of [[collocations]] (which ranks the same bigram frame by linear
    * lift_ppm): pmi64 ≈ 64·log₂(lift), so the two RANK near-identically
    * on positive associations; reach for THIS form when the readout
    * must (a) expose BELOW-independence pairs as properly negative
    * grades (lift compresses them into 0..10⁶ ppm), or (b) stay
    * magnitude-bounded — a grade is ≤ a few thousand at any corpus
    * size, where a lift ratio on a rare-margin pair grows without
    * bound:
    *
    *   pmi64(a, b) = lg64(n_ab) + lg64(N) − lg64(n_a·) − lg64(n_·b)
    *
    * — the SUM-OF-GRADES form, not lg64 of the products: each operand
    * stays a bounded count (the Lg64 2^57 domain holds at any corpus
    * size), every engine replays it, and monotonicity per operand is
    * exactly the lg64 contract. Margins `n_a·`/`n_·b` count the word as
    * LEFT/RIGHT of any bigram and come from the SAME counted frame (no
    * second corpus pass); `minCount` floors the rare-pair noise PMI is
    * notorious for, and the floor applies AFTER the margins so filtered
    * pairs don't bias them. Top-k by (pmi64 desc, n_ab desc, pair) —
    * deterministic, a TakeOrdered not a global sort.
    *
    * Plan shape at scale: one WordGrams slide + ONE (w1, w2) partial-agg
    * collapse of the corpus; margins and N are rollups of that collapsed
    * (vocab²-bounded, zipf-small in practice) frame — the same shape as
    * [[collocations]], sharing its cost profile. */
  /** TEXTRANK keyword extraction (Mihalcea & Tarau, EMNLP '04): PageRank
    * over the word co-occurrence graph — the graph-centrality answer to
    * "which words matter" where tf-idf only sees frequency: a word
    * scores high when it co-occurs with other high-scoring words.
    * Composes two of the engine's own pieces end to end: the
    * [[pmiCollocations]] bigram frame becomes the weighted undirected
    * edge list (adjacent-token pairs, count = weight, `minCount` noise
    * floor), words become integer nodes via the md5-h60("tr:"∥word)
    * convention (a 60-bit id over a corpus vocabulary; a collision
    * merges two words' neighborhoods identically in every engine — the
    * estimate stays bit-replayable), and [[Graph.pageRank]] runs its
    * integer ppm fixed point unchanged. Top-k by (rank, word).
    *
    * Plan: the bigram census (one exchange), a vocab-sized id map joined
    * onto the edge ends, then pageRank's one-edge-exchange iteration;
    * the top-k is a TakeOrdered, never a global sort. Output:
    * `word, rank_ppm`. */
  def textRank(df: DataFrame, textCol: String, iterations: Int = 4,
               minCount: Long = 2, k: Int = 25): DataFrame = {
    require(k >= 1 && k <= 10000, s"k must be in [1, 10000], got $k")
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    val grams = df
      .select(explode(E.column(WordGrams(E.expression(col(textCol)), 2))).as("__bg"))
      .select(substring_index(col("__bg"), " ", 1).as("w1"),
        substring_index(col("__bg"), " ", -1).as("w2"))
    val fe = Materialize.cutLazy(grams.groupBy("w1", "w2").agg(count(lit(1)).as("__n"))
      .where(col("__n") >= minCount))
    def h60(c: Column) =
      conv(substring(md5(concat(lit("tr:"), c)), 1, 15), 16, 10).cast("long")
    val vid = Materialize.cutLazy(
      fe.select(col("w1").as("word")).union(fe.select(col("w2"))).distinct()
        .select(col("word"), h60(col("word")).as("__id")))
    def side(a: String, b: String) = fe
      .join(vid.select(col("word").as(a), col("__id").as("src")), Seq(a))
      .join(vid.select(col("word").as(b), col("__id").as("dst")), Seq(b))
      .select(col("src"), col("dst"), col("__n").as("w"))
    val edges = side("w1", "w2").union(side("w2", "w1"))
    Graph.pageRank(edges, "src", "dst", iterations, weightCol = Some("w"))
      .join(vid, col("node") === col("__id"))
      .select(col("word"), col("rank_ppm"))
      .orderBy(col("rank_ppm").desc, col("word"))
      .limit(k)
  }

  def pmiCollocations(df: DataFrame, textCol: String, minCount: Long,
                      k: Int): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    require(k >= 1 && k <= 10000, s"k must be in [1, 10000], got $k")
    def lg(x: String) = graft.functions.Lg64.sql(x)
    val grams = df
      .select(explode(E.column(WordGrams(E.expression(col(textCol)), 2))).as("__bg"))
      .select(substring_index(col("__bg"), " ", 1).as("w1"),
        substring_index(col("__bg"), " ", -1).as("w2"))
    val full = Materialize.cutLazy(grams.groupBy("w1", "w2").agg(count(lit(1)).as("n_ab")))
    val left = full.groupBy("w1").agg(sum("n_ab").as("__na"))
    val right = full.groupBy("w2").agg(sum("n_ab").as("__nb"))
    val tot = full.agg(sum("n_ab").as("__N"))
    full.where(col("n_ab") >= minCount)
      .join(left, "w1").join(right, "w2").crossJoin(broadcast(tot))
      .withColumn("pmi64",
        expr(s"${lg("n_ab")} + ${lg("__N")} - ${lg("__na")} - ${lg("__nb")}"))
      .select(col("w1"), col("w2"), col("n_ab"), col("pmi64"))
      .orderBy(col("pmi64").desc, col("n_ab").desc, col("w1"), col("w2"))
      .limit(k)
  }

  /** Credit-card (PAN) exposure audit — the Luhn mod-10 checksum over
    * maximal digit runs of PAN length (13–19): the PII screen where a
    * plain digit-run regex drowns in false positives (timestamps, ids,
    * phone numbers) — a Luhn-valid run is evidence-grade. Per doc:
    * `n_candidates` (length-gated runs) and `n_luhn_valid`. Runs are
    * MAXIMAL by regex greediness (no lookaround — RE2-safe, so the
    * oracle replays the same extraction), digits-only (a real pipeline
    * normalizes separators first — compose with a regexp_replace).
    * Pure per-row map (one nested higher-order expression, codegen'd,
    * stream-safe); every doc reports, NULL text reads (0, 0).
    * Checksum: from the RIGHT, double every second digit, subtract 9
    * when the double exceeds 9, valid ⇔ sum ≡ 0 (mod 10). Masking
    * composes: `filter` the runs by the same predicate and fold
    * `replace` over them. */
  def luhnAudit(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val luhnValid =
      """aggregate(sequence(1, length(r)), 0,
         (acc, j) -> acc + (CASE WHEN j % 2 = 0
            THEN IF(CAST(substring(r, length(r) - j + 1, 1) AS INT) * 2 > 9,
                    CAST(substring(r, length(r) - j + 1, 1) AS INT) * 2 - 9,
                    CAST(substring(r, length(r) - j + 1, 1) AS INT) * 2)
            ELSE CAST(substring(r, length(r) - j + 1, 1) AS INT) END)) % 10 = 0"""
    df.select(col(idCol), col(textCol).as("__t"))
      .withColumn("__runs", expr(
        "filter(regexp_extract_all(coalesce(__t, ''), '[0-9]+', 0), " +
          "r -> length(r) >= 13 AND length(r) <= 19)"))
      .select(col(idCol),
        size(col("__runs")).cast("long").as("n_candidates"),
        expr(s"CAST(size(filter(__runs, r -> $luhnValid)) AS BIGINT)")
          .as("n_luhn_valid"))
  }

  /** Per-doc n-gram NOVELTY against a reference corpus: the share of a
    * document's DISTINCT word n-grams absent from the reference — the
    * memorization-risk / "is this actually new data" readout a crawl
    * refresh runs against the previous snapshot (novelty ~0 ⇒ re-crawl;
    * the decontamination overlap check inverted into a per-doc score).
    * Grams key on the replayable md5-h60 hash (8-byte shuffle keys, the
    * repo's oracle-stable hash — collisions UNDERCOUNT novelty at
    * ~2⁻⁶⁰, ignorable), reference grams dedup before the join. Output
    * per input doc (every doc reports): `n_grams` (distinct), `n_unseen`,
    * `novelty_ppm` (NULL for gram-less docs — too short to judge, the
    * wordEntropy NULL convention). At snapshot scale the exact ref join
    * swaps for the Bloom gate ([[Dedup.bloomGate]]) at a false-seen
    * cost. */
  def ngramNovelty(df: DataFrame, idCol: String, textCol: String,
                   reference: DataFrame, refTextCol: String, n: Int): DataFrame = {
    require(n >= 1 && n <= 8, s"n must be in [1, 8], got $n")
    def h60(c: String) = s"CAST(conv(substr(md5($c), 1, 15), 16, 10) AS BIGINT)"
    val dg = df.select(col(idCol),
        explode(array_distinct(E.column(WordGrams(E.expression(col(textCol)), n)))).as("__g"))
      .select(col(idCol), expr(h60("__g")).as("__h"))
    val ref = reference
      .select(explode(E.column(WordGrams(E.expression(col(refTextCol)), n))).as("__g"))
      .select(expr(h60("__g")).as("__h")).distinct()
    val counted = dg.join(ref.withColumn("__seen", lit(1)), Seq("__h"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("__seen").isNull, 1L).otherwise(0L)).as("n_unseen"))
    df.select(col(idCol)).join(counted, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_unseen"), lit(0L)).as("n_unseen"),
        expr("CAST(n_unseen * 1000000L DIV n_grams AS BIGINT)").as("novelty_ppm"))
  }

  /** Concat-and-chop SEQUENCE PACKING — the GPT-style pretraining pack
    * and the SPLITTING complement of [[packSequences]]: that op keeps
    * documents WHOLE (a doc belongs to the pack its first token lands
    * in, so packs overflow/underfill around doc boundaries); this one
    * concatenates the corpus into one virtual token stream and chops at
    * exact capacity boundaries — zero padding anywhere, docs straddling
    * a boundary SPLIT into pieces (the trade every pretraining stack
    * picks one side of). Each doc takes a deterministic stream position
    * — order (md5-h60 of id, id), reproducible shuffling, the
    * stratified-sampling key discipline — and emits one PIECE row per
    * capacity bin it crosses. The global exclusive prefix sum is
    * TWO-LEVEL so no corpus-sized frame crosses one partition: 2¹⁰ md5
    * strata roll up to a 1024-row offsets frame (the only
    * single-partition window, bounded by construction), each stratum's
    * interior prefix runs under a stratum-partitioned window,
    * global_start = stratum_offset + interior_prefix. Output one row
    * per (doc, bin) intersection: `bin, idCol, doc_offset` (token
    * offset inside the doc where this piece starts), `bin_offset`,
    * `piece_len`. Bins are perfectly full by construction (Σ piece_len
    * per bin = capacity except the last). Token-less docs are excluded
    * (no payload to pack). */
  def packChop(df: DataFrame, idCol: String, tokensCol: String,
               capacity: Long): DataFrame = {
    require(capacity >= 1 && capacity <= 10000000L,
      s"capacity must be in [1, 1e7], got $capacity")
    import org.apache.spark.sql.expressions.Window
    val base = df.select(col(idCol),
        col(tokensCol).cast("long").as("__n"),
        expr(s"CAST(conv(substr(md5(CAST($idCol AS STRING)), 1, 15), 16, 10) AS BIGINT)")
          .as("__r"))
      .where(col("__n") > 0)
      .withColumn("__stratum", expr("__r % 1024"))
    val wIn = Window.partitionBy(col("__stratum"))
      .orderBy(col("__r"), col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val interior = base.withColumn("__pre",
      coalesce(sum(col("__n")).over(wIn), lit(0L)))
    val stratumTotals = base.groupBy("__stratum").agg(sum("__n").as("__t"))
    // BOUNDED unpartitioned window: ≤ 1024 stratum-total rows by
    // construction (the two-level prefix sum's whole point — interior
    // prefixes run stratum-PARTITIONED above), so no RangeScan needed
    // (r12 verdict #7)
    val wStr = Window.orderBy(col("__stratum"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val offsets = stratumTotals.withColumn("__off",
      coalesce(sum(col("__t")).over(wStr), lit(0L))).select("__stratum", "__off")
    interior.join(offsets.hint("broadcast"), Seq("__stratum"))
      .withColumn("__gs", col("__off") + col("__pre"))
      .select(col(idCol), col("__n"), col("__gs"),
        posexplode(expr(
          s"sequence(__gs DIV ${capacity}L, (__gs + __n - 1) DIV ${capacity}L)"))
          .as(Seq("__i", "bin")))
      .select(col("bin"), col(idCol),
        (greatest(col("bin") * capacity, col("__gs")) - col("__gs")).as("doc_offset"),
        (greatest(col("bin") * capacity, col("__gs")) - col("bin") * capacity).as("bin_offset"),
        (least((col("bin") + 1) * capacity, col("__gs") + col("__n"))
          - greatest(col("bin") * capacity, col("__gs"))).as("piece_len"))
  }

  /** Per-source Zipf rank–frequency slope: OLS of `lg64(count)` on
    * `lg64(rank)` over each source's `topN` most frequent tokens — the
    * log-log line whose slope should sit near −1 for natural language
    * (Zipf '49); a source whose slope is far shallower is template/
    * boilerplate-heavy (flat head), far steeper is repetitive spam.
    * Both axes ride the shared [[graft.functions.Lg64]] integer grade
    * (64 units/octave), so the slope is DIMENSIONLESS (the 64s cancel)
    * and every moment is integer-exact; only the final slope division
    * drops to IEEE double, floored at 3 decimals — the events_trend
    * convention, bit-stable across engines.
    *
    * Plan: one explode → (source, token) counts (both partial-aggregate
    * map-side), then the BOUNDED TopKStrings aggregate per source — ≤
    * topN states cross the shuffle, no window over the vocabulary — and
    * a per-source moment aggregate over ≤ topN rows. Sources with fewer
    * than 2 distinct tokens have no line and drop out.
    *
    * Output: `source, n_terms, slope_milli`. */
  def zipfSlope(df: DataFrame, sourceCol: String, textCol: String,
                topN: Int = 100): DataFrame = {
    require(topN >= 2, s"topN must be >= 2, got $topN")
    def lg(x: String) = graft.functions.Lg64.sql(x)
    val counts = df
      .select(col(sourceCol).as("source"), explode(words(col(textCol))).as("__w"))
      .groupBy("source", "__w").agg(count(lit(1)).as("__n"))
    val agg = E.column(graft.functions.TopKStrings(
      E.expression(col("__n")), E.expression(col("__w")),
      topN).toAggregateExpression())
    val ranked = counts.groupBy("source").agg(agg.as("__top"))
      .select(col("source"), posexplode(col("__top")).as(Seq("__pos", "__e")))
      .select(col("source"), (col("__pos") + 1).cast("long").as("__rank"),
        col("__e.score").as("__cnt"))
    val dec = "decimal(38,0)"
    val xy = ranked.select(col("source"),
      expr(lg("__rank")).cast(dec).as("__x"),
      expr(lg("__cnt")).cast(dec).as("__y"))
    val m = xy.groupBy("source")
      .agg(count(lit(1)).cast(dec).as("__m"),
        sum(col("__x")).as("__sx"), sum(col("__y")).as("__sy"),
        sum(col("__x") * col("__y")).as("__sxy"),
        sum(col("__x") * col("__x")).as("__sxx"))
      .where(col("__m") >= 2)
    val num = col("__m") * col("__sxy") - col("__sx") * col("__sy")
    val den = col("__m") * col("__sxx") - col("__sx") * col("__sx")
    m.select(col("source"), col("__m").cast("long").as("n_terms"),
      floor(num.cast("double") / den.cast("double") * 1000 + 0.5)
        .cast("long").as("slope_milli"))
  }

  /** Per-source unigram COMPOSITION-DRIFT grade: how far each source's
    * word distribution sits from the whole corpus's, as the KL-style
    * sum `Σ_w c_sw·(lg p_s(w) − lg p(w)) / T_s` on the shared
    * [[graft.functions.Lg64]] grade. Each log-probability is the
    * DIFFERENCE of two raw-count grades (`lg p_s = lg c_sw − lg T_s`),
    * so every lg64 argument is a plain token count — no product can
    * overflow the grade's 2⁵⁷ domain even at 100 TB corpus totals. The
    * per-term mantissa error (< 7 units either way after differencing)
    * makes this a monotone-ish GRADE of D_KL(source‖corpus), not the
    * transcendental itself — slightly-negative values for a source
    * indistinguishable from the corpus are in-contract; ±1 unit =
    * ±1/64 bit. Sources are ranked by drift; the heavy tail is where
    * recipe rebalancing looks first.
    *
    * Output: `source, n_tokens, n_terms, kl_millibits` where
    * `kl_millibits = (Σ_w c_sw·(lg64 c_sw − lg64 c_w) + T_s·(lg64 T −
    * lg64 T_s)) · 1000 DIV (64·T_s)` — millibits per token.
    *
    * Plan: one explode → (source, token) counts → token totals join on
    * the TOKEN key (both sides are the same counts frame, cut once) →
    * per-source aggregate → a broadcast-hinted one-row corpus-total
    * join. No window, no driver collection. Magnitudes: the grade sum
    * is bounded by `T_s·~3700` (long-safe to ~2·10¹⁵ tokens/source)
    * and the final `·1000` readout by `T_s·3.7·10⁶` — long-safe to
    * ~2·10¹² tokens/source, ANSI-loud past that (drop the millibit
    * scale for a larger domain). */
  def sourceKl(df: DataFrame, sourceCol: String, textCol: String): DataFrame = {
    def lg(x: String) = graft.functions.Lg64.sql(x)
    val csw = Materialize.cutLazy(df
      .select(col(sourceCol).as("source"), explode(words(col(textCol))).as("__w"))
      .groupBy("source", "__w").agg(count(lit(1)).as("__c")))
    val cw = csw.groupBy("__w").agg(sum("__c").as("__cw"))
    val t = csw.agg(sum("__c").as("__t"))
    val g = csw.join(cw, "__w")
      .groupBy(col("source"))
      .agg(sum("__c").as("n_tokens"), count(lit(1)).as("n_terms"),
        sum(expr(s"__c * (${lg("__c")} - ${lg("__cw")})")).as("__s0"))
    g.crossJoin(broadcast(t))
      .select(col("source"), col("n_tokens"), col("n_terms"),
        expr(s"((__s0 + n_tokens * (${lg("__t")} - ${lg("n_tokens")})) * 1000) " +
          "DIV (64 * n_tokens)").as("kl_millibits"))
  }

  /** GINI source-concentration audit (r11) — the one-number answer to
    * "is this corpus a few mega-domains wearing a trench coat":
    * per-group token totals, Lorenz-ordered ascending by
    * (tokens, group) — the group tie-break makes the rank, hence the
    * readout, deterministic — then the exact discrete Gini
    *
    *   gini_ppm = ⌊(2·Σ i·wᵢ − (n+1)·Σw) · 10⁶ / (n·Σw)⌋
    *
    * all-integer (DECIMAL sums; numerator ≥ 0 by the ascending order).
    * 0 = perfectly even mix, → 1 = one source is the corpus — the
    * mixture-health twin of [[diversityCard]] (which profiles tokens,
    * not their OWNERSHIP) and the input a [[mixPlan]] rebalance decision
    * starts from.
    *
    * Plan: ONE partial-aggregated groupBy collapses the corpus to
    * per-group token totals; the Lorenz rank is a window over the
    * collapsed ≤-#groups frame (the skylineMax bound — sources, not
    * rows); the verdict is one aggregate. Output (one row):
    * `n_groups, total_tokens, gini_ppm`. */
  def giniConcentration(df: DataFrame, groupCol: String,
                        textCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val per = df.where(col(groupCol).isNotNull)
      .select(col(groupCol).cast("string").as("g"),
        size(words(col(textCol))).cast("long").as("__c"))
      .groupBy("g").agg(sum(col("__c")).as("w"))
    val ranked = per.withColumn("__i",
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col("w"), col("g"))).cast("long"))
    ranked.groupBy()
      .agg(count(lit(1)).as("n_groups"),
        sum(col("w")).cast(dec).as("__t"),
        sum(col("__i").cast(dec) * col("w").cast(dec)).as("__siw"))
      .where(col("n_groups") > 0)
      .selectExpr(
        "n_groups",
        "CAST(__t AS BIGINT) AS total_tokens",
        """CASE WHEN __t > 0
          | THEN CAST((2 * __siw - (n_groups + 1) * __t) * 1000000 DIV (n_groups * __t) AS BIGINT)
          | END AS gini_ppm""".stripMargin)
  }

  /** C4-style LINE-level cleaning (Raffel et al. '20 §2.2, the rules a
    * crawl pipeline applies between markup stripping and dedup): keep a
    * line only if it (1) has ≥ `minWordsPerLine` whitespace words,
    * (2) ends in terminal punctuation (. ! ? "), (3) contains no '{'
    * (leaked code/templating), (4) does not mention "javascript"
    * (cookie/enable-JS boilerplate). Every dropped line is ACCOUNTED to
    * the FIRST rule it fails (short → punctuation → brace → javascript
    * — deterministic attribution, the tolerant-decode convention), so
    * the clean corpus ships with its per-rule loss profile instead of a
    * silent shrink.
    *
    * Output: `idCol, n_lines, n_kept, n_short, n_punct, n_brace, n_js,
    * clean_text` (kept lines rejoined with \n; NULL when nothing
    * survives — the all-components-NULL convention, a caller filters).
    *
    * Pure map (higher-order filters over the split lines — no explode,
    * no shuffle, stream-safe); blank lines are not lines. */
  def c4LineClean(df: DataFrame, idCol: String, textCol: String,
                  minWordsPerLine: Int = 5): DataFrame = {
    require(minWordsPerLine >= 1,
      s"minWordsPerLine must be >= 1, got $minWordsPerLine")
    val m = minWordsPerLine
    // per-line predicates, spliced so each filter is one codegen'd
    // expression; wc = whitespace word count of the trimmed line
    def wc(l: String) = s"size(filter(split($l, '\\\\s+'), w -> length(w) > 0))"
    def term(l: String) = s"right($l, 1) IN ('.', '!', '?', '\"')"
    def brace(l: String) = s"contains($l, '{')"
    def js(l: String) = s"contains(lower($l), 'javascript')"
    // NULL text coalesces to '' → 0 lines, all counters 0 (r10 advice):
    // split(NULL) would propagate NULL into every counter and the row
    // would vanish from the loss accounting — the one way a document
    // could leave this stage unaccounted, against the "every drop
    // accounted" contract (clean_text stays NULL via the n_kept=0 arm)
    df.select(col(idCol),
      expr(s"filter(transform(split(coalesce($textCol, ''), '\\n'), l -> trim(l)), " +
        "l -> length(l) > 0)").as("__ls"))
      .select(col(idCol),
        expr("size(__ls)").cast("long").as("n_lines"),
        expr(s"filter(__ls, l -> ${wc("l")} >= $m AND ${term("l")} " +
          s"AND NOT ${brace("l")} AND NOT ${js("l")})").as("__kept"),
        expr(s"size(filter(__ls, l -> ${wc("l")} < $m))").cast("long").as("n_short"),
        expr(s"size(filter(__ls, l -> ${wc("l")} >= $m AND NOT ${term("l")}))")
          .cast("long").as("n_punct"),
        expr(s"size(filter(__ls, l -> ${wc("l")} >= $m AND ${term("l")} " +
          s"AND ${brace("l")}))").cast("long").as("n_brace"),
        expr(s"size(filter(__ls, l -> ${wc("l")} >= $m AND ${term("l")} " +
          s"AND NOT ${brace("l")} AND ${js("l")}))").cast("long").as("n_js"))
      .select(col(idCol), col("n_lines"),
        size(col("__kept")).cast("long").as("n_kept"),
        col("n_short"), col("n_punct"), col("n_brace"), col("n_js"),
        when(size(col("__kept")) > 0, array_join(col("__kept"), "\n"))
          .as("clean_text"))
  }

  def scoreWithImportanceModel(df: DataFrame, idCol: String, textCol: String,
                               model: Array[Long]): DataFrame = {
    require(model.length == 65536, s"model must have 65536 buckets, got ${model.length}")
    val w = words(col(textCol))
    val m = lit(model)
    df.select(col(idCol),
      coalesce(size(w).cast("long"), lit(0L)).as("n_tokens"),
      coalesce(aggregate(w, lit(0L),
          (acc, x) => acc + element_at(m, sampleBucket16(x) + lit(1))),
        lit(0L)).as("dsir_score"))
  }
}
