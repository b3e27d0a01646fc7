package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.{GraftShim => E}

/** Full-text retrieval over a document corpus: inverted-index postings,
  * BM25 ranking, and per-document TF-IDF keyword extraction — the search
  * side of a training-data pipeline (dedup finds what's identical;
  * retrieval finds what's RELEVANT — decontamination probes, targeted
  * corpus slicing, "show me documents like this query" debugging).
  *
  * EXACTNESS: every score is computed in fixed-point INTEGER arithmetic
  * so a SQL oracle replays it bit-for-bit (no transcendental in the hot
  * path — see [[Search.bm25TopK]] for the idf/tf fixed-point scheme).
  *
  * SCALE: the postings list is the classic inverted index as a DataFrame
  * — built with one explode + groupBy (shuffled by term, which is exactly
  * the layout queries want), optionally persisted hash-bucketed by term
  * so a query reads only its terms' buckets (partition pruning, see
  * [[Search.buildPostingsIndex]]). Query scoring touches ONLY the query
  * terms' postings (a pushed-down `term IN (…)` filter), joins the
  * per-term df stats broadcast (≤ |query| rows), and reduces to the
  * global top-k through the bounded two-phase [[graft.functions.TopKPairs]]
  * aggregate — no window, no full sort, no per-doc state beyond k.
  *
  * Reference scope: the reference engine (hive-jq-udtf) has no retrieval
  * surface; this family is part of the beyond-reference LLM-pipeline ops. */
object Search {

  /** Inverted-index postings: one row per (term, doc) — `term, doc_id,
    * tf` (term frequency) plus `dl` (the document's whitespace-token
    * length, constant per doc, carried so scoring needs no second join).
    * Tokenization is [[TextAnalysis.words]] (lowercased whitespace split)
    * — the same contract as the vocab/LM/dup-gram family, so index terms
    * and text-analysis terms agree. One explode + one groupBy: the
    * shuffle lands postings partitioned BY TERM, the access path every
    * retrieval query wants. */
  def postings(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("doc_id"), TextAnalysis.words(col(textCol)).as("__ws"))
      .select(col("doc_id"), size(col("__ws")).as("dl"), explode(col("__ws")).as("term"))
      .groupBy("term", "doc_id", "dl").agg(count(lit(1)).as("tf"))

  /** Document frequency per term (how many docs contain it) — the idf
    * input. Shuffles by term (same layout as [[postings]]). */
  def documentFrequency(p: DataFrame): DataFrame =
    p.groupBy("term").agg(count(lit(1)).as("df"))

  /** (n_docs, total_tokens) of the corpus — one tiny aggregate. */
  private def corpusStats(df: DataFrame, textCol: String): (Long, Long) = {
    val r = df.agg(count(lit(1)).as("n"),
      coalesce(sum(size(TextAnalysis.words(col(textCol)))), lit(0L)).as("tot")).head
    (r.getLong(0), r.getLong(1))
  }

  /** The fixed-point BM25 contribution of one (term, doc) posting, in ppm.
    *
    * Classic BM25 (k1 = 1.2, b = 0.75) needs `ln` for idf — transcendental,
    * so two engines' libm disagreement could flip a floor() and break a
    * hash gate. This engine instead uses a FIXED-POINT BASE-2 idf with a
    * 6-bit mantissa (r8 — the bit-length grade plus the six bits after
    * the leading 1, i.e. 1/64-of-a-doubling resolution):
    *
    *   q        = N DIV df(t)                   (≥ 1)
    *   bl       = bitlength(q)                  (= floor(log2 q) + 1)
    *   idf64(t) = 64·bl + ((q·64) DIV 2^(bl−1)) − 64
    *
    * — integer-exact in any engine (Spark `length(bin(x))` +
    * `shiftleft`, DuckDB `length(printf('%b', x))` + `<<`), strictly
    * monotone in q down to ~1.1% df ratios (where the pure bit-length
    * grade tied everything inside one power of two), and an affine
    * approximation of 64·(log2 q + 1) — so ranking agrees with ln-idf
    * whenever q differs in its top 7 bits (parity spec in SearchSpec).
    * The tf saturation term is classic BM25 in ppm fixed point:
    *
    *   B_ppm      = 250000 + (750000 · dl · 1000) DIV avgdl_milli
    *   denom_µ    = tf·1e6 + (12 · B_ppm) DIV 10          (k1 = 12/10)
    *   tfcomp_ppm = (tf · 2.2e12) DIV denom_µ             (k1+1 = 22/10)
    *   score_ppm  = Σ_t idf64(t) · tfcomp_ppm(t, d)
    *
    * Every division is integer floor — both engines evaluate the SAME
    * integer expression, so equality is exact, not within-epsilon.
    * Residual divergence from textbook BM25 (SURVEY §5): idf is a
    * 7-significant-bit log2 grade rather than nats — ties remain only
    * below ~2^(1/64) ≈ 1.1% df ratios, and q = N DIV df floors before
    * grading. */
  private def bm25ContribPpm(n: Long, avgdlMilli: Long): Column = {
    // one expression string: every division must be DIV (integer floor) —
    // the Column `/` operator is DOUBLE division and would break exactness
    val q = s"(${n}L DIV df)"
    // idf64(t) = lg64(q): ((q·64) DIV 2^(bl−1)) ∈ [64, 127] is the leading
    // 1 plus the next six bits of q — the shared house grade
    // (graft.functions.Lg64, contract spec-pinned once in Lg64Spec)
    val idf64 = graft.functions.Lg64.sql(q)
    val bPpm = s"(250000L + (750000L * dl * 1000L) DIV ${avgdlMilli}L)"
    val denomMicro = s"(tf * 1000000L + (12L * $bPpm) DIV 10L)"
    val tfcompPpm = s"((tf * 2200000000000L) DIV $denomMicro)"
    expr(s"$idf64 * $tfcompPpm").as("__contrib")
  }

  /** BM25 top-k: the `k` documents scoring highest for `queryTerms`
    * (OR semantics — standard BM25 sums over matched terms), ordered by
    * (score_ppm DESC, doc_id ASC). Output: `rank, doc_id, score_ppm`.
    *
    * Plan shape: postings filtered to the query terms (the filter sits on
    * the exploded stream BEFORE the tf groupBy, so non-query terms never
    * reach a shuffle), per-term df as a broadcast (≤ |query| rows), one
    * sum per candidate doc, then ONE bounded global top-k aggregate —
    * k-sized states cross the final (single-group) exchange. `idCol` must
    * be integral (the TopKPairs contract). */
  def bm25TopK(df: DataFrame, idCol: String, textCol: String,
               queryTerms: Seq[String], k: Int): DataFrame = {
    require(queryTerms.nonEmpty, "bm25TopK needs at least one query term")
    requireIntegralId(df, idCol, "bm25TopK")
    // postings terms are lowercased by the shared tokenizer; an un-
    // normalized query ("New York") would silently match NOTHING — the
    // same fix phraseCount got in r7 (mixed-case phrases matched nothing)
    val terms = queryTerms.map(graft.functions.WordTok.lowerLikeSpark)
    val (n, tot) = corpusStats(df, textCol)
    require(n > 0 && tot > 0, s"bm25TopK needs a non-empty corpus (n=$n, tokens=$tot)")
    val avgdlMilli = tot * 1000L / n
    // a corpus that is mostly empty docs can floor avg doc length to 0 —
    // that would NULL every contribution (DIV 0) and return an empty
    // result with no error; fail loudly instead
    require(avgdlMilli > 0,
      s"bm25TopK: avg doc length floors to 0 milli-tokens (n=$n, tokens=$tot)")
    val p = postings(df, idCol, textCol)
      .where(col("term").isin(terms.distinct: _*))
    scoreAndRank(p, n, avgdlMilli, k)
  }

  /** The TopKPairs contract, enforced here too: a silent `cast("long")`
    * on a string id would NULL every id and return an EMPTY result with
    * no error; a fractional value would truncate to the wrong document.
    * `role` names the argument in the error (id vs score — rankByScore
    * validates both). Shared across the pipeline package — one check,
    * one error shape. */
  private[pipeline] def requireIntegralId(df: DataFrame, idCol: String,
                                          op: String,
                                          role: String = "id"): Unit = {
    import org.apache.spark.sql.types.{ByteType, DecimalType, IntegerType, LongType, ShortType}
    val dt = df.schema(idCol).dataType
    val ok = dt match {
      case ByteType | ShortType | IntegerType | LongType => true
      case d: DecimalType => d.scale == 0
      case _ => false
    }
    require(ok, s"$op $role column '$idCol' must be an integral type, got $dt")
  }

  /** Scoring core shared by the in-job and persisted-index paths:
    * query-term postings → broadcast df join → per-doc sum → global
    * bounded top-k. */
  private def scoreAndRank(queryPostings: DataFrame, n: Long,
                           avgdlMilli: Long, k: Int): DataFrame =
    rankTopK(bm25Scores(queryPostings, n, avgdlMilli), k)

  /** Per-doc BM25 sum over query-term postings: postings → broadcast
    * document-frequency join → per-doc contribution sum → one
    * `(doc_id, score_ppm)` row per candidate. */
  private def bm25Scores(queryPostings: DataFrame, n: Long,
                         avgdlMilli: Long): DataFrame = {
    val p = Materialize.cutLazy(queryPostings) // consumed twice: df stats + scoring
    val dfs = documentFrequency(p)
    p.join(broadcast(dfs), "term")
      .select(col("doc_id"), bm25ContribPpm(n, avgdlMilli))
      .groupBy("doc_id").agg(sum(col("__contrib")).as("score_ppm"))
  }

  /** BATCH BM25: many queries against ONE corpus pass — the eval-set /
    * decontamination-probe shape where calling [[bm25TopK]] per query
    * would rescan the corpus (and re-run corpus stats) per query.
    * Identical arithmetic to bm25TopK: one postings build filtered to
    * the UNION of all query terms, per-term idf from the pooled
    * postings (df per term is query-independent, so pooled ≡ per-query
    * runs), contributions joined to the broadcast (query, term) map,
    * summed per (query, doc), then one bounded [[graft.functions.TopKPairs]]
    * aggregate PER QUERY — ≤ k states per query cross the shuffle, no
    * window over candidates. Output: `query, rank, doc_id, score_ppm`
    * with the bm25TopK tie order (score DESC, id ASC) per query. */
  def bm25TopKBatch(df: DataFrame, idCol: String, textCol: String,
                    queries: Seq[(String, Seq[String])], k: Int): DataFrame = {
    require(queries.nonEmpty, "bm25TopKBatch needs at least one query")
    queries.foreach { case (q, ts) =>
      require(ts.nonEmpty, s"bm25TopKBatch: query '$q' has no terms") }
    require(queries.map(_._1).distinct.size == queries.size,
      "bm25TopKBatch: duplicate query ids")
    requireIntegralId(df, idCol, "bm25TopKBatch")
    val (n, tot) = corpusStats(df, textCol)
    require(n > 0 && tot > 0, s"bm25TopKBatch needs a non-empty corpus (n=$n, tokens=$tot)")
    val avgdlMilli = tot * 1000L / n
    require(avgdlMilli > 0,
      s"bm25TopKBatch: avg doc length floors to 0 milli-tokens (n=$n, tokens=$tot)")
    val spark = df.sparkSession
    import spark.implicits._
    val qt = queries.flatMap { case (q, ts) =>
      ts.map(graft.functions.WordTok.lowerLikeSpark).distinct.map(q -> _)
    }.toDF("query", "term")
    val allTerms = queries.flatMap(_._2).map(graft.functions.WordTok.lowerLikeSpark).distinct
    val p = Materialize.cutLazy(postings(df, idCol, textCol)
      .where(col("term").isin(allTerms: _*)))
    val dfs = documentFrequency(p)
    val contrib = p.join(broadcast(dfs), "term")
      .select(col("term"), col("doc_id"), bm25ContribPpm(n, avgdlMilli))
    val scored = contrib.join(broadcast(qt), "term")
      .groupBy("query", "doc_id").agg(sum(col("__contrib")).as("score_ppm"))
    val agg = E.column(graft.functions.TopKPairs(
      E.expression(col("score_ppm")), E.expression(col("doc_id").cast("long")),
      k).toAggregateExpression())
    scored.groupBy("query").agg(agg.as("__top"))
      .select(col("query"), posexplode(col("__top")).as(Seq("__pos", "__e")))
      .select(col("query"), (col("__pos") + 1).cast("int").as("rank"),
        col("__e.id").as("doc_id"), col("__e.score").as("score_ppm"))
  }

  /** Global bounded top-k over `(doc_id, score_ppm)` rows via ONE
    * [[graft.functions.TopKPairs]] aggregate (k-sized states shuffle, no
    * window), exploded to `rank, doc_id, score_ppm`. Tie order: score
    * DESC, id ASC. */
  private def rankTopK(scored: DataFrame, k: Int): DataFrame = {
    val agg = E.column(graft.functions.TopKPairs(
      E.expression(col("score_ppm")), E.expression(col("doc_id").cast("long")),
      k).toAggregateExpression())
    scored.agg(agg.as("__top"))
      .select(posexplode(col("__top")).as(Seq("__pos", "__e")))
      .select((col("__pos") + 1).cast("int").as("rank"),
        col("__e.id").as("doc_id"), col("__e.score").as("score_ppm"))
  }

  /** Per-document TF-IDF keywords: the `kPerDoc` highest-weighted terms
    * of each document, weight_ppm = (tf · 1e6 DIV dl) · idf_bits — the
    * same integer-exact bit-length idf as [[bm25TopK]]. Ties break on
    * ascending term (UTF-8 byte order, the order a binary-collation SQL
    * oracle sees). Output: `doc_id, rank, term, weight_ppm`.
    *
    * Plan shape: postings ⋈ df — BOTH sides partitioned by term (the df
    * aggregate rides the postings shuffle's layout; vocab at web scale is
    * far past broadcast), then ONE bounded [[graft.functions.TopKStrings]]
    * aggregate per doc — each task reduces a doc's candidate terms to
    * ≤ kPerDoc map-side; no window, no per-doc full sort. */
  def keywordsTfIdf(df: DataFrame, idCol: String, textCol: String,
                    kPerDoc: Int): DataFrame = {
    val (n, _) = corpusStats(df, textCol)
    require(n > 0, "keywordsTfIdf needs a non-empty corpus")
    val p = Materialize.cutLazy(postings(df, idCol, textCol))
    val dfs = documentFrequency(p)
    val weighted = p.join(dfs, "term")
      .select(col("doc_id"), col("term"),
        (expr("(tf * 1000000L) DIV dl") *
          length(bin(expr(s"${n}L DIV df"))).cast("long")).as("weight_ppm"))
    val agg = E.column(graft.functions.TopKStrings(
      E.expression(col("weight_ppm")), E.expression(col("term")),
      kPerDoc).toAggregateExpression())
    weighted.groupBy("doc_id").agg(agg.as("__top"))
      .select(col("doc_id"), posexplode(col("__top")).as(Seq("__pos", "__e")))
      .select(col("doc_id"), (col("__pos") + 1).cast("int").as("rank"),
        col("__e.item").as("term"), col("__e.score").as("weight_ppm"))
  }

  /** Persist the inverted index hash-bucketed BY TERM: postings land in
    * `nBuckets` directory partitions keyed by `xxhash64(term) mod
    * nBuckets`, so a query's scan PRUNES to its terms' buckets instead of
    * reading the whole index — the difference between touching ~|query|/
    * nBuckets of a 100 TB index and all of it. Corpus stats (n_docs,
    * total_tokens) persist alongside so queries need not touch the corpus.
    * Layout: `dir/postings/__tb=<bucket>/…` + `dir/stats`. */
  def buildPostingsIndex(df: DataFrame, idCol: String, textCol: String,
                         dir: String, nBuckets: Int = 64): Unit = {
    require(nBuckets >= 1, s"nBuckets must be >= 1, got $nBuckets")
    // the in-job path validates this (bm25TopK); without it here a
    // string-id corpus would INDEX fine and every later indexed query
    // would silently return empty (TopKPairs ignores NULL-cast ids)
    requireIntegralId(df, idCol, "buildPostingsIndex")
    val (n, tot) = corpusStats(df, textCol)
    postings(df, idCol, textCol)
      .withColumn("__tb", pmod(xxhash64(col("term")), lit(nBuckets.toLong)))
      .repartition(col("__tb"))
      .write.mode("overwrite").partitionBy("__tb").parquet(s"$dir/postings")
    import df.sparkSession.implicits._
    Seq((n, tot, nBuckets)).toDF("n_docs", "total_tokens", "n_buckets")
      .repartition(1).write.mode("overwrite").parquet(s"$dir/stats")
  }

  /** BM25 top-k against a persisted [[buildPostingsIndex]] index — same
    * output as [[bm25TopK]] on the indexed corpus (spec-pinned), but the
    * corpus itself is never touched and the postings scan prunes to the
    * query terms' hash buckets (`__tb IN …` is a partition filter; the
    * in-partition `term IN …` filter pushes to parquet row groups). */
  def bm25TopKIndexed(spark: SparkSession, dir: String,
                      queryTerms: Seq[String], k: Int): DataFrame = {
    require(queryTerms.nonEmpty, "bm25TopKIndexed needs at least one query term")
    val stats = spark.read.parquet(s"$dir/stats").head
    val n = stats.getAs[Long]("n_docs")
    val tot = stats.getAs[Long]("total_tokens")
    val nBuckets = stats.getAs[Int]("n_buckets")
    require(n > 0 && tot > 0, s"indexed corpus is empty (n=$n, tokens=$tot)")
    val avgdlMilli = tot * 1000L / n
    require(avgdlMilli > 0,
      s"bm25TopKIndexed: avg doc length floors to 0 milli-tokens (n=$n, tokens=$tot)")
    val terms = queryTerms.map(graft.functions.WordTok.lowerLikeSpark).distinct
    val p = spark.read.parquet(s"$dir/postings")
      .where(col("__tb").isin(bucketsOf(spark, terms, nBuckets): _*) &&
        col("term").isin(terms: _*))
      .drop("__tb")
    scoreAndRank(p, n, avgdlMilli, k)
  }

  /** Exact phrase occurrence counts: documents containing `phrase` as
    * CONSECUTIVE tokens, with how many times it occurs. Output: `doc_id,
    * n_occurrences` (docs without the phrase are absent). The positional
    * side of the retrieval family — BM25's bag-of-words OR can't see
    * adjacency.
    *
    * Plan shape: a PURE MAP — adjacency is a WITHIN-document property, so
    * each row counts its phrase starts over its own token array (one
    * tokenize + one tight scan per row via
    * [[graft.functions.PhraseOccurrences]]; handles repeated terms and
    * overlapping occurrences) and no token ever leaves its row: zero
    * shuffle, zero explode, composes on a readStream unchanged. (An
    * earlier formulation exploded positions and chained per-term
    * equi-joins — corpus-sized shuffles for a per-row computation.) */
  def phraseCount(df: DataFrame, idCol: String, textCol: String,
                  phrase: Seq[String]): DataFrame = {
    require(phrase.length >= 2, s"a phrase needs >= 2 terms, got $phrase")
    val n = phraseOccurrences(col(textCol), phrase)
    df.select(col(idCol).as("doc_id"), n.as("n_occurrences"))
      .where(col("n_occurrences") > 0)
  }

  /** Scalar form of [[phraseCount]]: occurrences of `phrase` as
    * consecutive tokens of `text` ([[graft.functions.PhraseOccurrences]] —
    * one tight per-row scan over the shared WordTok tokenizer), usable in
    * any projection, batch or streaming; also SQL-registered as
    * `phrase_occurrences(text, 'w1 w2 …')`. NULL text → NULL. */
  def phraseOccurrences(text: Column, phrase: Seq[String]): Column =
    E.column(graft.functions.PhraseOccurrences(E.expression(text), phrase))

  /** Append a NEW batch of documents to a persisted [[buildPostingsIndex]]
    * index without rebuilding it: the batch's postings land in the same
    * term-hash buckets (append mode — existing files untouched) and the
    * corpus stats are re-summed. After the append, [[bm25TopKIndexed]]
    * over the index ≡ an in-job [[bm25TopK]] over the union corpus
    * (spec-pinned): df counts fall out of the merged postings rows and
    * dl is per-doc, so the query path needs no merge logic at all.
    *
    * CONTRACT: batch doc ids must be NEW (an id re-appended would hold
    * two dl/tf row sets and score twice). The append is NOT idempotent —
    * re-running a batch double-counts it; gate re-runs upstream (e.g. a
    * processed-batch ledger) the way any append-only table is gated.
    * NOT ATOMIC either: postings append first, stats re-sum second, as
    * two plain-parquet writes — a failure between them leaves stats
    * undercounting the appended postings (idf/avgdl drift mildly until
    * repaired), and the natural retry double-counts per the
    * non-idempotency above. On a failed append, REBUILD the index (or
    * run on a transactional table format); plain parquet has no commit
    * protocol to make append+overwrite atomic, so this lifecycle
    * documents the failure mode instead of pretending otherwise. */
  def appendPostingsIndex(df: DataFrame, idCol: String, textCol: String,
                          dir: String): Unit = {
    val spark = df.sparkSession
    requireIntegralId(df, idCol, "appendPostingsIndex")
    val stats = spark.read.parquet(s"$dir/stats").head
    val nBuckets = stats.getAs[Int]("n_buckets")
    val (n, tot) = corpusStats(df, textCol)
    postings(df, idCol, textCol)
      .withColumn("__tb", pmod(xxhash64(col("term")), lit(nBuckets.toLong)))
      .repartition(col("__tb"))
      .write.mode("append").partitionBy("__tb").parquet(s"$dir/postings")
    import spark.implicits._
    Seq((stats.getAs[Long]("n_docs") + n, stats.getAs[Long]("total_tokens") + tot,
        nBuckets)).toDF("n_docs", "total_tokens", "n_buckets")
      .repartition(1).write.mode("overwrite").parquet(s"$dir/stats")
  }

  /** Hybrid retrieval: BM25 bag-of-words score PLUS a fixed bonus per
    * exact-phrase occurrence — the standard "phrase-boosted" ranking
    * (bag-of-words recall, adjacency precision). Both components are
    * integer-exact, so the COMPOSED score hash-gates like its parts.
    * score = bm25_ppm + phraseBonusPpm · occurrences(phrase). The phrase
    * count is computed in the doc-side PROJECTION, before the join — so
    * only `(doc_id, occurrences)` longs cross the exchange, never
    * document bodies (the "ship digests, not bodies" discipline; the
    * tokenize is a pure map on the same corpus scan postings already
    * pays). Output: `rank, doc_id, score_ppm`. */
  def bm25PhraseBoostTopK(df: DataFrame, idCol: String, textCol: String,
                          phrase: Seq[String], k: Int,
                          phraseBonusPpm: Long = 64000000L): DataFrame = {
    // default bonus is 64e6, not 1e6: the r8 idf64 grade is 64× the old
    // bit-length grade, so this keeps the phrase boost's RELATIVE weight
    // against the bag-of-words score unchanged
    require(phrase.length >= 2, s"a phrase needs >= 2 terms, got $phrase")
    requireIntegralId(df, idCol, "bm25PhraseBoostTopK")
    val (n, tot) = corpusStats(df, textCol)
    require(n > 0 && tot > 0, s"bm25PhraseBoostTopK needs a non-empty corpus")
    val avgdlMilli = tot * 1000L / n
    require(avgdlMilli > 0, "avg doc length floors to 0 milli-tokens")
    // the occ side lowercases through the shared tokenizer; the postings
    // filter must too, or a mixed-case phrase scores bag-of-words zero
    // while phraseOccurrences still matches — an inconsistent hybrid
    val lowPhrase = phrase.map(graft.functions.WordTok.lowerLikeSpark)
    val p = postings(df, idCol, textCol)
      .where(col("term").isin(lowPhrase.distinct: _*))
    val bm = bm25Scores(p, n, avgdlMilli).withColumnRenamed("score_ppm", "__bm")
    val occ = df.select(col(idCol).as("doc_id"),
      phraseOccurrences(col(textCol), phrase).as("__occ"))
    val boosted = bm.join(occ, "doc_id")
      .select(col("doc_id"),
        (col("__bm") + lit(phraseBonusPpm) * col("__occ")).as("score_ppm"))
    rankTopK(boosted, k)
  }

  /** Rank documents by an arbitrary INTEGER score through the bounded
    * top-k aggregate — the generic "prior" list for fusion (length,
    * recency, quality score). Ties break score DESC then id ASC, the
    * [[graft.functions.TopKPairs]] contract, so the list is deterministic
    * and SQL-replayable. Output: `rank, doc_id, score_ppm`. */
  def rankByScore(df: DataFrame, idCol: String, scoreCol: String,
                  k: Int): DataFrame = {
    requireIntegralId(df, idCol, "rankByScore")
    requireIntegralId(df, scoreCol, "rankByScore", role = "score")
    rankTopK(df.select(col(idCol).as("doc_id"),
      col(scoreCol).cast("long").as("score_ppm")), k)
  }

  /** Reciprocal-rank fusion of ranked lists (`rank, doc_id, ...` as
    * produced by [[bm25TopK]], [[rankByScore]], or the ANN rankers):
    * fused(doc) = Σ_lists 1e6 DIV (k0 + rank(doc)) — the standard way to
    * combine retrieval signals whose raw scores are incomparable (BM25
    * ppm vs cosine vs a length prior); only the RANKS matter. Integer
    * division keeps the fused score exact, so the composition hash-gates
    * like its inputs. Docs absent from a list contribute nothing for it.
    * One union + one bounded top-k — the lists are already ≤ their own k
    * rows, so this never touches the corpus. Output:
    * `rank, doc_id, score_ppm` (score is the fused RRF value). */
  def rrfFuse(lists: Seq[DataFrame], k: Int, k0: Long = 60L): DataFrame = {
    require(lists.nonEmpty, "rrfFuse needs at least one ranked list")
    require(k0 >= 1, s"k0 must be >= 1, got $k0")
    lists.foreach { l =>
      require(l.columns.contains("doc_id") && l.columns.contains("rank"),
        s"each list needs doc_id + rank columns, got ${l.columns.mkString(",")}")
      // loud on non-integral ids/ranks: the cast below would NULL string
      // ids and either fuse them into one bogus NULL row or trip the
      // duplicate check with a misleading message
      requireIntegralId(l, "doc_id", "rrfFuse")
      requireIntegralId(l, "rank", "rrfFuse", role = "rank")
    }
    val union = Materialize.cutLazy(lists.zipWithIndex.map { case (l, i) =>
      l.select(col("doc_id").cast("long").as("doc_id"),
        col("rank").cast("long").as("rank"), lit(i).as("__list"))
    }.reduce(_ union _))
    // a doc ranked twice WITHIN one list would sum two contributions and
    // silently inflate its fused score; a rank < 1 breaks the 1e6 DIV
    // (k0+rank) contract (and could hit DIV 0). The lists are ≤ their own
    // k rows, so this one extra aggregate over the materialized union is
    // driver-cheap insurance, not a corpus pass.
    // NULL VALUES pass the type check but vanish silently downstream (a
    // NULL rank NULLs its contribution; a NULL doc_id is dropped by
    // TopKPairs) — count them in the same cheap pass and fail loudly
    val nulls = union.agg(
      sum(when(col("doc_id").isNull, 1L).otherwise(0L)).as("__nd"),
      sum(when(col("rank").isNull, 1L).otherwise(0L)).as("__nr")).head
    require(nulls.isNullAt(0) || nulls.getLong(0) == 0L,
      "rrfFuse: NULL doc_id values in an input list")
    require(nulls.isNullAt(1) || nulls.getLong(1) == 0L,
      "rrfFuse: NULL rank values in an input list")
    val bad = union.groupBy("__list", "doc_id")
      .agg(count(lit(1)).as("__n"), min(col("rank")).as("__minr"))
      .agg(max(col("__n")).as("__maxn"), min(col("__minr")).as("__minr")).head
    // all-empty lists → NULL aggregates → legal (empty fusion)
    require(bad.isNullAt(0) || bad.getLong(0) <= 1L,
      "rrfFuse: a doc_id appears more than once within a single list")
    require(bad.isNullAt(1) || bad.getLong(1) >= 1L,
      s"rrfFuse: ranks must be >= 1, got ${bad.getLong(1)}")
    val scored = union
      .select(col("doc_id"), expr(s"1000000L DIV (${k0}L + rank)").as("__c"))
      .groupBy("doc_id").agg(sum(col("__c")).as("score_ppm"))
    rankTopK(scored, k)
  }

  /** Ranking-quality EVALUATION: nDCG@k, MRR@k and AP@k per query — the
    * offline eval harness for every ranker in this module (BM25, hybrid,
    * RRF, the ANN top-ks), integer-exact so the metrics themselves
    * hash-gate across engines.
    *
    *  - `run`: the system output, one row per retrieved doc —
    *    `(queryCol, docCol, rankCol)` with rank 1-based (the
    *    [[bm25TopK]]/[[rankByScore]] shape plus a query tag).
    *  - `truth`: graded relevance judgments `(queryCol, docCol, relCol)`
    *    with integer grades ≥ 1 (binary truth = all 1s; grades cap at
    *    `maxGrade` loudly — the 2^rel gain must stay long-safe).
    *
    * Formulas (all integer):
    *  - gain = 2^rel − 1 (the "exponential gain" DCG of Burges et al.
    *    '05); discount64(i) = lg64(i+1) − 64 = 64·log2(i+1) from below,
    *    EXACT whenever i+1 is a power of two (so the heads of the
    *    curve — ranks 1, 3, 7, 15 — carry no grade error at all);
    *    dcg_micro = Σ_{i≤k} (gain·64·10⁶) DIV discount64(i).
    *  - idcg_micro: the same sum over the query's judgments sorted by
    *    (rel DESC, doc ASC), i = 1..min(k, n_rel) — the ideal ordering.
    *  - ndcg_ppm = dcg_micro·10⁶ DIV idcg_micro.
    *  - mrr_ppm = 10⁶ DIV (first relevant rank ≤ k), 0 if none.
    *  - ap_ppm = (Σ_{relevant hits at rank i} hits_so_far·10⁶ DIV i)
    *    DIV min(n_rel, k) — average precision with the standard @k
    *    denominator.
    *
    * Queries with NO judgments have no ideal ordering and DROP OUT
    * (an eval set row, not a corpus row — absence is the signal).
    *
    * Output: `queryCol, n_rel, ndcg_ppm, mrr_ppm, ap_ppm`.
    *
    * Plan shape: truth aggregates per query (ideal window over ≤ its
    * own judgments, bounded by the eval set); the run joins judgments
    * on (query, doc) — one shuffle each on the composite key — then one
    * query-partitioned window over ≤ k rows and one groupBy(query).
    * Eval sets are small by nature; nothing here touches a corpus. */
  def rankingEval(run: DataFrame, truth: DataFrame, queryCol: String,
                  docCol: String, rankCol: String, relCol: String,
                  k: Int, maxGrade: Int = 30): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(maxGrade >= 1 && maxGrade <= 60,
      s"maxGrade must be in [1, 60], got $maxGrade")
    def disc(i: String) = s"(${graft.functions.Lg64.sql(i)} - 64)"
    // loud grade validation INSIDE the consumed column: a 0/negative
    // grade is a judgment-file bug (gain would read 0 — silently absent)
    val rel = expr(
      s"""CASE WHEN $relCol >= 1 AND $relCol <= $maxGrade THEN CAST($relCol AS BIGINT)
         |ELSE raise_error(concat('rankingEval: relevance grade out of [1, $maxGrade]: ',
         |  CAST($relCol AS STRING))) END""".stripMargin)
    val judged = truth.select(col(queryCol), col(docCol), rel.as("__rel"))
    // duplicate judgments for one (query, doc) would MULTIPLY run rows
    // through the left join and silently inflate every metric; a
    // duplicate doc within one query's run double-counts its gain. Eval
    // sets are small by contract, so the two checks are driver-cheap
    // insurance (the rrfFuse convention), not a corpus pass.
    val dupJ = judged.groupBy(col(queryCol), col(docCol))
      .agg(count(lit(1)).as("__c")).agg(max("__c")).head
    require(dupJ.isNullAt(0) || dupJ.getLong(0) <= 1L,
      "rankingEval: duplicate judgments for one (query, doc)")
    val dupR = run.groupBy(col(queryCol), col(docCol))
      .agg(count(lit(1)).as("__c")).agg(max("__c")).head
    require(dupR.isNullAt(0) || dupR.getLong(0) <= 1L,
      "rankingEval: a doc appears more than once in one query's run")
    // TIED ranks are as corrupting as duplicate docs (r10 advice): the
    // hits window orders by rankCol with the default RANGE frame, so two
    // rows at the same rank count each other as peers and the same DCG
    // discount applies twice — AP and nDCG silently inflate. A run is a
    // ranking; ties mean the producer is broken, so fail loudly.
    val dupK = run.groupBy(col(queryCol), col(rankCol))
      .agg(count(lit(1)).as("__c")).agg(max("__c")).head
    require(dupK.isNullAt(0) || dupK.getLong(0) <= 1L,
      "rankingEval: tied ranks within one query's run")
    // ideal DCG + n_rel: one window + one aggregate per query
    val wIdeal = Window.partitionBy(queryCol)
      .orderBy(col("__rel").desc, col(docCol).asc)
    val ideal = judged
      .withColumn("__i", row_number().over(wIdeal).cast("long"))
      .groupBy(col(queryCol))
      .agg(count(lit(1)).as("n_rel"),
        sum(when(col("__i") <= k,
          expr(s"((shiftleft(1L, CAST(__rel AS INT)) - 1) * 64000000L) DIV ${disc("(__i + 1)")}"))
          .otherwise(0L)).as("__idcg"))
    // the run, graded: unjudged docs carry rel 0
    val wRun = Window.partitionBy(queryCol).orderBy(col(rankCol))
    val scored = run.where(col(rankCol) <= k)
      .join(judged, Seq(queryCol, docCol), "left")
      .withColumn("__g", coalesce(col("__rel"), lit(0L)))
      .withColumn("__hits",
        sum(when(col("__g") >= 1, 1L).otherwise(0L)).over(wRun))
      .groupBy(col(queryCol))
      .agg(
        sum(expr(s"((shiftleft(1L, CAST(__g AS INT)) - 1) * 64000000L) DIV ${disc(s"($rankCol + 1)")}"))
          .as("__dcg"),
        min(when(col("__g") >= 1, col(rankCol))).as("__r1"),
        sum(when(col("__g") >= 1,
          expr(s"(__hits * 1000000L) DIV $rankCol")).otherwise(0L)).as("__apsum"))
    ideal.join(scored, Seq(queryCol), "left")
      .select(col(queryCol), col("n_rel"),
        expr("coalesce((__dcg * 1000000L) DIV __idcg, 0L)").as("ndcg_ppm"),
        expr("coalesce(1000000L DIV CAST(__r1 AS BIGINT), 0L)").as("mrr_ppm"),
        expr(s"coalesce(__apsum DIV least(n_rel, ${k}L), 0L)").as("ap_ppm"))
  }

  /** Search-result snippets: the ±`window`-token context around the
    * first occurrence of any query term, per document
    * ([[graft.functions.SnippetAround]] — one tokenize + one scan per
    * row, pure map, stream-safe). Docs with no match are absent. Output:
    * `doc_id, snippet`. */
  def snippets(df: DataFrame, idCol: String, textCol: String,
               terms: Seq[String], window: Int): DataFrame =
    df.select(col(idCol).as("doc_id"),
        E.column(graft.functions.SnippetAround(
          E.expression(col(textCol)), terms, window)).as("snippet"))
      .where(col("snippet").isNotNull)

  /** RANK-BIASED OVERLAP (Webber et al. 2010) between two ranked lists
    * per query, at p = 1/2 and depth `d`, as an EXACT integer: the
    * ranking-similarity metric for comparing retrieval variants (did the
    * new scorer reshuffle the head or just the tail? — RBO top-weights
    * exactly the positions users see). The standard prefix form
    *
    *   RBO_min = Σ_{k=1..d} (1−p)·p^(k−1) · |A_k ∩ B_k| / k
    *
    * regroups per shared doc: a doc at ranks (ra, rb) joins every prefix
    * k ≥ max(ra, rb), so its total weight is W(max(ra,rb)) with
    * W(m) = Σ_{k=m..d} (L/k)·2^(d−k), L = lcm(1..d) — ALL integer. The
    * op is then one equi join on (query, doc) + a W-array-literal lookup
    * + one aggregate; identical rankings score exactly L·(2^d − 1), and
    * the output normalizes to ppm by integral division. `d ≤ 16` keeps
    * every intermediate within BIGINT.
    *
    * Docs outside a list's top-d are simply outside the prefix (rows
    * with rank > d are filtered, not errors); ranks < 1 fail loudly
    * (the rrfFuse contract); queries present in either input but
    * sharing no docs report rbo_ppm = 0 rather than vanishing. Output:
    * `queryCol, shared_docs, rbo_ppm`. */
  def rboPrefix(a: DataFrame, b: DataFrame, queryCol: String,
                d: Int = 10): DataFrame = {
    require(d >= 1 && d <= 16, s"d must be in [1, 16], got $d")
    Seq(a, b).foreach { l =>
      require(l.columns.contains(queryCol) && l.columns.contains("doc_id") &&
        l.columns.contains("rank"),
        s"each list needs $queryCol + doc_id + rank columns, got ${l.columns.mkString(",")}")
      requireIntegralId(l, "doc_id", "rboPrefix")
      requireIntegralId(l, "rank", "rboPrefix", role = "rank")
    }
    val lcm = (1 to d).foldLeft(1L)((acc, k) => acc / gcd(acc, k) * k)
    // W(m), 1-indexed; strictly decreasing in m
    val w = (1 to d).map(m =>
      (m to d).map(k => (lcm / k) << (d - k)).sum).toArray
    val full = lcm * ((1L << d) - 1) // the identical-rankings score
    def side(df: DataFrame, r: String) = {
      val clean = df.select(col(queryCol), col("doc_id").cast("long").as("doc_id"),
        when(col("rank") >= 1, col("rank").cast("long"))
          .otherwise(raise_error(lit("rboPrefix: ranks must be >= 1"))).as(r))
      clean.where(col(r) <= d)
    }
    val sa = Materialize.cutLazy(side(a, "__ra"))
    val sb = Materialize.cutLazy(side(b, "__rb"))
    // a doc ranked twice WITHIN one list's prefix would join twice and
    // silently inflate its weight (the rrfFuse hazard, same insurance:
    // one cheap aggregate over the ≤d-per-query filtered frames)
    val dup = sa.select(col(queryCol), col("doc_id"), lit(0).as("__l"))
      .union(sb.select(col(queryCol), col("doc_id"), lit(1).as("__l")))
      .groupBy(queryCol, "doc_id", "__l").agg(count(lit(1)).as("__n"))
      .agg(max("__n")).head
    require(dup.isNullAt(0) || dup.getLong(0) <= 1L,
      "rboPrefix: a doc_id appears more than once within one list's top-d prefix")
    val joined = sa.join(sb, Seq(queryCol, "doc_id"))
      .select(col(queryCol),
        element_at(lit(w), greatest(col("__ra"), col("__rb")).cast("int")).as("__w"))
      .groupBy(queryCol)
      .agg(count(lit(1)).as("shared_docs"),
        expr(s"(sum(__w) * 1000000) DIV ${full}L").as("rbo_ppm"))
    a.select(col(queryCol)).union(b.select(col(queryCol))).distinct()
      .join(joined, Seq(queryCol), "left")
      .select(col(queryCol), coalesce(col("shared_docs"), lit(0L)).as("shared_docs"),
        coalesce(col("rbo_ppm"), lit(0L)).as("rbo_ppm"))
  }

  private def gcd(x: Long, y: Long): Long = if (y == 0) x else gcd(y, x % y)

  /** The buckets the query terms land in — ONE local job through Spark's
    * own xxhash64 expression (build and query can never disagree on the
    * hash; per-term jobs would serialize q scheduler round-trips onto the
    * index fast path). */
  private def bucketsOf(spark: SparkSession, terms: Seq[String],
                        nBuckets: Int): Seq[Long] = {
    import spark.implicits._
    terms.toDF("t")
      .select(pmod(xxhash64(col("t")), lit(nBuckets.toLong)))
      .collect().map(_.getLong(0)).toSeq.distinct
  }
}
