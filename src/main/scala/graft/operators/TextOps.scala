package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators over the `documents` table: corpus stats,
  * token counting, quality scoring, language ID, fingerprinting. All pure
  * column expressions (codegen'd) — no UDFs, no shuffle except the
  * explicit group-bys.
  */
object TextOps {

  private def normText: Column = lower(trim(col("text")))
  private def toks: Column = split(normText, "\\s+")

  /** 24. Corpus stats per (lang, source): doc counts and char-length
    * distribution — the first report any data pipeline runs.
    */
  def q24TextStats(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"))
      // integer round-half-up e2 then one shared /100.0 — the sf1
      // certification caught ROUND(float division) diverging at a
      // .xx5 boundary (297.775 → 297.78 vs 297.77); the q21 ratio
      // rule applies to averages too
      // Column-API division by a double literal — an expr-level `/ 100.0`
      // parses 100.0 as DECIMAL(4,1) and makes the OUTPUT DecimalType,
      // which the driver hasher normalizes differently per engine.
      .withColumn("avg_chars", expr(
        """CAST((2 * 100 * total_chars + n_docs) DIV (2 * n_docs)
           AS BIGINT)""") / lit(100.0))

  /** 25. Token counting: whitespace tokens, alpha "BPE-ish" subtokens
    * (maximal [a-z]+ runs), distinct token count.
    */
  def q25TokenCount(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id"),
      size(toks).cast("long").as("n_tokens"),
      size(regexp_extract_all(normText, lit("[a-z]+"), lit(0))).cast("long")
        .as("n_subtokens"),
      size(array_distinct(toks)).cast("long").as("n_distinct_tokens"))

  private val Stopwords = Seq("the", "a", "of", "and", "to", "in")

  /** 26. Quality scoring: token count, stopword ratio, average token
    * length, and a composite score — the filters an LLM-data pipeline
    * applies before training.
    */
  def q26QualityScore(s: SparkSession, d: String): DataFrame = {
    // Ratios via integer round-half-up ((2000x + n) div 2n) so the result
    // is exact — round(float-division) is nondeterministic across engines
    // at .xx5 boundaries.
    Tables.documents(s, d).select(
      col("doc_id"),
      size(toks).cast("long").as("n_tokens"),
      size(filter(toks, t => t.isin(Stopwords.map(x => x: Any): _*)))
        .cast("long").as("stop_cnt"),
      length(regexp_replace(normText, "\\s+", "")).cast("long").as("nonspace"))
    .select(
      col("doc_id"), col("n_tokens"),
      (expr("(stop_cnt * 2000 + n_tokens) div (2 * n_tokens)")
        .cast("double") / 1000).as("stop_ratio"),
      (expr("(nonspace * 200 + n_tokens) div (2 * n_tokens)")
        .cast("double") / 100).as("avg_token_len"),
      (col("n_tokens") >= 20 && col("n_tokens") <= 1000).as("length_ok"))
  }

  /** Marker stopwords per language — the classic cheap lang-ID heuristic.
    * (The synthetic corpus is English-vocabulary-only; real-language
    * behavior is exercised in the test suite on multilingual samples.)
    */
  private val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is", "to", "in", "that", "it"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu"),
    "es" -> Seq("el", "la", "los", "las", "es", "y", "un", "una", "que"),
    "fr" -> Seq("le", "la", "les", "est", "et", "un", "une", "dans", "ce"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有", "和", "不"))

  /** Language scores: fraction of tokens that are markers of each lang
    * (zh scored by character occurrence since it doesn't whitespace-split).
    */
  def langIdCol(textCol: Column): Column = {
    val t = split(lower(trim(textCol)), "\\s+")
    val scores: Seq[(String, Column)] = LangMarkers.map { case (lang, ms) =>
      val sc =
        if (lang == "zh")
          ms.map(m => length(textCol) - length(regexp_replace(textCol, m, "")))
            .reduce(_ + _).cast("double")
        else
          size(filter(t, x => x.isin(ms.map(m => m: Any): _*))).cast("double")
      lang -> sc
    }
    val best = greatest(scores.map(_._2): _*)
    scores.foldLeft(lit("und")) { case (acc, (lang, sc)) =>
      when(sc === best && best > 0, lang).otherwise(acc)
    }
  }

  /** 27. Language ID over documents (rows-only check; accuracy asserted
    * in the test suite on real multilingual samples).
    */
  def q27LangId(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), langIdCol(col("text")).as("predicted_lang"))

  /** 28. Document fingerprint: rolling hash over tokens — each step
    * chains the accumulator with the next token hash (order-sensitive,
    * unlike the minhash set signature; overflow-free under ANSI mode,
    * unlike a polynomial multiply-add). Pure fold — no shuffle. The
    * xxhash64 FAST path (`spark.graft.fingerprint.family=xxhash64`) —
    * Spark-only, rows-only checkable.
    */
  def fingerprintCol(textCol: Column): Column =
    aggregate(
      transform(split(lower(trim(textCol)), "\\s+"), t => xxhash64(t)),
      lit(0L), (acc, h) => xxhash64(acc, h))

  /** 28 (default family, r14): md5-derived POSITION-TAGGED fingerprint
    * — the Md5MinHash engine-identical-hash precedent applied to the
    * ordered token stream. Token t at 1-based position i contributes
    * h = first 13 md5 hex digits of `t:i` as a 52-bit int;
    * fingerprint = Σh mod 10¹⁸, folded with per-step mod (bounded:
    * acc < 10¹⁸ + 2⁵², no ANSI overflow) so the fold equals the plain
    * SUM-then-mod the DuckDB oracle computes. Order-sensitive (the
    * position tag is inside the hash), shuffle-free, and — unlike the
    * xxhash64 chain — replayable in ANSI SQL, which flips q28 to a
    * full oracle (the r13 verdict's gate endgame).
    */
  def md5FingerprintCol(textCol: Column): Column =
    aggregate(
      transform(split(lower(trim(textCol)), "\\s+"),
        (t, i) => conv(substring(md5(concat(t, lit(":"),
          (i + 1).cast("string"))), 1, 13), 16, 10).cast("long")),
      lit(0L), (acc, h) => (acc + h) % lit(1000000000000000000L))

  def q28Fingerprint(s: SparkSession, d: String): DataFrame = {
    val fam = s.conf.getOption("spark.graft.fingerprint.family")
      .getOrElse("md5")
    val fp = if (fam == "xxhash64") fingerprintCol(col("text"))
      else md5FingerprintCol(col("text"))
    Tables.documents(s, d).filter(col("text").isNotNull)
      .select(col("doc_id"), fp.as("fingerprint"))
  }

  /** 50. Deterministic per-group sampling: k docs per lang by hash
    * order (uniform, reproducible, mergeable — the distributed way to
    * sample; rand() samples aren't reproducible across retries and
    * drivers). Hash = md5 of the id so the oracle can reproduce it.
    */
  def q50SamplePerGroup(s: SparkSession, d: String): DataFrame =
    graft.plans.TopK.perKey(
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), col("source"),
          md5(col("doc_id").cast("string").cast("binary")).as("sample_key")),
      keys = Seq("lang"), order = Seq(("sample_key", false)), k = 5)

  /** 54. Text cleaning for training data: strip non-printable chars,
    * collapse whitespace runs, trim, lowercase — with before/after
    * lengths so the aggressiveness is observable.
    */
  def q54TextClean(s: SparkSession, d: String): DataFrame = {
    val cleaned = lower(trim(regexp_replace(
      regexp_replace(col("text"), "[^\\x20-\\x7e]", " "), "\\s+", " ")))
    Tables.documents(s, d).select(
      col("doc_id"),
      length(col("text")).cast("long").as("len_raw"),
      cleaned.as("text_clean"),
      length(cleaned).cast("long").as("len_clean"))
  }

  /** 52. Repetition quality filters (the Gopher-style signals): top
    * single-token share and distinct-token ratio — high repetition is
    * the classic low-quality-document marker. One explode + count
    * shuffle; ratios in exact integer round-half-up arithmetic.
    */
  def q52RepetitionFilters(s: SparkSession, d: String): DataFrame = {
    val perTok = Tables.documents(s, d)
      .select(col("doc_id"), explode(toks).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("c"))
    perTok.groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_tokens"),
        max(col("c")).as("top_token_freq"),
        count(lit(1)).as("n_distinct"))
      .select(col("doc_id"),
        col("n_tokens").cast("long").as("n_tokens"),
        col("top_token_freq").cast("long").as("top_token_freq"),
        (expr("(top_token_freq * 2000 + n_tokens) div (2 * n_tokens)")
          .cast("double") / 1000).as("top_token_share"),
        (expr("(n_distinct * 2000 + n_tokens) div (2 * n_tokens)")
          .cast("double") / 1000).as("distinct_ratio"))
  }

  /** 58. TF-IDF-style top terms per document — the classic
    * distinguishing-term extraction over a training corpus. Score is the
    * INTEGER-exact df-weighted frequency `tf * (N+1) * 1000 div (df+1)`
    * (a monotone transform of tf/df): `ln`-based idf differs in the last
    * ulp across libm implementations, which breaks cross-engine
    * hash-equality at rounding boundaries — integer arithmetic can't.
    * Corpus size N comes from parquet footer stats (no plan-build scan);
    * ranking runs on the TopKPerKey heap operator (no sort).
    */
  def q58TfIdfTerms(s: SparkSession, d: String): DataFrame = {
    val n = graft.sources.TableStatistics.tableRowCount(s, d, "documents")
    val tf = Tables.documents(s, d)
      .select(col("doc_id"), explode(toks).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val scored = tf.join(dfreq, "tok")
      .withColumn("score",
        expr(s"tf * ${n + 1}L * 1000L div (df + 1)"))
    graft.plans.TopK.perKey(
      scored.select("doc_id", "tok", "tf", "df", "score"),
      keys = Seq("doc_id"), order = Seq(("score", true), ("tok", false)),
      k = 3)
  }

  /** 59. Token-count histogram (fixed-width buckets) — the corpus
    * length-distribution report that sizes training shards. One
    * explode-free pass + one tiny aggregation shuffle.
    */
  def q59TokenHistogram(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(size(toks).cast("long").as("nt"))
      .select((expr("nt div 10") * 10).as("bucket_lo"))
      .groupBy(col("bucket_lo"))
      .agg(count(lit(1)).as("n_docs"))

  /** 47. Corpus n-gram mining: top-20 word trigrams by frequency.
    * Shingle per row (no shuffle), explode, one count shuffle, sort-limit
    * the tiny aggregate — the shape that survives any corpus size.
    */
  def q47TopNgrams(s: SparkSession, d: String): DataFrame = {
    // Materialize the token array as a bound column FIRST: referencing
    // the raw split() expression inside the lambda re-tokenizes the
    // whole text per element_at call (O(L²) per doc — measured 3×
    // slower at sf0.1).
    val t = col("tk")
    val trigrams = transform(sequence(lit(1), size(t) - 2),
      i => concat_ws(" ", element_at(t, i), element_at(t, i + 1),
        element_at(t, i + 2)))
    Tables.documents(s, d)
      .select(toks.as("tk"))
      .filter(size(t) >= 3)
      .select(explode(trigrams).as("trigram"))
      .groupBy(col("trigram"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("trigram").asc)
      .limit(20)
  }

  /** 77. Source-mix sampling: downsample every language/domain to the
    * smallest one's size — the "data mixing" step that rebalances a
    * web-scale corpus before training. Keep decisions are a
    * DETERMINISTIC md5-hash threshold per row (uniform, reproducible
    * across retries and engines — rand() is neither), with per-domain
    * thresholds derived from group counts.
    *
    * 100-TB shape: the counts/threshold table is O(#domains) — driver
    * scale — and broadcasts; the corpus takes ONE scan + filter with no
    * shuffle at all (the count aggregation ships only map-side partial
    * counts). Threshold arithmetic is integer/IEEE-double exact, so the
    * DuckDB oracle reproduces the exact sampled row set.
    */
  def q63SourceMix(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select(col("doc_id"), col("lang"))
    val counts = docs.groupBy(col("lang")).agg(count(lit(1)).as("cnt"))
    // thr = first 8 md5 hex chars ≤ printf("%08x", floor(rate × (2³²-1)))
    // — lexicographic compare of equal-length lowercase hex == numeric
    // compare of the top 32 hash bits, identical in any engine
    val thr = counts
      .crossJoin(broadcast(counts.agg(min(col("cnt")).as("min_cnt"))))
      .select(col("lang"), format_string("%08x",
        floor(col("min_cnt").cast("double") / col("cnt").cast("double")
          * 4294967295.0d).cast("long")).as("thr"))
    docs.join(broadcast(thr), "lang")
      .filter(substring(md5(encode(col("doc_id").cast("string"), "UTF-8")),
        1, 8) <= col("thr"))
      .select("doc_id", "lang")
  }

  private val EmailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  private val NumRe = "[0-9]{7,}"

  /** 78. PII scrubbing: redact email addresses and long digit runs from
    * text — mandatory hygiene before training on scraped data. Pure
    * per-row codegen'd regex (embarrassingly parallel, no shuffle); the
    * patterns are RE2-safe (character classes + bounded quantifiers, no
    * backtracking blowup), so a hostile document can't wedge an
    * executor. The synthetic corpus carries no PII, so a deterministic
    * contact line derived from doc_id is appended first — making the
    * scrub verifiable end to end against the oracle (counts + cleaned
    * text hash-match).
    */
  def q64PiiScrub(s: SparkSession, d: String): DataFrame = {
    val raw = Tables.documents(s, d).select(col("doc_id"),
      concat(col("text"), lit(" contact user"),
        col("doc_id").cast("string"), lit("@mail.example tel "),
        (col("doc_id") * 37 + 10000000L).cast("string")).as("raw"))
    raw.select(col("doc_id"),
      size(regexp_extract_all(col("raw"), lit(EmailRe), lit(0)))
        .cast("long").as("n_emails"),
      size(regexp_extract_all(col("raw"), lit(NumRe), lit(0)))
        .cast("long").as("n_numbers"),
      regexp_replace(regexp_replace(col("raw"), EmailRe, "<EMAIL>"),
        NumRe, "<NUM>").as("clean_text"))
  }

  /** 79. Document chunking: split each document's token stream into
    * fixed-size windows with overlap — the step that turns raw
    * documents into model-sized training examples (and RAG index
    * entries). Pure per-row array arithmetic: ONE corpus scan, zero
    * shuffle, and the explode multiplies rows only by tokens/step —
    * shape-invariant at any corpus size.
    */
  def q65Chunking(s: SparkSession, d: String): DataFrame = {
    val chunkTokens = 64
    val overlap = 16
    val step = chunkTokens - overlap
    val t = col("tk")
    val nChunks = greatest(lit(1L),
      ceil((size(t).cast("double") - overlap) / step).cast("long"))
    Tables.documents(s, d)
      .filter(col("text").isNotNull)
      .select(col("doc_id"), toks.as("tk"))
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0L), nChunks - 1),
          i => concat_ws(" ",
            slice(t, (i * step + 1).cast("int"), lit(chunkTokens)))))
          .as(Seq("chunk_id", "chunk_text")))
      .select(col("doc_id"), col("chunk_id").cast("long").as("chunk_id"),
        col("chunk_text"),
        size(split(col("chunk_text"), " ")).cast("long").as("n_tokens"))
  }

  /** 80. Sequence packing: lay every language's documents end to end
    * (deterministic doc_id order) into one token stream and cut it
    * every `capacity` tokens — exactly how pretraining packs short
    * documents into fixed-length sequences without padding waste. Each
    * doc gets its stream offset and first/last bin; a doc may straddle
    * a bin boundary (concat-then-chunk semantics).
    *
    * The offset is a [[DistributedRank.withRunningSum]] prefix sum —
    * a plain `SUM OVER (PARTITION BY lang ORDER BY doc_id)` window is
    * one reducer per language (5 reducers sorting a fifth of a 100-TB
    * corpus each); the primitive range-partitions, sums slices in
    * parallel, and broadcasts the per-slice offsets.
    */
  def q66SequencePacking(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .filter(col("text").isNotNull)
      .select(col("doc_id"), col("lang"),
        size(toks).cast("long").as("n_tokens"))
    DistributedRank
      .withRunningSum(docs, Seq("lang"), Seq("doc_id"), "n_tokens",
        "tok_offset")
      .select(col("doc_id"), col("lang"), col("n_tokens"), col("tok_offset"),
        expr("tok_offset div 2048").as("bin_first"),
        expr("(tok_offset + n_tokens - 1) div 2048").as("bin_last"))
  }

  /** 81. Corpus-adaptive boilerplate removal: drop every token whose
    * document frequency exceeds half the corpus — the data-driven
    * cousin of a fixed stopword list (CCNet/C4-style boilerplate
    * filtering learns what is boilerplate FROM the corpus).
    *
    * 100-TB shape: the document-frequency aggregation ships only
    * map-side partial (token, count) pairs; the resulting hot set is
    * inherently tiny (only near-universal tokens clear a 50% df bar —
    * stopword-scale, kilobytes) so it broadcasts as one array and the
    * corpus takes one scan + per-row filter. The hot-set lambda is
    * O(tokens × |hot|) per row — fine precisely because |hot| is
    * bounded by the threshold's semantics, never corpus-sized.
    */
  def q67Boilerplate(s: SparkSession, d: String): DataFrame = {
    val base = Tables.documents(s, d)
      .filter(col("text").isNotNull)
      .select(col("doc_id"), toks.as("tk"))
    val dfreq = base
      .select(explode(array_distinct(col("tk"))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val nDocs = base.agg(count(lit(1)).as("n_docs"))
    val hot = dfreq.crossJoin(broadcast(nDocs))
      .filter(col("df") > col("n_docs") * 0.5)
      .agg(sort_array(collect_set(col("tok"))).as("hot"))
    base.crossJoin(broadcast(hot))
      .select(col("doc_id"),
        filter(col("tk"), t => !array_contains(col("hot"), t)).as("kept"),
        size(col("tk")).as("n_in"))
      .select(col("doc_id"),
        concat_ws(" ", col("kept")).as("clean_text"),
        (col("n_in") - size(col("kept"))).cast("long").as("n_removed"))
  }

  /** 82. Deterministic global shuffle order: assign every document a
    * dense position in an md5-keyed permutation — the "shuffle the
    * corpus before training" step, made reproducible across runs,
    * retries and engines (ORDER BY rand() is none of those). Built on
    * [[DistributedRank.withRank]] with no grouping: range partition by
    * the hash, rank slices in parallel, broadcast slice offsets —
    * never a single-reducer global row_number.
    */
  def q68ShuffleOrder(s: SparkSession, d: String): DataFrame =
    DistributedRank.withRank(
      Tables.documents(s, d).select(col("doc_id"),
        md5(encode(col("doc_id").cast("string"), "UTF-8")).as("h")),
      Seq(), Seq("h", "doc_id"), "shuffle_pos")
      .select("doc_id", "h", "shuffle_pos")

  /** 83. Deterministic train/val/test split: each doc's md5 hex keys a
    * uniform position in [0,1) and fixed hex-prefix thresholds carve
    * 90/5/5 ("e666" ≈ 0.9 × 16^4, "f333" ≈ 0.95). Hash-split beats
    * rand() splits everywhere it matters at scale: reproducible across
    * runs/retries/engines, stable under corpus growth (a doc never
    * migrates between splits when new data arrives), and pure per-row
    * work — one scan, zero shuffle, no state.
    */
  def q69Split(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        md5(encode(col("doc_id").cast("string"), "UTF-8")).as("h"))
      .withColumn("split",
        when(col("h") < "e666", "train")
          .when(col("h") < "f333", "val")
          .otherwise("test"))

  /** 84. Per-domain quota (RefinedWeb/C4-style source caps): keep at
    * most k docs per (lang, source), chosen by hash order so the cap is
    * a uniform sample, not a scan-order artifact. Runs on the TopKPerKey
    * heap operator: map-side size-k heaps mean the shuffle carries ≤ k
    * rows per (partition, domain) — a window row_number() would shuffle
    * and sort the whole corpus to throw most of it away.
    */
  def q70DomainCap(s: SparkSession, d: String): DataFrame =
    graft.plans.TopK.perKey(
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), col("source"),
          md5(encode(col("doc_id").cast("string"), "UTF-8")).as("cap_key")),
      keys = Seq("lang", "source"),
      order = Seq(("cap_key", false), ("doc_id", false)), k = 8)

  /** 85. Temperature-scaled source mixing weights (multinomial-sampling
    * α = 0.5, the "rebalance heads and tails" step before training):
    * weight ∝ n_docs^0.5, reported as exact ppm shares. Determinism
    * across engines: IEEE sqrt is correctly rounded (bit-identical in
    * every libm), `floor(sqrt(n)·1e6)` fixes the weight as an integer,
    * and the share is integer round-half-up — no float division, no
    * .xx5 shortest-repr divergence. One groupBy of domain cardinality
    * (tiny) + a broadcast total; the corpus is scanned once.
    */
  def q71MixWeights(s: SparkSession, d: String): DataFrame = {
    val counts = Tables.documents(s, d)
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("w_fixed",
        floor(sqrt(col("n_docs").cast("double")) * 1e6).cast("long"))
    val total = counts.agg(sum(col("w_fixed")).as("w_total"))
    counts.crossJoin(broadcast(total))
      .select(col("lang"), col("source"), col("n_docs"), col("w_fixed"),
        expr("(w_fixed * 1000000 * 2 + w_total) div (2 * w_total)")
          .as("share_ppm"))
  }

  /** 86. Bigram-coverage quality score: the share of a doc's word
    * bigrams that appear in the corpus's top-1000 bigram list — a
    * counts-only stand-in for n-gram LM scoring (docs whose local word
    * order matches the corpus's dominant patterns score high; shuffled
    * or boilerplate-injected text scores low). The hot list is bounded
    * by construction (top-k of a group-by, ranked with a deterministic
    * tie-break) so it broadcasts; coverage is then one scan of per-row
    * array work. Score is integer round-half-up parts-per-thousand.
    */
  def q74BigramCov(s: SparkSession, d: String): DataFrame = {
    val n1 = greatest(size(col("tk")) - 1, lit(0))
    val base = Tables.documents(s, d)
      .filter(col("text").isNotNull)
      .select(col("doc_id"), toks.as("tk"))
      .withColumn("bg",
        zip_with(slice(col("tk"), lit(1), n1), slice(col("tk"), lit(2), n1),
          (a, b) => concat(a, lit(" "), b)))
    val hot = base
      .select(explode(col("bg")).as("bg"))
      .groupBy(col("bg")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("bg").asc)
      .limit(1000)
      .agg(sort_array(collect_list(col("bg"))).as("hotbg"))
    base.crossJoin(broadcast(hot))
      .select(col("doc_id"),
        size(col("bg")).cast("long").as("n_bigrams"),
        // codegen'd binary search per bigram — the HOF
        // size(filter(bg, x -> array_contains(hotbg, x))) runs
        // interpreted at O(|bg|·1000) comparisons per row
        graft.functions.CountInSorted.countIn(s, col("bg"), col("hotbg"))
          .as("n_hot"))
      .withColumn("cov_ppt",
        when(col("n_bigrams") === 0, lit(0L))
          .otherwise(expr("(n_hot * 1000 * 2 + n_bigrams) div (2 * n_bigrams)")))
  }

  /** 91. Heavy hitters via a Misra–Gries sketch pass + exact re-count:
    * tokens with frequency > n/64. Pass 1 runs the mergeable
    * [[graft.functions.MisraGries]] Aggregator (256 counters — every
    * item above n/257 provably survives, a safety margin over the n/64
    * report threshold) and yields a ≤256-token candidate set plus the
    * exact total n. Pass 2 re-counts ONLY the candidates and applies
    * the exact threshold. The full groupBy over every distinct token —
    * the thing that shuffles a 100-TB keyspace — never happens; the
    * sketch state is O(k) per partition and the recount shuffles ≤256
    * keys. Output is exact, so the DuckDB oracle matches it.
    */
  def q77Hh(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val thresholdK = 64
    val tokDs = Tables.documents(s, d).filter(col("text").isNotNull)
      .select(explode(toks).as("tok")).as[String]
    val (cands, total) =
      tokDs.select(graft.functions.MisraGries.sketch(256).toColumn).head()
    tokDs.toDF("tok")
      .filter(col("tok").isin(cands: _*))
      .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * thresholdK > lit(total))
      .select(col("tok"), col("cnt"))
  }

  /** 99. Token-budget corpus selection: fill a fixed per-language token
    * budget by admitting docs in md5-hash order until the budget is
    * exhausted — the "give me N tokens per language" cut every training
    * run starts with. Hash order makes the cut a uniform, reproducible
    * sample (scan order is an ingestion artifact; rand() breaks retries)
    * and docs never leave the selection when the corpus grows — only the
    * tail past the budget moves.
    *
    * The cumulative fill level is the distributed prefix sum
    * ([[graft.operators.DistributedRank.withRunningSum]]): range
    * partition on (lang, hash) → parallel per-slice sums → broadcast
    * per-(partition, lang) offsets. A `SUM OVER (PARTITION BY lang)`
    * window would send each language through ONE reducer — languages
    * are few and huge, exactly the degenerate window shape. Token
    * counts are integers, so the fill arithmetic is engine-exact.
    */
  def q82TokenBudget(s: SparkSession, d: String): DataFrame = {
    val budget = 2500L
    val t = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"),
        size(toks).cast("long").as("n_tokens"),
        md5(encode(col("doc_id").cast("string"), "UTF-8")).as("h"))
    DistributedRank.withRunningSum(t, Seq("lang"), Seq("h", "doc_id"),
        "n_tokens", "tokens_before")
      .filter(col("tokens_before") < budget)
      .select("doc_id", "lang", "n_tokens", "tokens_before")
  }

  /** 118. PMI collocation mining: the top bigrams by pointwise mutual
    * information — ASSOCIATION strength, not raw frequency (q47's
    * count-ranked n-grams surface stopword pairs; PMI surfaces pairs
    * that co-occur far more than their unigram rates predict — the
    * phrase/named-entity detector of an LLM-data pipeline, Mikolov et
    * al. 2013 §4's phrase scoring with the standard min-count gate).
    *
    * PMI = ln(N·c_xy / (c_x·c_y)), and ln differs in the last ulp
    * across libms (the q58 rule) — so both the RANKING and the output
    * carry the ratio itself in round-half-up fixed-point (ln is
    * monotone: ratio order IS PMI order), computed in DECIMAL(38,0) so
    * N·c_xy·2000 can never overflow a long under ANSI mode.
    *
    * 100-TB shape: the corpus is touched by exactly two map-side
    * combined count aggregations (unigrams, bigrams ≥ min-count); the
    * joins and the ranking run on the VOCAB-scale tables that survive —
    * the min-count gate fires before any join, and the final top-50 is
    * a TakeOrdered (no global sort shuffle).
    */
  def q103Pmi(s: SparkSession, d: String): DataFrame =
    pmi(Tables.documents(s, d), minCount = 20L)

  /** [[q103Pmi]]'s core over any (text) frame. */
  def pmi(documents: DataFrame, minCount: Long): DataFrame = {
    val t = col("tk")
    val docs = documents.filter(col("text").isNotNull)
      .select(toks.as("tk"))
    // materialized once: the vocab-scale unigram table feeds BOTH
    // c_x/c_y joins and the total — without the cut each consumer
    // would re-run the corpus-scale explode+count
    val uni = docs.select(explode(t).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c_w"))
      .localCheckpoint(false)
    val tot = uni.agg(sum(col("c_w")).as("n_total"))
    val n1 = greatest(size(t) - 1, lit(0))
    val bi = docs.filter(size(t) >= 2)
      .select(explode(zip_with(slice(t, lit(1), n1), slice(t, lit(2), n1),
        (a, b) => struct(a.as("x"), b.as("y")))).as("p"))
      .groupBy(col("p.x").as("x"), col("p.y").as("y"))
      .agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= minCount)
    bi.join(uni.select(col("w"), col("c_w").as("c_x")), col("x") === col("w"))
      .drop("w")
      .join(uni.select(col("w"), col("c_w").as("c_y")), col("y") === col("w"))
      .drop("w")
      .crossJoin(broadcast(tot))
      .select(col("x"), col("y"), col("n_pair"),
        expr("""CAST((CAST(n_pair AS DECIMAL(38,0)) * n_total * 2000
                      + CAST(c_x AS DECIMAL(38,0)) * c_y)
                     DIV (2 * CAST(c_x AS DECIMAL(38,0)) * c_y)
                AS BIGINT)""").as("milli"))
      .orderBy(col("milli").desc, col("x").asc, col("y").asc)
      .limit(50)
      .select(col("x"), col("y"), col("n_pair"),
        (col("milli").cast("double") / 1000).as("score"))
  }

  /** 119. Inverted-index build: term → BLOCKED posting lists
    * (`doc_id:tf` runs of ≤64 docs in doc_id order) — the retrieval
    * artifact behind BM25 search and RAG corpus serving. Blocking is
    * the part that matters at scale: a stopword's posting list at
    * 100 TB is billions of ids, so one (term) row is undumpable — the
    * segmented layout keeps every output row bounded and
    * independently fetchable (the standard search-engine posting
    * format), and block boundaries at fixed doc-rank multiples make
    * the layout deterministic, append-friendly, and skip-indexable
    * (block_id × max-doc_id-per-block is the skip table).
    *
    * The per-term doc rank that assigns blocks is
    * [[DistributedRank.withRank]] — a `row_number OVER (PARTITION BY
    * term)` window would send each term's entire posting list through
    * ONE reducer, exactly the stopword-skew shape that dies first.
    * Corpus → (term, doc, tf) is one map-side-combined aggregation;
    * within-block order rides `array_sort` on (doc_id, tf) structs,
    * never a sort shuffle.
    */
  def q104InvertedIndex(s: SparkSession, d: String): DataFrame =
    invertedIndex(Tables.documents(s, d), blockSize = 64)

  /** [[q104InvertedIndex]]'s core over any (doc_id, text) frame. */
  def invertedIndex(documents: DataFrame, blockSize: Int): DataFrame =
    invertedIndexFromTf(docTermTf(documents), blockSize)

  /** The (term, doc_id, tf) table both index builders start from —
    * split out (r15) so q118 tokenizes the corpus ONCE and feeds the
    * standing build and the delta from the same checkpointed table.
    */
  private[graft] def docTermTf(documents: DataFrame): DataFrame =
    documents.filter(col("text").isNotNull)
      .select(col("doc_id"), explode(toks).as("term"))
      .groupBy(col("term"), col("doc_id")).agg(count(lit(1)).as("tf"))

  private[graft] def invertedIndexFromTf(tf: DataFrame,
      blockSize: Int): DataFrame =
    DistributedRank.withRank(tf, Seq("term"), Seq("doc_id"), "rk")
      .withColumn("block_id", expr(s"(rk - 1) div ${blockSize.toLong}"))
      .groupBy(col("term"), col("block_id"))
      .agg(count(lit(1)).as("n_docs"),
        array_join(transform(
          array_sort(collect_list(struct(col("doc_id"), col("tf")))),
          p => concat_ws(":", p.getField("doc_id"), p.getField("tf"))), ",")
          .as("postings"))

  /** 134. Incremental inverted-index maintenance: fold an APPEND-ONLY
    * batch of new documents into an existing blocked postings index
    * ([[invertedIndex]]'s layout) WITHOUT rebuilding untouched terms or
    * re-reading indexed text — the q97/q102/q93 incremental-artifact
    * rule applied to the retrieval index (a production corpus re-crawls
    * daily; re-tokenizing 100 TB to refresh postings is the naive plan
    * this replaces).
    *
    * Contract: every new doc_id exceeds every indexed doc_id (the
    * append-only ingest order [[graft.streaming.CorpusIngest]]
    * produces). That makes the merge PARSE-FREE: within a term, new
    * postings sort strictly after existing ones, so the partially
    * filled tail block extends by pure string concat — postings strings
    * are never split back into entries. New docs rank per term via
    * [[DistributedRank.withRank]] (the stopword-skew rule), offset by
    * the term's prior doc count; rows landing in the tail block merge,
    * later ranks open fresh blocks; a term whose tail is exactly full
    * starts at tail_id+1 by the same arithmetic — no special case.
    *
    * The existing index is touched twice, both term-local: a per-term
    * (prior, tail) aggregate over the delta's terms, and the
    * final anti-join that passes untouched blocks through — in a real
    * term-partitioned layout that anti-join is partition pruning
    * (only affected terms' files rewrite). The result is DEFINED to
    * equal the full rebuild, so q104's oracle IS the oracle.
    */
  def invertedIndexDelta(existing: DataFrame, newDocs: DataFrame,
      blockSize: Int): DataFrame =
    invertedIndexDeltaFromTf(existing, docTermTf(newDocs), blockSize)

  private[graft] def invertedIndexDeltaFromTf(existing: DataFrame,
      newTf: DataFrame, blockSize: Int): DataFrame = {
    val bs = blockSize.toLong
    val ranked = DistributedRank.withRank(newTf, Seq("term"),
      Seq("doc_id"), "rk")
    val prior = existing.groupBy(col("term"))
      .agg(sum(col("n_docs")).as("prior"))
    val placed = ranked.join(prior, Seq("term"), "left")
      .withColumn("grk", coalesce(col("prior"), lit(0L)) + col("rk"))
      .withColumn("block_id", expr(s"(grk - 1) div $bs"))
    val newPost = placed.groupBy(col("term"), col("block_id"))
      .agg(count(lit(1)).as("n_new"),
        array_join(transform(
          array_sort(collect_list(struct(col("doc_id"), col("tf")))),
          p => concat_ws(":", p.getField("doc_id"), p.getField("tf"))), ",")
          .as("post_new"))
    val merged = newPost
      .join(existing.withColumnRenamed("n_docs", "n_old")
        .withColumnRenamed("postings", "post_old"),
        Seq("term", "block_id"), "left")
      .select(col("term"), col("block_id"),
        (coalesce(col("n_old"), lit(0L)) + col("n_new")).as("n_docs"),
        when(col("post_old").isNotNull,
          concat(col("post_old"), lit(","), col("post_new")))
          .otherwise(col("post_new")).as("postings"))
    existing.join(merged, Seq("term", "block_id"), "left_anti")
      .unionByName(merged)
  }

  /** [[invertedIndexDelta]] driver-visible instantiation: the oldest
    * 4/5 of the corpus is the standing index (footer-stat threshold —
    * no scan), the newest 1/5 arrives as the append batch; the
    * maintained index must equal q104's full rebuild bit for bit.
    */
  def q118IncrIndex(s: SparkSession, d: String): DataFrame = {
    val n = graft.sources.TableStatistics.tableRowCount(s, d, "documents")
    val t = 4L * n / 5L
    // r15: ONE corpus tokenize pass — tf is doc-local, so the full
    // (term, doc_id, tf) table filtered by the doc_id threshold equals
    // the per-slice tokenize the two builders used to run separately
    // (the standing build and the delta each re-scanned the text).
    val tf = docTermTf(Tables.documents(s, d)).localCheckpoint(false)
    val standing = invertedIndexFromTf(tf.filter(col("doc_id") < t), 64)
    invertedIndexDeltaFromTf(standing, tf.filter(col("doc_id") >= t), 64)
  }

  /** 126. Bigram-LM fluency scoring (the CCNet/Wenzek et al. 2020
    * perplexity-style quality filter): train an add-one-smoothed bigram
    * language model on the corpus, score every document by its MEAN
    * smoothed conditional probability p(wᵢ | wᵢ₋₁) — fluent text rides
    * common transitions and scores high; keyboard mash, lorem-ipsum and
    * mid-word-shuffled spam score near the smoothing floor. This is the
    * model-based complement of the surface heuristics in q26/q52.
    *
    * Perplexity proper is exp of a MEAN LOG prob, and `ln` differs in
    * the last ulp across libms (the q58/q103 rule) — so the score is the
    * mean probability itself, kept in round-half-up integer ppm
    * end-to-end: per bigram type, ppm = ⌊(2·10⁶·(c_xy+1) + (c_x+V)) /
    * (2·(c_x+V))⌋ with context count c_x = Σ_y c_xy and unigram vocab
    * size V; per doc, the k-weighted mean of those ppms, rounded the
    * same way. Engine-exact, and order-preserving for any monotone use
    * (a perplexity threshold IS a mean-probability threshold).
    *
    * 100-TB shape: the per-doc bigram-type table (doc_id, x, y, k) is
    * materialized ONCE and feeds both the training aggregation (two
    * map-side-combined rollups: bigram counts, then context counts on
    * the vocab²-scale survivors) and the scoring join — the corpus text
    * is tokenized exactly once. The model tables are vocab-scale
    * artifacts a production run would persist and reuse for held-out
    * scoring; the scoring join shuffles on the bigram key, and the
    * final per-doc mean is one doc-keyed aggregation.
    */
  def q111LmScore(s: SparkSession, d: String): DataFrame =
    lmScore(Tables.documents(s, d))

  /** [[q111LmScore]]'s core over any (doc_id, text) frame. Emits one row
    * per document with ≥1 bigram: (doc_id, n_bigrams, score_ppm).
    */
  def lmScore(documents: DataFrame): DataFrame = {
    val docs = documents.filter(col("text").isNotNull)
      .select(col("doc_id"), toks.as("tk"))
    val n1 = greatest(size(col("tk")) - 1, lit(0))
    // per-doc bigram types with multiplicity: corpus-scale, built once
    val db = docs.filter(size(col("tk")) >= 2)
      .select(col("doc_id"),
        explode(zip_with(slice(col("tk"), lit(1), n1),
          slice(col("tk"), lit(2), n1),
          (a, b) => struct(a.as("x"), b.as("y")))).as("p"))
      .groupBy(col("doc_id"), col("p.x").as("x"), col("p.y").as("y"))
      .agg(count(lit(1)).as("k"))
      .localCheckpoint(false)
    val bi = db.groupBy(col("x"), col("y")).agg(sum(col("k")).as("c_xy"))
    val ctx = bi.groupBy(col("x")).agg(sum(col("c_xy")).as("c_x"))
    // unigram vocab size: the add-one denominator (scalar, broadcast)
    val voc = docs.select(explode(col("tk")).as("w"))
      .agg(count_distinct(col("w")).as("v"))
    val scored = bi
      .join(ctx, "x")
      .crossJoin(broadcast(voc))
      .select(col("x"), col("y"),
        expr("(2000000 * (c_xy + 1) + (c_x + v)) DIV (2 * (c_x + v))")
          .as("ppm"))
    db.join(scored, Seq("x", "y"))
      .groupBy(col("doc_id"))
      .agg(sum(col("k")).as("n_bigrams"),
        expr("(2 * sum(k * ppm) + sum(k)) DIV (2 * sum(k))")
          .as("score_ppm"))
  }

  /** 127. BM25 top-k retrieval (Robertson & Zaragoza 2009, the Lucene
    * `k1=1.2, b=0.75` variant with the always-positive
    * `ln(1 + (N-df+0.5)/(df+0.5))` idf): the query-serving side of the
    * q104 inverted index — given a query's terms, rank documents by
    * saturated-tf × rarity. The query workload is derived
    * deterministically from the corpus itself (each of the `nQueries`
    * lowest doc_ids contributes its `qTerms` globally-rarest terms, df
    * ties by term), the "find documents like this seed" retrieval-eval
    * shape.
    *
    * ENGINE-EXACT INTEGER SCORING (a full oracle row; was rows-only
    * while the idf went through libm `ln`, whose last ulp differs
    * across engines — the q58 rule): the idf argument is the exact
    * rational (2N+2)/(2df+1) and its log is computed as e9 fixed-point
    * integer arithmetic via [[bm25LnSteps]] — range-reduce by the
    * integer-compare power of two, then the atanh series on
    * z=(m−1)/(m+1) < 1/3, every division a truncating non-negative DIV
    * so Spark and DuckDB replay bit-identical values (absolute error vs
    * true ln ≲ 1e-8, irrelevant: BOTH engines rank by the same
    * integer). The tf-saturation factor is the exact rational
    * 88·L·tf / (40·L·tf + 12·L + 36·dl·N) (the k1/b constants cleared
    * to integers over denominator 40·L), contributions are
    * round-half-up e9 longs, and the per-doc score is their exact
    * integer sum — order-free, so no sorted-fold is needed.
    *
    * 100-TB shape: the corpus is touched once to build the (term,
    * doc_id, tf, dl) posting relation (materialized once, reused for
    * document-frequency stats, query derivation and scoring — in
    * production this IS the persisted q104 index, stored typed instead
    * of re-tokenized). The tiny query-term table broadcasts into the
    * posting scan, so candidate scoring shuffles only the postings of
    * the ≤ nQueries·qTerms query terms (rare terms by construction —
    * short posting lists); the final top-k is the heap-cut
    * [[graft.plans.TopK.perKey]], never a global sort.
    */
  def q112Bm25(s: SparkSession, d: String): DataFrame =
    bm25TopK(Tables.documents(s, d), nQueries = 8, qTerms = 3, k = 10)

  /** BM25's idf ln(_p/_q) as [[graft.functions.FixedLn]] steps with
    * output `idf_e9` — see FixedLn for the algorithm, bounds, and the
    * operator family it unlocks. Long-safe for corpora up to ~2.3e9
    * docs (p = 2N+2 in the z-numerator bound).
    */
  private[graft] def bm25LnSteps(div: String): Seq[(String, String)] =
    graft.functions.FixedLn.steps(div, "idf_e9")

  /** [[q112Bm25]]'s core over any (doc_id, text) frame. */
  def bm25TopK(documents: DataFrame, nQueries: Int, qTerms: Int,
      k: Int): DataFrame = {
    val base = documents.filter(col("text").isNotNull)
      .select(col("doc_id"), toks.as("tk"))
    // the typed posting relation: (term, doc_id, tf) + doc length
    val tf = base
      .select(col("doc_id"), size(col("tk")).cast("long").as("dl"),
        explode(col("tk")).as("term"))
      .groupBy(col("term"), col("doc_id"), col("dl"))
      .agg(count(lit(1)).as("tf"))
      .localCheckpoint(false)
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val stats = base.agg(count(lit(1)).as("n_docs"),
      sum(size(col("tk"))).cast("long").as("total_len"))
    // query workload: nQueries lowest doc_ids × their qTerms rarest terms
    val seeds = base.select(col("doc_id").as("query_id"))
      .orderBy(col("query_id")).limit(nQueries)
    val seedTerms = tf
      .join(broadcast(seeds), col("doc_id") === col("query_id"), "inner")
      .select(col("query_id"), col("term"))
    val qterms = graft.plans.TopK.perKey(
      seedTerms.join(dfreq, "term"),
      keys = Seq("query_id"), order = Seq(("df", false), ("term", false)),
      k = qTerms).select(col("query_id"), col("term"), col("df"))
    // score candidates: postings of query terms only (broadcast probe);
    // per-term contribution in exact e9 integers. r15: the ~16-step
    // interpreted fold (see [[bm25LnSteps]], still the oracle's
    // spelling) became the native graft_ln_e9 expression — same
    // integer kernel, one codegen'd Project (the q272 swap, VERDICT
    // r14 #6); FixedLnSpec pins expression ≡ step list.
    val withIdf = tf.join(broadcast(qterms), Seq("term"))
      .crossJoin(broadcast(stats))
      .withColumn("_p", expr("2 * n_docs + 2"))
      .withColumn("_q", expr("2 * df + 1"))
      .withColumn("idf_e9", graft.functions.FixedPointExpressions
        .lnE9(documents.sparkSession, col("_p"), col("_q")))
    val contrib = withIdf
      .withColumn("_num", expr("88 * total_len * tf"))
      .withColumn("_den",
        expr("40 * total_len * tf + 12 * total_len + 36 * dl * n_docs"))
      // idf_e9·num overflows a long at corpus scale → DECIMAL(38,0)
      // INTERNAL math, BIGINT out (the r7 decimal-output rule)
      .withColumn("contrib_e9", expr(
        """CAST((2 * CAST(idf_e9 AS DECIMAL(38,0)) * _num + _den)
                DIV (2 * _den) AS BIGINT)"""))
      .select(col("query_id"), col("doc_id"), col("contrib_e9"))
    val scored = contrib
      .groupBy(col("query_id"), col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_terms"),
        sum(col("contrib_e9")).cast("long").as("score_e9"))
    graft.plans.TopK.perKey(scored, keys = Seq("query_id"),
      order = Seq(("score_e9", true), ("doc_id", false)), k = k)
  }

  /** 129. Weighted sampling WITHOUT replacement per group (Ohlsson 1998
    * SEQUENTIAL POISSON sampling, the πps workhorse of official
    * statistics): keep the k rows with the SMALLEST u/w, where u is a
    * 52-bit uniform derived from `md5(doc_id || '|' || salt)` — the
    * distributed form of "sample k docs per language proportional to
    * weight" (quality-weighted corpus subsetting, eval-set draws,
    * curriculum mixes). Hash-derived randomness, not `rand()`: the draw
    * is REPRODUCIBLE (same salt → same sample on every retry/backfill,
    * the q63/q69 rule) and inclusion tracks weight (P(doc heads the
    * draw) ≈ w/Σw; the planted-dominance test measures it).
    *
    * Engine-exact by construction: the md5 hash family is identical in
    * Spark and DuckDB (the q31 rule) and the draw key is INTEGER
    * h DIV w (h = first 13 md5 hex digits as a 52-bit int, truncating
    * division — non-negative, so Spark DIV and DuckDB // agree), ties
    * by doc_id. No pow/ln touches the order (the previous A-ES
    * u^(1/w) form needed libm pow → was rows-only; sequential Poisson
    * ranks by u/w, which integerizes exactly), so the draw is a full
    * oracle row.
    *
    * 100-TB shape: one scan computes the key, the per-group top-k is
    * the [[graft.plans.TopK.perKey]] heap cut (map-side k-bounded, no
    * global or per-group sort, no skew trap on giant groups).
    */
  def q114WeightedSample(s: SparkSession, d: String): DataFrame =
    weightedSample(
      Tables.documents(s, d).filter(col("text").isNotNull)
        .select(col("doc_id"), col("lang"),
          size(toks).cast("long").as("weight")),
      groupCols = Seq("lang"), k = 10, salt = 42L)

  /** [[q114WeightedSample]]'s keyed frame: every row with its
    * sequential-Poisson draw key (exposed separately so tests and
    * resumable pipelines can persist/inspect the full keyed
    * population). `sp_key` = h DIV w with h the 52-bit md5-derived
    * uniform numerator; smaller key = earlier pick.
    */
  def weightedSampleKeys(rows: DataFrame, salt: Long): DataFrame =
    rows.withColumn("sp_key",
      // integer DIV, never Column./ — double division can round a
      // just-below-boundary quotient UP before the cast truncates
      expr(s"""CAST(conv(substring(md5(concat(CAST(doc_id AS STRING),
                 '|', '$salt')), 1, 13), 16, 10) AS BIGINT)
               DIV weight"""))

  /** Sequential-Poisson k-smallest per group over
    * [[weightedSampleKeys]].
    */
  def weightedSample(rows: DataFrame, groupCols: Seq[String], k: Int,
      salt: Long): DataFrame =
    graft.plans.TopK.perKey(weightedSampleKeys(rows, salt),
      keys = groupCols, order = Seq(("sp_key", false), ("doc_id", false)),
      k = k)

  /** 140. Corpus drift detection: every source's unigram distribution
    * scored against the corpus-wide distribution by TOTAL-VARIATION
    * distance in integer ppm — the "did this crawl/source shift under
    * us" monitor a training-data pipeline runs per ingest (the
    * distribution-level complement of q109's per-column expectations;
    * flags a source whose CONTENT changed even when every row-level
    * check still passes).
    *
    * TV = ½·Σ_t |p_src(t) − p_corp(t)| needs the sum over the WHOLE
    * vocabulary including terms the source never uses; the grid
    * (sources × vocab) is never materialized — absent terms contribute
    * exactly (Σ_all t_ppm − Σ_present t_ppm), so per-source sums over
    * PRESENT terms plus one broadcast scalar close the algebra.
    * Shapes: one corpus-scale (source, term) aggregate, one vocab-scale
    * term join, #sources output rows. All probabilities are round-half-
    * up integer ppm (the q21 ratio rule) — log-free, so unlike KL/JS
    * divergence the whole metric is engine-exact integer arithmetic
    * (the libm `ln()` last-ulp trap documented at q58 never opens).
    */
  def q124SourceDrift(s: SparkSession, d: String): DataFrame = {
    val tok = Tables.documents(s, d)
      .select(col("source"), explode(toks).as("term"))
      .filter(length(col("term")) > 0)
    val st = tok.groupBy("source", "term").agg(count(lit(1)).as("n_st"))
    val srcTot = st.groupBy("source").agg(sum("n_st").as("n_s"))
    val termTot = st.groupBy("term").agg(sum("n_st").as("n_t"))
    val corpTot = termTot.agg(sum("n_t").as("n_c"))
    val termPpm = termTot.crossJoin(broadcast(corpTot))
      .select(col("term"),
        expr("(2000000 * n_t + n_c) DIV (2 * n_c)").as("t_ppm"))
    val totPpm = termPpm.agg(sum("t_ppm").as("tot_ppm"))
    st.join(broadcast(srcTot), "source")
      .withColumn("s_ppm", expr("(2000000 * n_st + n_s) DIV (2 * n_s)"))
      .join(termPpm, "term")
      .groupBy("source")
      .agg(max("n_s").as("n_tokens"),
        count(lit(1)).as("n_terms"),
        sum(abs(col("s_ppm") - col("t_ppm"))).as("pd"),
        sum("t_ppm").as("pp"))
      .crossJoin(broadcast(totPpm))
      .select(col("source"), col("n_tokens"), col("n_terms"),
        expr("(pd + tot_ppm - pp) DIV 2").as("tv_ppm"))
  }

  /** 156. q139: TextRank keyword extraction (Mihalcea & Tarau 2004) —
    * corpus keywords as the PageRank of the word co-occurrence graph:
    * tokens (lowercased alpha runs, length >= 4) are nodes, each
    * adjacent pair in the filtered token sequence is an undirected
    * edge, kept WITH multiplicity so frequent collocations weigh more
    * (the [[GraphOps.pageRank]] contract treats parallel edges as
    * integer weights: od sums them and each occurrence contributes
    * r div od). Unlike q70's TF-IDF — which scores terms by rarity —
    * TextRank scores by graph centrality: a mid-frequency word that
    * bridges many contexts outranks a frequent-but-isolated one.
    *
    * Shapes: the pair build is one zip of two array slices per doc
    * (O(len), no self-join); the iteration inherits q105's machinery —
    * node-scale rank vector broadcast per round, edges never
    * re-shuffled, integer ppt fixed-point so 10 rounds are
    * order-independent and engine-exact; top-20 is a TakeOrdered heap
    * with (rank desc, word asc) ties.
    */
  def q139TextRank(s: SparkSession, d: String): DataFrame = {
    val toks = Tables.documents(s, d).filter(col("text").isNotNull)
      .select(filter(split(lower(col("text")), "[^a-z]+"),
        t => length(t) >= 4).as("tk"))
      .filter(size(col("tk")) >= 2)
    val pairs = toks
      .select(explode(expr(
        """zip_with(slice(tk, 1, size(tk) - 1),
                    slice(tk, 2, size(tk) - 1),
                    (x, y) -> struct(x AS w1, y AS w2))""")).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .filter(col("w1") =!= col("w2")) // pageRank forbids self-loops
    val edges = pairs.select(col("w1").as("src"), col("w2").as("dst"))
      .unionAll(pairs.select(col("w2").as("src"), col("w1").as("dst")))
    GraphOps.pageRank(edges, 10)
      .orderBy(col("r").desc, col("node").asc)
      .limit(20)
      .select(col("node").as("word"), col("r").as("rank_ppt"))
  }

  /** 169. q152: exact-count stratified sampling — a num/den fraction of
    * the corpus drawn so that (a) the GLOBAL sample size is exactly
    * round-half-up(N·num/den), (b) per-stratum counts are the
    * largest-remainder (Hamilton) allocation of that global target —
    * the q147 proration math applied to sampling — and (c) membership
    * is a pure function of the row id (rank by md5(id), the q63/q69
    * reproducibility rule: same corpus → same sample, no stored
    * assignment, no rand()). q50's hash-threshold sampling hits the
    * fraction only in expectation; an eval-set builder that must ship
    * "exactly 10k docs, stratified by language" needs exact counts.
    *
    * Scale shape: one map-combined stratum count; the Hamilton split
    * runs on that BOUNDED table (global window over |strata| rows —
    * the q113 tiny-aggregate exception); per-stratum ranks come from
    * [[DistributedRank.withRank]] (range-partitioned — no single
    * reducer per giant stratum), and the per-stratum quotas broadcast
    * into the final filter join.
    */
  def stratifiedExactSample(docs: DataFrame, stratumCol: String,
      idCol: String, num: Long, den: Long): DataFrame = {
    require(num >= 0 && den > 0, "fraction must be a valid ratio")
    val base = docs.filter(col(stratumCol).isNotNull)
      .select(col(stratumCol).as("_s"), col(idCol).as("_id"))
    val counts = base.groupBy(col("_s")).agg(count(lit(1)).as("_n"))
    val tot = counts.agg(sum(col("_n")).cast("long").as("_tot"))
    // global window over the per-stratum counts artifact (bounded by
    // stratum cardinality) — benign
    val kWin = Window.orderBy(col("_rem").desc, col("_s"))
    val quotas = counts.crossJoin(broadcast(tot))
      .withColumn("_K", expr(s"(2 * _tot * $num + $den) DIV (2 * $den)"))
      .withColumn("_base", expr("(_K * _n) DIV _tot"))
      .withColumn("_rem", expr("(_K * _n) % _tot"))
      .withColumn("_left", col("_K") - sum(col("_base"))
        .over(Window.partitionBy(lit(1))))
      .withColumn("_rk", row_number().over(kWin).cast("long"))
      .select(col("_s"), (col("_base") +
        when(col("_rk") <= col("_left"), 1L).otherwise(0L)).as("_ks"))
    val ranked = DistributedRank.withRank(
      base.withColumn("_h", md5(col("_id").cast("string"))),
      groupCols = Seq("_s"), orderCols = Seq("_h", "_id"), rankCol = "_rk")
    ranked.join(broadcast(quotas), Seq("_s"))
      .filter(col("_rk") <= col("_ks"))
      .select(col("_s").as(stratumCol), col("_id").as(idCol),
        col("_rk").as("sample_rank"))
  }

  /** q152: a 1/10 corpus sample, exact-count stratified by language. */
  def q152StratSample(s: SparkSession, d: String): DataFrame =
    stratifiedExactSample(Tables.documents(s, d), "lang", "doc_id",
      num = 1L, den = 10L)

  /** q171: total-variation distance matrix between sources on the
    * length distribution — TV(a,b) = ½ Σ_bins |pₐ − p_b| over fixed
    * 500-char bins (capped at 20): "which sources have interchangeable
    * length profiles" — the pairwise-distance completion of q124's
    * one-vs-rest drift score, and the calibration check behind q168's
    * normalization. One corpus-scale (source, bin) aggregate; the
    * pairwise Σ runs on the bounded sources×bins ARTIFACT (dense
    * zero-filled grid so missing bins count). TV is a RATIONAL
    * statistic: Σ|cₐᵢ·n_b − c_bᵢ·nₐ| / (2·nₐ·n_b) — exact signed-free
    * integer arithmetic, round-half-up ppm (abs removes the sign trap).
    */
  def q171TvMatrix(s: SparkSession, d: String): DataFrame = {
    val binned = Tables.documents(s, d)
      .filter(col("n_chars").isNotNull)
      .select(col("source"), least(expr("n_chars DIV 500"), lit(20L))
        .as("bin"))
    val counts = binned.groupBy(col("source"), col("bin"))
      .agg(count(lit(1)).as("c"))
    val sizes = counts.groupBy(col("source"))
      .agg(sum(col("c")).cast("long").as("n"))
    val bins = counts.select(col("bin")).distinct()
    val grid = sizes.select(col("source")).crossJoin(bins)
      .join(counts, Seq("source", "bin"), "left")
      .select(col("source"), col("bin"),
        coalesce(col("c"), lit(0L)).as("c"))
    val a = grid.join(sizes, "source")
      .select(col("source").as("source_a"), col("bin"),
        col("c").as("_ca"), col("n").as("n_a"))
    val b = grid.join(sizes, "source")
      .select(col("source").as("source_b"), col("bin"),
        col("c").as("_cb"), col("n").as("n_b"))
    a.join(b, Seq("bin"))
      .filter(col("source_a") < col("source_b"))
      .groupBy(col("source_a"), col("source_b"), col("n_a"), col("n_b"))
      .agg(sum(abs(col("_ca").cast("decimal(38,0)") * col("n_b") -
        col("_cb").cast("decimal(38,0)") * col("n_a")))
        .cast("decimal(38,0)").as("_s"))
      .select(col("source_a"), col("source_b"), col("n_a"), col("n_b"),
        // value = _s·10⁶ / (2·nₐ·n_b); round-half-up simplifies to
        // (_s·10⁶ + nₐ·n_b) DIV (2·nₐ·n_b)
        expr("""CAST((_s * 1000000 + CAST(n_a AS DECIMAL(38,0)) * n_b)
            DIV (2 * CAST(n_a AS DECIMAL(38,0)) * n_b) AS BIGINT)""")
          .as("tv_ppm"))
  }

  /** q168: quantile normalization across sources — each document's
    * n_chars is replaced by the GLOBAL value at its within-source
    * percentile, so every source's length distribution maps onto the
    * corpus-wide one (the cross-source feature alignment that makes
    * per-source quality thresholds comparable; the microarray
    * normalization classic applied to corpus stats — and the
    * source-calibration complement of q124's drift detection).
    * Rank-based and integer-exact end to end: within-source rank rₛ of
    * nₛ maps to global rank ⌈rₛ·N/nₛ⌉ by round-UP integer division —
    * the nearest-rank (type-1) quantile, no interpolation, no floats.
    * Two `DistributedRank` passes (per-source and global — range
    * slices + broadcast offsets, no single-reducer window) and ONE
    * shuffle join on the unique global rank.
    */
  def q168QuantileNorm(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .filter(col("n_chars").isNotNull)
      .select(col("doc_id"), col("source"), col("n_chars"))
    val tot = docs.agg(count(lit(1)).cast("long").as("n_total"))
    val sizes = docs.groupBy(col("source"))
      .agg(count(lit(1)).cast("long").as("_n_s"))
    val withinRank = DistributedRank.withRank(docs, Seq("source"),
      Seq("n_chars", "doc_id"), "_rn_s")
    val globalRank = DistributedRank.withRank(docs, Nil,
      Seq("n_chars", "doc_id"), "_rn_g")
      .select(col("_rn_g"), col("n_chars").as("norm_chars"))
    withinRank.join(broadcast(sizes), "source")
      .crossJoin(broadcast(tot))
      .withColumn("_rn_g",
        expr("(_rn_s * n_total + _n_s - 1) DIV _n_s"))
      .join(globalRank, "_rn_g")
      .select(col("doc_id"), col("source"), col("n_chars"),
        col("norm_chars"))
  }

  /** q199: vocabulary-growth curve per source (the raw points behind a
    * Heaps'-law fit): at every power-of-2 document prefix of the
    * source's doc_id order (plus the full size), the cumulative token
    * count and cumulative DISTINCT-token count — the corpus-health
    * signal data curation watches (a flattening curve means the crawl
    * is re-reading itself; a straight log-log line is fresh text).
    * The fit itself needs ln (the q58 libm rule) so the operator
    * emits the exact integer curve and leaves the regression to the
    * caller.
    *
    * Exactness: "distinct tokens in the first c docs" = tokens whose
    * FIRST position ≤ c — one corpus-scale (source, token) MIN
    * aggregate, so cumulative-distinct never rescans prefixes.
    * Checkpoints are a log-sized broadcast spine; both cumulative
    * sums are banded joins of bounded artifacts (per-doc counts,
    * first-position table) against it. The doc_id rank runs on the
    * DOCS table partitioned by source (at extreme per-source doc
    * counts swap in DistributedRank — the q78/q182 machinery).
    */
  def q199VocabGrowth(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .filter(col("text").isNotNull)
      .select(col("doc_id"), col("source"),
        filter(split(lower(trim(col("text"))), "\\s+"),
          t => t =!= "").as("tk"))
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("source")).orderBy(col("doc_id")))
        .cast("long"))
      .localCheckpoint(false) // feeds tokens, counts, and checkpoints
    val cps = docs.groupBy(col("source"))
      .agg(max(col("pos")).as("_n"))
      .select(col("source"), explode(array_distinct(concat(
        filter(transform(sequence(lit(0), lit(40)),
          k => pow(lit(2.0), k).cast("long")), c => c <= col("_n")),
        array(col("_n"))))).as("checkpoint"))
    val perDoc = docs.select(col("source"), col("pos"),
      size(col("tk")).cast("long").as("_ntk"))
    val firstPos = docs
      .select(col("source"), col("pos"), explode(col("tk")).as("_tok"))
      .groupBy(col("source"), col("_tok")).agg(min(col("pos")).as("_fp"))
    val cumTok = perDoc.join(broadcast(cps), Seq("source"))
      .filter(col("pos") <= col("checkpoint"))
      .groupBy(col("source"), col("checkpoint"))
      .agg(sum(col("_ntk")).cast("long").as("n_tokens"))
    val cumDist = firstPos.join(broadcast(cps), Seq("source"))
      .filter(col("_fp") <= col("checkpoint"))
      .groupBy(col("source"), col("checkpoint"))
      .agg(count(lit(1)).cast("long").as("n_distinct"))
    cumTok.join(cumDist, Seq("source", "checkpoint"))
  }

  /** The q207 content-policy termlist — a broadcast-literal artifact
    * standing in for a real deny/flag list (weapon/abuse/pii term
    * inventories are corpus-external config; these three corpus terms
    * give the pipeline real, varied hit rates to exercise).
    */
  private[graft] val ScreenTerms = Seq("slow", "dup", "big")

  /** q207: content term-screening — per source, the rate of documents
    * flagged by a termlist OCCURRENCE threshold (hits ≥ 3 across the
    * flag terms) plus total hit volume: the safety/content-policy
    * filtering stage of a training-data pipeline (q10 drops rows by
    * KEY blocklist; this screens CONTENT, the step between q64's PII
    * scrub and q26's quality score in a real intake). ONE scan, token
    * filter against the broadcast literal list (codegen'd — no join),
    * one map-combined aggregate; integer ppm rate.
    */
  def q207TermScreen(s: SparkSession, d: String): DataFrame = {
    val terms = array(ScreenTerms.map(lit): _*)
    Tables.documents(s, d)
      .filter(col("text").isNotNull)
      .select(col("source"),
        size(filter(split(lower(trim(col("text"))), "\\s+"),
          t => array_contains(terms, t))).cast("long").as("_hits"))
      .groupBy(col("source"))
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum(col("_hits")).cast("long").as("total_hits"),
        sum(when(col("_hits") >= 3, 1L).otherwise(0L)).cast("long")
          .as("n_flagged"))
      .withColumn("flag_rate_ppm",
        expr("(2000000 * n_flagged + n_docs) DIV (2 * n_docs)"))
  }

  /** q219: tokenizer FERTILITY report per language — subtokens per
    * whitespace word (fertility), characters per subtoken, and the
    * type-token ratio of the subtoken stream. The sizing table every
    * multilingual training run reads before fixing a token budget:
    * fertility says how much more a language costs per word (the
    * standard tokenizer-quality metric), chars/subtoken how compressed
    * the stream is, TTR how heavy the tail vocabulary is. Uses the
    * q25 subtoken family ([a-z]+ runs — the BPE-ish pre-tokenizer)
    * so the report is engine-exact and needs no trained vocab.
    *
    * Scale shape: one scan → one map-combined per-lang sum aggregate;
    * the type count is a two-level distinct (explode → (lang, token)
    * distinct → count), never countDistinct inside the wide aggregate
    * (the q60 Expand rule). All ratios exact integer round-half-up.
    * Reference analogue: the per-attribute profiling sweeps
    * (api_extract.py:179-196) applied to token streams.
    */
  def q219TokenizerFertility(s: SparkSession, d: String): DataFrame = {
    val per = Tables.documents(s, d).select(col("lang"),
      size(toks).cast("long").as("_w"),
      size(regexp_extract_all(normText, lit("[a-z]+"), lit(0)))
        .cast("long").as("_st"),
      length(regexp_replace(normText, "\\s+", "")).cast("long")
        .as("_ch"))
    val ag = per.groupBy(col("lang"))
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum(col("_w")).cast("long").as("ws_tokens"),
        sum(col("_st")).cast("long").as("subtokens"),
        sum(col("_ch")).cast("long").as("chars"))
    val types = Tables.documents(s, d)
      .select(col("lang"), explode(
        regexp_extract_all(normText, lit("[a-z]+"), lit(0))).as("_t"))
      .distinct()
      .groupBy(col("lang"))
      .agg(count(lit(1)).cast("long").as("n_types"))
    ag.join(broadcast(types), "lang")
      .select(col("lang"), col("n_docs"), col("ws_tokens"),
        col("subtokens"), col("chars"), col("n_types"),
        expr("""CAST((2 * 1000000 * subtokens + ws_tokens)
                DIV (2 * ws_tokens) AS BIGINT)""").as("fertility_ppm"),
        expr("""CAST((2 * 1000 * chars + subtokens)
                DIV (2 * subtokens) AS BIGINT)""")
          .as("chars_per_subtoken_mills"),
        expr("""CAST((2 * 1000000 * n_types + subtokens)
                DIV (2 * subtokens) AS BIGINT)""").as("ttr_ppm"))
  }

  /** q238: FEATURE HASHING / the hashing trick (Weinberger et al. ICML
    * 2009) — each document's bag-of-words projected into a FIXED
    * 256-dimension hashed feature space: dimension = first two hex
    * chars of md5(token), weight = exact term frequency. The
    * vectorizer that feeds linear models/ANN without a vocabulary
    * dictionary: no global vocab build, no OOV problem, memory O(dims)
    * per doc regardless of corpus vocabulary — which is why it's the
    * standard featurizer at corpus scale (vs q58's TF-IDF, which
    * carries the full term dictionary). Output in LONG (doc, dim,
    * weight) form — the sparse-matrix exchange format, exact integer
    * weights.
    *
    * Scale shape: one explode + one map-combined (doc, dim) count —
    * embarrassingly parallel, no joins, no windows; the md5-prefix
    * bucket is the q31/q237 engine-identical hash rule. Collisions are
    * the hashing trick's documented trade (unsigned variant here;
    * at 256 dims the collision mass is itself a measurable feature).
    */
  def q238FeatureHashing(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .filter(col("text").isNotNull)
      .select(col("doc_id"), explode(toks).as("tok"))
      .filter(length(col("tok")) > 0)
      .select(col("doc_id"),
        substring(md5(col("tok")), 1, 2).as("dim"))
      .groupBy(col("doc_id"), col("dim"))
      .agg(count(lit(1)).cast("long").as("weight"))

  /** Per-source unigram ppm distribution — the shared input of q124
    * (TV distance to the corpus) and q245 (pairwise JS divergence):
    * one corpus-scale (source, term) aggregate, shares in
    * round-half-up ppm.
    */
  private def sourceTermPpm(docs: DataFrame): DataFrame = {
    val st = docs
      .select(col("source"), explode(toks).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy(col("source"), col("term"))
      .agg(count(lit(1)).as("n_st"))
    st.join(st.groupBy(col("source")).agg(sum(col("n_st")).as("n_s")),
        "source")
      .select(col("source"), col("term"),
        expr("(2000000 * n_st + n_s) DIV (2 * n_s)").as("ppm"))
      .filter(col("ppm") > 0)
  }

  /** q245: JENSEN–SHANNON DIVERGENCE MATRIX between sources (Lin 1991;
    * the symmetric, bounded [0, ln 2] cousin of KL): for every source
    * pair, JS(P‖Q) = ½KL(P‖M) + ½KL(Q‖M), M = (P+Q)/2, over unigram
    * distributions — the pairwise "how different are these crawls"
    * complement of q124's per-source-vs-corpus TV monitor (JS sees
    * log-scale tail divergence TV underweights; √JS is a metric, so
    * the matrix supports clustering sources).
    *
    * ENGINE-EXACT (a [[graft.functions.FixedLn]]-family operator, r11
    * — KL/JS was exactly the operator q124's scaladoc called
    * log-blocked): distributions quantize to round-half-up ppm, each
    * present-in-both term contributes a_t·ln(2a_t/(a_t+b_t)) +
    * b_t·ln(2b_t/(a_t+b_t)) via the signed fixed-point ln (args are
    * ≤2e6-bounded rationals), and single-source terms close the
    * algebra EXACTLY with + ppm·ln2 each (2a/(a+0) = 2) — computed
    * from per-source ppm totals minus the shared-term sums, so the
    * sources × vocab grid is never materialized (the q124 rule).
    * Output js_e9 in e9 nats, ½-factor folded via the final /(2·1e6).
    *
    * Scale shape: one corpus-scale (source, term) aggregate feeds a
    * vocab-scale self-join on term (pairs × shared-vocab rows, ln on
    * exactly those rows), plus one #sources-row total broadcast.
    */
  def q245JsMatrix(s: SparkSession, d: String): DataFrame =
    jsMatrix(Tables.documents(s, d))

  /** [[q245JsMatrix]]'s core over any (source, text) frame. */
  def jsMatrix(docs: DataFrame): DataFrame = {
    val ppm = sourceTermPpm(docs).localCheckpoint(false)
    val tot = ppm.groupBy(col("source"))
      .agg(sum(col("ppm")).as("tot_ppm"))
    // shared-vocab pair rows, exploded to one ln application per side
    val pairRows = ppm.select(col("source").as("src_a"),
        col("term"), col("ppm").as("a"))
      .join(ppm.select(col("source").as("src_b"), col("term"),
        col("ppm").as("b")), "term")
      .filter(col("src_a") < col("src_b"))
      .select(col("src_a"), col("src_b"), col("a"), col("b"),
        explode(array(
          struct(col("a").as("w"), (col("a") * 2).as("num"),
            (col("a") + col("b")).as("den")),
          struct(col("b").as("w"), (col("b") * 2).as("num"),
            (col("a") + col("b")).as("den")))).as("e"))
      .select(col("src_a"), col("src_b"), col("a"), col("b"),
        col("e.w").as("w"),
        greatest(col("e.num"), col("e.den")).as("_p"),
        least(col("e.num"), col("e.den")).as("_q"),
        when(col("e.num") >= col("e.den"), 1L).otherwise(-1L)
          .as("_sgn"))
    // r15: native graft_ln_e9 replaces the interpreted step fold (the
    // q272/q112 swap — same integer kernel, oracle unchanged)
    val withLn = pairRows.withColumn("_ln9",
      graft.functions.FixedPointExpressions.lnE9(docs.sparkSession,
        col("_p"), col("_q")))
    val shared = withLn.groupBy(col("src_a"), col("src_b"))
      .agg((count(lit(1)) / 2).cast("long").as("n_common"),
        sum(col("w") * col("_sgn") * col("_ln9")).as("_inner"),
        (sum(col("a")) / 2).cast("long").as("_sa"),
        (sum(col("b")) / 2).cast("long").as("_sb"))
    // EVERY source pair gets a row — a fully-disjoint pair has no
    // shared-vocab rows, coalesces to zero sums and correctly reports
    // JS = ln 2 (all mass in the single-source correction terms)
    tot.select(col("source").as("src_a"), col("tot_ppm").as("_ta"))
      .crossJoin(tot.select(col("source").as("src_b"),
        col("tot_ppm").as("_tb")))
      .filter(col("src_a") < col("src_b"))
      .join(shared, Seq("src_a", "src_b"), "left")
      .select(col("src_a"), col("src_b"),
        coalesce(col("n_common"), lit(0L)).as("n_common"),
        expr(s"""CAST((2 * (coalesce(_inner, 0)
                   + ${graft.functions.FixedLn.Ln2E9} *
                     ((_ta - coalesce(_sa, 0))
                      + (_tb - coalesce(_sb, 0))))
                   + 2000000)
                 DIV (2 * 2000000) AS BIGINT)""").as("js_e9"))
  }

  /** q246: per-document CROSS-ENTROPY under the corpus unigram LM —
    * H(d) = −Σ_t (tf_t/len_d)·ln p_corpus(t) in e9 nats: the
    * "surprise" quality score (Wenzek et al. 2020's CCNet ranks crawl
    * text exactly this way, with a KenLM in place of the unigram
    * model): low H = stereotyped/boilerplate-like text, high H = rare
    * vocabulary. The log-domain complement of q111's bigram-ppm
    * fluency score and q26's surface-statistics quality gate.
    *
    * ENGINE-EXACT (FixedLn family, r11): corpus unigram shares in
    * round-half-up ppm (clamped ≥ 1 ppm so the tail stays in the ln
    * domain — documented quantization, identical both engines),
    * −ln p = lnE9(1e6, ppm) ≥ 0 computed ONCE PER VOCAB TERM (never
    * per token — ln cost is vocabulary-scale), per-doc total is the
    * exact integer Σ tf·lnE9 with one round-half-up division by the
    * doc length.
    *
    * Scale shape: one corpus (term) aggregate, the ln'd vocab table
    * broadcast into the (doc, term, tf) scan, one map-combined per-doc
    * sum. 100 TB cost = two corpus scans' worth of shuffle-light work.
    */
  /** q247: LOGISTIC QUALITY-CLASSIFIER SCORING — batch inference of a
    * frozen linear quality model over surface features, σ(w·f) per
    * document plus the keep/drop decision at 0.5: the fastText-style
    * quality-filter pass of the GPT-3/CCNet lineage (Brown et al. 2020
    * §A; the reference analogue is the is_win derived-flag scoring,
    * api_extract.py:212, upgraded to a probabilistic model). The
    * WEIGHTS here are a documented frozen stand-in (the sandbox has no
    * trained model; swapping real coefficients changes only the one
    * literal expression) — the deliverable is the ENGINE-EXACT
    * in-engine inference path.
    *
    * A [[graft.functions.FixedExp]]-family operator (r11): integer
    * features (stopword/distinct ppm, capped length terms), logit
    * clamped to ±20e9, σ computed all-positive (exp of |z|, the
    * 1 − σ identity for the negative side) with the shared fixed-point
    * exp — both engines produce the identical score_e9, so inference
    * is a full oracle row. One corpus scan, zero joins/shuffles before
    * the final projection.
    */
  def q247QualityClassifier(s: SparkSession, d: String): DataFrame =
    logisticQualityScore(Tables.documents(s, d))

  /** [[q247QualityClassifier]]'s core over any (doc_id, text) frame. */
  def logisticQualityScore(documents: DataFrame): DataFrame = {
    val f = documents.filter(col("text").isNotNull)
      .select(col("doc_id"),
        size(toks).cast("long").as("t"),
        size(filter(toks, t => t.isin(Stopwords.map(x => x: Any): _*)))
          .cast("long").as("stop_cnt"),
        size(array_distinct(toks)).cast("long").as("dct"),
        length(regexp_replace(normText, "\\s+", "")).cast("long")
          .as("nonspace"))
      .select(col("doc_id"), col("t"),
        expr("(2000000 * stop_cnt + t) DIV (2 * t)").as("stop_ppm"),
        expr("(2000000 * dct + t) DIV (2 * t)").as("dist_ppm"),
        expr("(200 * nonspace + t) DIV (2 * t)").as("len_e2"))
      .withColumn("z_e9", expr(
        """-6000000000 + 4000 * stop_ppm + 3000 * dist_ppm
           + 8000000 * LEAST(t, 400)
           - 2000000 * LEAST(GREATEST(t - 400, 0), 2000)
           + 1000000 * LEAST(len_e2, 800)"""))
      .withColumn("_x", expr(
        "LEAST(ABS(z_e9), 20000000000)"))
    // r15: native graft_exp_e9 replaces the interpreted step fold —
    // this is a per-ROW corpus scan, the q272 shape (VERDICT r14 #6)
    val withExp = f.withColumn("_a", graft.functions
      .FixedPointExpressions.expE9(documents.sparkSession, col("_x")))
    withExp
      .withColumn("_pos", expr(
        """CAST((2 * 1000000000 * CAST(_a AS DECIMAL(38,0))
                 + (_a + 1000000000))
                DIV (2 * (_a + 1000000000)) AS BIGINT)"""))
      .select(col("doc_id"), col("t").as("n_tokens"), col("z_e9"),
        when(col("z_e9") >= 0, col("_pos"))
          .otherwise(lit(1000000000L) - col("_pos")).as("score_e9"))
      .withColumn("kept", col("score_e9") >= 500000000L)
  }

  /** q248: TEMPERATURE-SOFTMAX SOURCE-MIXING WEIGHTS — per-source
    * sampling weights ∝ exp(quality_s/τ) over each source's mean
    * document quality score: the reward-weighted mixing rule
    * (Xie et al. 2023 DoReMi's EXPONENTIATED-preference shape) that
    * complements q71's count-temperature power weights — q71 flattens
    * SIZE imbalance, this tilts toward QUALITY. τ = 0.05 in score
    * units (so the observed cross-source quality spread lands in a
    * usable logit range).
    *
    * FixedExp family: all-positive max-gap form (softmax(z) =
    * exp(−(z_max − z))/Σ — gaps clamped at 20e9 where the weight is
    * already < 2.1e-9), inverse exp(−g)·1e9 = round(1e18/exp(g)·…),
    * final weights round-half-up ppm of exact integer sums. The mean
    * quality per source is the q247 score averaged in round-half-up
    * e9. Sources-cardinality artifact after one corpus scan; the
    * softmax runs on the bounded artifact.
    */
  def q248SoftmaxMix(s: SparkSession, d: String): DataFrame = {
    val scored = logisticQualityScore(Tables.documents(s, d))
      .join(Tables.documents(s, d).select(col("doc_id"), col("source")),
        "doc_id")
    val bySrc = scored.groupBy(col("source"))
      .agg(count(lit(1)).cast("long").as("n_docs"),
        expr("CAST((2 * sum(score_e9) + count(1)) DIV (2 * count(1)) AS BIGINT)")
          .as("q_e9"))
    // logit = q/τ with τ = 0.05 → ×20; gap to the max source
    val z = bySrc.withColumn("_z", col("q_e9") * 20L)
      .withColumn("_x", expr(
        """LEAST(MAX(_z) OVER () - _z, 20000000000)"""))
    // r15: native graft_exp_e9 (bounded artifact — plan-size win)
    val withExp = z.withColumn("_a", graft.functions
      .FixedPointExpressions.expE9(s, col("_x")))
    withExp
      // u = exp(−gap)·1e9 = round(1e18/a); a ≥ 1e9 so u ≤ 1e9
      .withColumn("_u", expr(
        """CAST((2 * CAST(1000000000000000000 AS DECIMAL(38,0)) + _a)
                DIV (2 * CAST(_a AS DECIMAL(38,0))) AS BIGINT)"""))
      .withColumn("weight_ppm", expr(
        """CAST((2 * 1000000 * _u + SUM(_u) OVER ())
                DIV (2 * SUM(_u) OVER ()) AS BIGINT)"""))
      .select(col("source"), col("n_docs"), col("q_e9"),
        col("weight_ppm"))
  }

  /** q249: PERPLEXITY FILTERING — ppl(d) = exp(H(d)) over q246's
    * cross-entropy, the unit every CCNet-style corpus filter actually
    * thresholds on (Wenzek et al. 2020 filter crawl text by LM
    * perplexity bands). FixedExp family: H ≤ ln(1e6) < MaxX, so
    * ppl_e3 = round-half-up(exp(H)·1e9 / 1e6) is engine-exact; the
    * band label applies the classic head/middle/tail cut at fixed
    * integer thresholds. Cost = q246 + a vocab… ppl is per-DOC: one
    * more projection over the q246 artifact.
    */
  def q249Perplexity(s: SparkSession, d: String): DataFrame = {
    val ent = q246DocEntropy(s, d).withColumn("_x", col("xent_e9"))
    // r15: native graft_exp_e9 — per-DOC scan, the q272 shape
    val withExp = ent.withColumn("_a",
      graft.functions.FixedPointExpressions.expE9(s, col("_x")))
    withExp
      .withColumn("ppl_e3", expr(
        "CAST((2 * _a + 1000000) DIV (2 * 1000000) AS BIGINT)"))
      .select(col("doc_id"), col("n_tokens"), col("xent_e9"),
        col("ppl_e3"),
        // band cuts sit inside the corpus's observed ppl spread (the
        // 31-word vocabulary centers ppl near 31) so all three bands
        // are populated — production uses the Wikipedia-reference
        // head/middle/tail percentile cuts instead
        when(col("ppl_e3") < 30000L, "head")
          .when(col("ppl_e3") < 31500L, "middle")
          .otherwise("tail").as("band"))
  }

  def q246DocEntropy(s: SparkSession, d: String): DataFrame = {
    val tok = Tables.documents(s, d)
      .filter(col("text").isNotNull)
      .select(col("doc_id"), explode(toks).as("term"))
      .filter(length(col("term")) > 0)
    val tf = tok.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .localCheckpoint(false)
    val termPpm = tf.groupBy(col("term")).agg(sum(col("tf")).as("n_t"))
      .crossJoin(broadcast(
        tf.agg(sum(col("tf")).as("n_c"))))
      .select(col("term"),
        greatest(expr("(2000000 * n_t + n_c) DIV (2 * n_c)"), lit(1L))
          .as("_q"))
      .withColumn("_p", lit(1000000L))
    // r15: native graft_ln_e9 (vocab-scale — plan-size win)
    val lnTerm = termPpm.withColumn("_nl9",
      graft.functions.FixedPointExpressions.lnE9(s, col("_p"), col("_q")))
      .select(col("term"), col("_nl9"))
    tf.join(broadcast(lnTerm), "term")
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).cast("long").as("n_tokens"),
        expr("""CAST((2 * sum(tf * _nl9) + sum(tf))
                DIV (2 * sum(tf)) AS BIGINT)""").as("xent_e9"))
  }

  /** q257: MULTINOMIAL NAIVE BAYES language classifier — train on the
    * even-doc_id half (Laplace-smoothed per-class token log-probs +
    * log priors), score the odd half, report the confusion matrix:
    * the classical supervised baseline a corpus pipeline trains IN
    * PLACE on its own weak labels (here q27's lang column) before
    * paying for a real model — McCallum & Nigam 1998's multinomial
    * event model. The TRAINED complement of q247's frozen-weight
    * inference, and the supervised sibling of q111's unsupervised LM.
    * Reference analogue: the is_win flag prediction implicit in the
    * card-usage views (sql/db_creation_script.sql:224-242).
    *
    * ENGINE-EXACT (FixedLn family): every log term is a fixed-point
    * integer — prior = −lnE9(N, N_c), smoothed likelihood =
    * −lnE9(n_c + V, tf_c + 1) — so per-(doc, class) scores are exact
    * long sums and the argmax (ties → lang ascending, the struct-min
    * trick) is deterministic cross-engine. Long-safety: n_c + V must
    * stay ≤ ~2.3e9 (the FixedLn bound — quantize to ppm shares first
    * past that corpus size).
    *
    * Scale shape: ln runs at VOCAB×CLASSES scale (never per token);
    * the test scan expands by |classes| (bounded fan-out) and joins
    * the class-term table on (class, term) — shuffle-partitioned, not
    * broadcast, because vocab×classes outgrows a broadcast at corpus
    * scale; priors/unseen constants are |classes|-row broadcasts.
    */
  def q257NaiveBayes(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).filter(col("text").isNotNull)
    val tok = docs
      .select(col("doc_id"), col("lang"), explode(toks).as("term"))
      .filter(length(col("term")) > 0)
    val train = tok.filter(col("doc_id") % 2 === 0)
    val test = tok.filter(col("doc_id") % 2 === 1)
    val trainDocs = docs.filter(col("doc_id") % 2 === 0)
      .select(col("doc_id"), col("lang"))
    val classes = trainDocs.groupBy(col("lang").as("cls"))
      .agg(count(lit(1)).cast("long").as("n_docs_c"))
    val tot = trainDocs.agg(count(lit(1)).cast("long").as("n_docs"))
    // r15: the three ln sites below are native graft_ln_e9 (class/
    // vocab×class scale — the interpreted step folds tripled the plan)
    val priors = classes.crossJoin(broadcast(tot))
      .withColumn("_pl9", graft.functions.FixedPointExpressions
        .lnE9(s, col("n_docs"), col("n_docs_c")))
      .select(col("cls"), (-col("_pl9")).as("prior_e9"))
    val ct = train.groupBy(col("lang").as("cls"), col("term"))
      .agg(count(lit(1)).cast("long").as("tf_c"))
      .localCheckpoint(false)
    val nc = ct.groupBy(col("cls"))
      .agg(sum(col("tf_c")).cast("long").as("n_c"))
    val vocab = ct.select(col("term")).distinct()
      .agg(count(lit(1)).cast("long").as("v"))
    val lnp = ct.join(broadcast(nc), "cls")
      .crossJoin(broadcast(vocab))
      .withColumn("_l9", graft.functions.FixedPointExpressions
        .lnE9(s, col("n_c") + col("v"), col("tf_c") + 1L))
      .select(col("cls"), col("term"), (-col("_l9")).as("lnp_e9"))
    val unseen = nc.crossJoin(broadcast(vocab))
      .withColumn("_u9", graft.functions.FixedPointExpressions
        .lnE9(s, col("n_c") + col("v"), lit(1L)))
      .select(col("cls"), (-col("_u9")).as("lnp0_e9"))
    val td = test.groupBy(col("doc_id"), col("lang").as("actual"),
        col("term"))
      .agg(count(lit(1)).cast("long").as("tf"))
    val scores = td
      .crossJoin(broadcast(unseen))
      .join(lnp, Seq("cls", "term"), "left")
      .join(broadcast(priors), "cls")
      .groupBy(col("doc_id"), col("actual"), col("cls"))
      .agg((max(col("prior_e9"))
        + sum(col("tf") * coalesce(col("lnp_e9"), col("lnp0_e9"))))
        .as("s"))
    val win = scores.groupBy(col("doc_id"), col("actual"))
      .agg(min(struct((-col("s")).as("ns"), col("cls")))
        .getField("cls").as("predicted"))
    win.groupBy(col("actual").as("actual_lang"),
        col("predicted").as("predicted_lang"))
      .agg(count(lit(1)).cast("long").as("n_docs"))
      .withColumn("share_ppm", expr(
        """CAST((2000000 * n_docs
                 + sum(n_docs) OVER (PARTITION BY actual_lang))
                DIV (2 * sum(n_docs) OVER (PARTITION BY actual_lang))
                AS BIGINT)"""))
  }

  /** q280: SEGMENTAL TYPE-TOKEN RATIO — lexical diversity as the mean
    * TTR over non-overlapping 50-token segments (the MSTTR of Johnson
    * 1944; the length-robust form of raw TTR, whose denominator makes
    * long documents look artificially repetitive — Covington &
    * McFall JQL 2010 motivate the windowed family). Low MSTTR flags
    * template/boilerplate text that q52's repetition filters and
    * q26's surface stats each see only partially — the three together
    * are the standard lexical-quality battery. Per doc: token count,
    * full-doc distinct types, raw TTR ppm, segment count and MSTTR
    * ppm over COMPLETE segments (the ragged tail segment is dropped —
    * the standard MSTTR rule; docs shorter than one segment report
    * NULL).
    *
    * ENGINE-EXACT: segment id = (pos − 1) DIV 50 from posexplode
    * (1-based in DuckDB — aligned by the −1), per-segment distinct
    * counts are exact integers, ratios round-half-up ppm, the mean
    * over segments one more rhu. One corpus scan; everything after is
    * (doc × segment) grain, map-combined.
    */
  def q280SegmentalTtr(s: SparkSession, d: String): DataFrame = {
    // toks keeps empty strings out via the trim; positions come
    // straight from posexplode (0-based; DuckDB ordinality is 1-based
    // — the oracle subtracts 1), so no window pass is needed
    val tok = Tables.documents(s, d).filter(col("text").isNotNull)
      .select(col("doc_id"), posexplode(toks))
      .filter(length(col("col")) > 0)
      .select(col("doc_id"), col("col").as("term"), col("pos").as("p"))
    val docStats = tok.groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_tokens"),
        countDistinct(col("term")).cast("long").as("n_types"))
    val segTtr = tok.withColumn("seg", expr("p DIV 50"))
      .groupBy(col("doc_id"), col("seg"))
      .agg(count(lit(1)).cast("long").as("_n"),
        countDistinct(col("term")).cast("long").as("_t"))
      .filter(col("_n") === 50L)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_segments"),
        expr("""CAST((2 * sum((2000000 * _t + 50) DIV (2 * 50))
                      + count(1))
                DIV (2 * count(1)) AS BIGINT)""").as("msttr_ppm"))
    docStats.join(segTtr, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"), col("n_types"),
        expr("""CAST((2000000 * n_types + n_tokens)
                DIV (2 * n_tokens) AS BIGINT)""").as("ttr_ppm"),
        coalesce(col("n_segments"), lit(0L)).as("n_segments"),
        col("msttr_ppm"))
  }

  /** q258: ZIPF-LAW FIT per source — the log-log OLS slope of the
    * term frequency-vs-rank curve over each source's top-300 terms
    * (Zipf 1949: natural language sits near slope −1; synthetic,
    * templated or spam-heavy corpora bend away from it — the cheap
    * corpus-health fingerprint that complements q124's drift TV and
    * q199's Heaps curve). FixedLn family: x = lnE9(rank), y =
    * lnE9(freq) are exact e9 integers, the OLS moments accumulate in
    * DECIMAL(38,0), and slope/intercept emit by signed round-half-up
    * division (the q148 sign-split rule) — fully oracle-checkable.
    *
    * Scale shape: term counting is corpus-scale map-combined; ranking
    * runs on the VOCAB-scale count table (per-source window over
    * distinct terms, deterministic (freq DESC, term) order); ln and
    * the moment fold touch ≤ 300 rows per source.
    */
  def q258ZipfFit(s: SparkSession, d: String): DataFrame = {
    val counts = Tables.documents(s, d).filter(col("text").isNotNull)
      .select(col("source"), explode(toks).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy(col("source"), col("term"))
      .agg(count(lit(1)).cast("long").as("freq"))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("freq").desc, col("term"))
    val top = counts.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 300)
    // r15: native graft_ln_e9 for both axes (≤300 rows/source — the
    // win is the two collapsed step towers in the plan)
    val withY = top
      .withColumn("x", graft.functions.FixedPointExpressions
        .lnE9(s, col("rank"), lit(1L)))
      .withColumn("y", graft.functions.FixedPointExpressions
        .lnE9(s, col("freq"), lit(1L)))
      .select(col("source"), col("x"), col("y"))
    withY.groupBy(col("source"))
      .agg(count(lit(1)).cast("long").as("n_terms"),
        sum(col("x").cast("decimal(38,0)")).as("_sx"),
        sum(col("y").cast("decimal(38,0)")).as("_sy"),
        sum(col("x").cast("decimal(38,0)") * col("y")).as("_sxy"),
        sum(col("x").cast("decimal(38,0)") * col("x")).as("_sxx"))
      .withColumn("_num",
        col("n_terms") * col("_sxy") - col("_sx") * col("_sy"))
      .withColumn("_den",
        col("n_terms") * col("_sxx") - col("_sx") * col("_sx"))
      .filter(col("_den") > 0)
      .withColumn("slope_e6", expr(
        """CASE WHEN _num >= 0
             THEN CAST((2 * 1000000 * _num + _den)
                       DIV (2 * _den) AS BIGINT)
             ELSE -CAST((2 * 1000000 * (-_num) + _den)
                        DIV (2 * _den) AS BIGINT) END"""))
      .withColumn("_ti",
        lit(1000000L).cast("decimal(38,0)") * col("_sy")
          - col("slope_e6") * col("_sx"))
      .withColumn("intercept_e9", expr(
        """CASE WHEN _ti >= 0
             THEN CAST((2 * _ti + 1000000 * n_terms)
                       DIV (2 * 1000000 * n_terms) AS BIGINT)
             ELSE -CAST((2 * (-_ti) + 1000000 * n_terms)
                        DIV (2 * 1000000 * n_terms) AS BIGINT) END"""))
      .select(col("source"), col("n_terms"), col("slope_e6"),
        col("intercept_e9"))
  }

  /** q259: READABILITY SCORING — Flesch reading ease + Flesch–Kincaid
    * grade per document (Kincaid et al. 1975), from the three surface
    * counts every readability formula runs on: words (whitespace
    * tokens), sentences (runs of [.!?], clamped ≥ 1), syllables
    * (vowel GROUPS per word, clamped ≥ 1 per word — the standard
    * dictionary-free approximation). The classic document-audience
    * filter a training-data pipeline uses to band a corpus by
    * difficulty (complements q26's generic surface quality and q249's
    * model-based perplexity banding).
    *
    * ENGINE-EXACT: all three counts are integers from the SAME regex
    * semantics both engines implement (POSIX classes, non-overlapping
    * matches); the per-word ≥1-syllable clamp folds into counting
    * vowel-less words once (groups never span whitespace, so the
    * whole-text group count equals the per-word sum); the formula
    * terms emit as separate round-half-up e3 integers before exact
    * subtraction — never ROUND(float). One corpus scan, zero joins,
    * zero shuffles (PER-DOC output), codegen'd column work only.
    */
  def q259Readability(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).filter(col("text").isNotNull)
      .select(col("doc_id"),
        size(filter(toks, t => length(t) > 0)).cast("long")
          .as("n_words"),
        greatest(regexp_count(normText, lit("[.!?]+")), lit(1))
          .cast("long").as("n_sents"),
        (regexp_count(normText, lit("[aeiou]+")) +
          size(filter(toks,
            t => length(t) > 0 && !t.rlike("[aeiou]"))))
          .cast("long").as("n_syll"))
      .filter(col("n_words") > 0)
      .withColumn("fre_e3", expr(
        """206835
           - (2 * 1015 * n_words + n_sents) DIV (2 * n_sents)
           - (2 * 84600 * n_syll + n_words) DIV (2 * n_words)"""))
      .withColumn("fk_e3", expr(
        """(2 * 390 * n_words + n_sents) DIV (2 * n_sents)
           + (2 * 11800 * n_syll + n_words) DIV (2 * n_words)
           - 15590"""))
      .withColumn("band", expr(
        """CASE WHEN fre_e3 >= 70000 THEN 'easy'
                WHEN fre_e3 >= 50000 THEN 'standard'
                ELSE 'difficult' END"""))
}
