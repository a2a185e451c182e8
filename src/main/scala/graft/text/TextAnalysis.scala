package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines: token
  * counting, quality scoring, language-ID heuristic, and a deterministic
  * rolling-hash document fingerprint.
  *
  * Everything is a pure column expression (split / filter / aggregate
  * higher-order functions) — codegen'd, no UDFs, no shuffle until the caller
  * aggregates. The fingerprint uses only integer math expressible in ANSI-ish
  * SQL so the DuckDB oracle reproduces it bit-for-bit.
  */
object TextAnalysis {

  val stopwordsEn: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")

  /** Language-ID stopword lists (ISO code -> marker words). The heuristic
    * scores languages by marker-token hits and takes the alphabetically
    * first argmax. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "und", "das", "nicht", "ein"),
    "en" -> Seq("the", "a", "of", "and", "to", "is"),
    "es" -> Seq("el", "la", "de", "que", "los", "una"),
    "fr" -> Seq("le", "la", "les", "et", "une", "est"),
    "zh" -> Seq("de", "shi", "bu", "le", "wo", "zai"))

  def tokens(text: Column): Column = split(text, " ")

  /** Whitespace token count plus a BPE-ish regex token count (alpha runs,
    * digit runs, single other chars). BIGINT counts to match the oracle. */
  def withTokenCounts(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("n_tokens", size(tokens(col(textCol))).cast("bigint"))
      .withColumn("n_bpeish",
        // typed form, not expr() — the text column name is caller data and
        // must never be parsed as SQL text (same rule as DataQuality)
        size(regexp_extract_all(col(textCol),
          lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0))).cast("bigint"))

  /** Quality features + a composite score in [0,1]:
    * 0.5·min(n_tokens/50,1) + 0.3·(1 − stopword_ratio) + 0.2·alpha_ratio.
    * Ratios stay raw (integer/integer division is bitwise-reproducible). */
  def withQuality(df: DataFrame, textCol: String): DataFrame = {
    val t = tokens(col(textCol))
    val nTok = size(t).cast("bigint")
    val stopHits = size(filter(t, x => x.isInCollection(stopwordsEn))).cast("bigint")
    val alphaChars = length(regexp_replace(col(textCol), "[^a-z]", "")).cast("bigint")
    df.withColumn("n_chars_obs", length(col(textCol)).cast("bigint"))
      .withColumn("n_tokens", nTok)
      .withColumn("stop_ratio", stopHits.cast("double") / nTok)
      .withColumn("alpha_ratio", alphaChars.cast("double") / col("n_chars_obs"))
      .withColumn("quality_score",
        least(nTok.cast("double") / 50.0, lit(1.0)) * 0.5
          + (lit(1.0) - stopHits.cast("double") / nTok) * 0.3
          + alphaChars.cast("double") / col("n_chars_obs") * 0.2)
  }

  /** Stopword-hit language ID. Integer scores ⇒ exact argmax; tie-break is
    * the alphabetically first language. */
  def withLangId(df: DataFrame, textCol: String): DataFrame = {
    val t = tokens(col(textCol))
    val scored = langMarkers.foldLeft(df) { case (d, (lang, words)) =>
      d.withColumn(s"_s_$lang", size(filter(t, x => x.isInCollection(words))).cast("bigint"))
    }
    val best = greatest(langMarkers.map { case (l, _) => col(s"_s_$l") }: _*)
    val pred = langMarkers.foldRight(lit("und"): Column) { case ((l, _), acc) =>
      when(col(s"_s_$l") === best, lit(l)).otherwise(acc)
    }
    // foldRight gives priority to the FIRST (alphabetically smallest) lang.
    scored.withColumn("pred_lang", pred)
      .withColumn("lang_score", best)
      .drop(langMarkers.map { case (l, _) => s"_s_$l" }: _*)
  }

  /** Adjacent-token bigrams of a document: zip the token array against
    * itself shifted by one. Pure codegen'd array ops — no UDF, no shuffle. */
  def bigrams(text: Column): Column = {
    val t = tokens(text)
    zip_with(slice(t, lit(1), size(t) - 1), slice(t, lit(2), size(t) - 1),
      (a, b) => concat(a, lit(" "), b))
  }

  /** Corpus-wide top-k bigram counts with a deterministic tie-break
    * (count desc, bigram asc). The explode is map-side; the count groupBy is
    * ONE hash shuffle with partial aggregation; the top-k is
    * `TakeOrderedAndProject` (per-partition heap of k, driver merges k·P
    * rows) — never a global sort. That plan holds at 100 TB: the shuffle
    * carries only distinct-bigram partials, not the token stream. */
  def topBigrams(df: DataFrame, textCol: String, k: Int): DataFrame =
    df.select(explode(bigrams(col(textCol))).as("bigram"))
      .groupBy("bigram").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("bigram").asc)
      .limit(k)

  /** Zipf head of the corpus vocabulary: the top-k terms by occurrence
    * count with corpus frequency, document frequency, and the observed
    * rank×freq product (constant under Zipf's law — a sanity signal for
    * synthetic or boilerplate-heavy corpora, whose head deviates hard).
    * ONE (term, doc) exploded hash shuffle builds both counts map-side;
    * the top-k crosses the limit as TakeOrderedAndProject under a total
    * order (freq desc, term asc); rank windows only over the k surviving
    * rows (global window above aggregate+limit — the bounded shape). */
  def zipfHead(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ord = Window.orderBy(desc("freq"), asc("term"))
    df.select(col(idCol).as("_id"), explode(tokens(col(textCol))).as("term"))
      .groupBy("term")
      .agg(count(lit(1)).as("freq"), countDistinct(col("_id")).as("n_docs"))
      .orderBy(desc("freq"), asc("term"))
      .limit(k)
      .withColumn("rank", row_number().over(ord).cast("bigint"))
      .select(col("rank"), col("term"), col("freq"), col("n_docs"),
        (col("rank") * col("freq")).as("rank_x_freq"))
  }

  /** Per-document repetition signals (Gopher-style quality rules adapted to
    * flat word streams): duplicate-word fraction and the fraction of bigram
    * slots taken by the single most frequent bigram. Repetitious documents
    * (boilerplate, keyword stuffing, degenerate generations) score high and
    * get filtered before training.
    *
    * Shape at scale: the scalar stats are a pure projection; the top-bigram
    * count is one exploded (doc, bigram) hash shuffle with map-side partial
    * counts followed by a doc-keyed max — both linear in token volume, no
    * doc×doc or quadratic-in-length work anywhere. */
  def repetition(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = tokens(col(textCol))
    val base = df.select(col(idCol),
      size(t).cast("bigint").as("n_tokens"),
      size(array_distinct(t)).cast("bigint").as("n_distinct"))
    val top = df.select(col(idCol), explode(bigrams(col(textCol))).as("bigram"))
      .groupBy(col(idCol), col("bigram")).agg(count(lit(1)).as("_c"))
      .groupBy(col(idCol)).agg(max(col("_c")).as("top_bigram_cnt"))
    base.join(top, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"), col("n_distinct"),
        (floor(((col("n_tokens") - col("n_distinct")).cast("double")
          / col("n_tokens").cast("double")) * lit(1e6) + lit(0.5)) / lit(1e6)).as("dup_word_frac"),
        coalesce(col("top_bigram_cnt"), lit(0L)).as("top_bigram_cnt"),
        when(col("n_tokens") > 1,
          (floor((coalesce(col("top_bigram_cnt"), lit(0L)).cast("double")
            / (col("n_tokens") - 1).cast("double")) * lit(1e6) + lit(0.5)) / lit(1e6)))
          .otherwise(lit(0.0)).as("top_bigram_frac"))
  }

  /** Per-document top-k terms by tf-idf with sklearn's smoothed idf:
    * `idf = ln((1 + N) / (1 + df)) + 1`, `tfidf = tf · idf` (no vector
    * normalization — scores stay per-term comparable and bitwise
    * oracle-checkable; `ln` is libm on both engines).
    *
    * Shape at scale: tf is one (doc, term) hash shuffle with map-side
    * partial counts; df re-aggregates the (already distinct) tf pairs on
    * term — vocabulary-sized, far smaller than the token stream; N rides in
    * as a broadcast 1-row aggregate, so the whole thing is one declarative
    * plan (no driver-side count). The term join is left to Catalyst/AQE:
    * at bench scale it broadcasts, at 100 TB vocabulary it degrades to a
    * shuffle join rather than OOMing the driver. The per-doc top-k runs as
    * the native bounded-heap aggregate `graft_topk_str`
    * ([[graft.functions.TopKStrAgg]] — map-side partials, ≤k entries per
    * doc cross the shuffle, no sort anywhere), replacing the
    * `row_number() OVER (PARTITION BY doc)` window whose per-partition
    * sort of the whole scored (doc, term) stream was the measured driver
    * of the face's decade curve (same ordering: tfidf desc, term asc —
    * UTF8 binary, identical rows, spec-pinned against the window form). */
  def tfidfTopK(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val scored = tfidfScored(df, idCol, textCol)
    scored.groupBy(col(idCol))
      .agg(call_function("graft_topk_str",
        col("tfidf"), col("term"), col("tf"), lit(k)).as("_tk"))
      .select(col(idCol), explode(col("_tk")).as("_s"))
      .select(col(idCol), col("_s.id").as("term"),
        col("_s.payload").as("tf"), col("_s.score").as("tfidf"))
  }

  /** The scored (doc, term, tf, tfidf) stream both top-k forms rank. */
  private[text] def tfidfScored(df: DataFrame, idCol: String,
                                textCol: String): DataFrame = {
    val tf = df.select(col(idCol), explode(tokens(col(textCol))).as("term"))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = df.agg(count(lit(1)).cast("double").as("_n"))
    tf.join(dfreq, Seq("term")).crossJoin(broadcast(n))
      .withColumn("tfidf", col("tf").cast("double") *
        (log((lit(1.0) + col("_n")) / (lit(1.0) + col("df").cast("double"))) + lit(1.0)))
  }

  /** RAG-style document chunking: split each document's token stream into
    * fixed-budget chunks (last chunk ragged), one output row per chunk with
    * its reassembled text. Pure per-row array expressions (`sequence` →
    * `slice` → `explode`) — no shuffle, no state; chunking 100 TB is one
    * scan inside whole-stage codegen. */
  def chunk(df: DataFrame, idCol: String, textCol: String, size: Int): DataFrame = {
    require(size > 0, s"chunk size must be positive, got $size")
    val t = tokens(col(textCol))
    val n = org.apache.spark.sql.functions.size(t)
    // ceil-div from the same token array the slices read — no re-tokenizing
    // through SQL text (keeps odd column names working and the tokenizer
    // definition single-sourced)
    val nChunks = floor((n.cast("bigint") + lit(size - 1)) / lit(size)).cast("bigint")
    df.select(col(idCol),
        explode(transform(sequence(lit(0L), nChunks - 1),
          i => struct(i.as("chunk_id"),
            concat_ws(" ", slice(t, (i * size + 1).cast("int"), lit(size))).as("chunk_text"),
            (least((i + 1) * size, n.cast("bigint")) - i * size).as("n_chunk_tokens"))))
          .as("_c"))
      .select(col(idCol), col("_c.chunk_id"), col("_c.chunk_text"), col("_c.n_chunk_tokens"))
  }

  /** Unigram language-model scoring — the classic perplexity-proxy quality
    * signal: each document's log-probability under the corpus's own unigram
    * distribution, `logprob = Σ_tokens ln(count(token)/total)`, plus the
    * length-normalized `avg_logprob` (perplexity = exp(−avg_logprob)).
    *
    * Distributed shape: (doc,term) counts and the corpus term frequencies
    * are two hash shuffles (the second vocabulary-sized); the corpus total
    * is a broadcast 1-row aggregate. The per-doc Σ of ln-terms is computed
    * as an ORDERED fold (sort_array of (term, lp) structs, then a
    * left-to-right `aggregate`) so the double accumulation is
    * bitwise-deterministic — a plain SUM would vary with partitioning. The
    * collected list is bounded by the document's distinct-term count, never
    * by the corpus. */
  def withLogprob(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = df.select(col(idCol), explode(tokens(col(textCol))).as("_t"))
    val tf = tok.groupBy(col(idCol), col("_t")).agg(count(lit(1)).as("_tf"))
    val freq = tf.groupBy("_t").agg(sum("_tf").as("_cnt"))
    val tot = freq.agg(sum("_cnt").cast("double").as("_tot"))
    val scored = tf.join(freq, "_t").crossJoin(broadcast(tot))
      .withColumn("_lp",
        col("_tf").cast("double") * log(col("_cnt").cast("double") / col("_tot")))
    scored.groupBy(idCol)
      .agg(sort_array(collect_list(struct(col("_t"), col("_lp")))).as("_l"),
        sum("_tf").as("n_tokens"))
      .withColumn("_sum",
        aggregate(col("_l"), lit(0.0), (acc, x) => acc + x.getField("_lp")))
      // 6dp cross-engine-exact rounding (floor(x·10⁶+0.5)/10⁶ — IEEE ops
      // spelled identically in the oracle, never native round(): the r14
      // sf1 spot-gate measured ONE doc in 50k where Java and DuckDB ln()
      // of the same cnt/tot ratio differ by 1 ulp, and the raw-double
      // compare failed on it; the quantization absorbs the libm gap
      .withColumn("logprob", floor(col("_sum") * lit(1e6) + lit(0.5)) / lit(1e6))
      .withColumn("avg_logprob",
        floor(col("_sum") / col("n_tokens").cast("double") * lit(1e6) + lit(0.5)) / lit(1e6))
      .select(col(idCol), col("n_tokens"), col("logprob"), col("avg_logprob"))
  }

  /** Bigram-LM (conditional) document scoring: Σ tf·ln P(w₂|w₁) with
    * P(w₂|w₁) = corpus count(w₁ w₂) / corpus count(w₁ as bigram prefix) —
    * the fluency signal one LM order above [[withLogprob]]'s unigram
    * score: word-salad documents whose unigrams are all common but whose
    * transitions are rare score far lower here. Same shuffle discipline
    * (one (doc, bigram) count shuffle, vocabulary-sized context re-agg,
    * joins left to AQE) and the same determinism discipline: per-doc
    * bigram-sorted list, ordered fold, so the double sum is
    * order-independent. Docs with < 2 tokens have no bigrams and drop
    * out, exactly as in the oracle. */
  def withBigramLogprob(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val bg = df.select(col(idCol), explode(bigrams(col(textCol))).as("_b"))
    val tf = bg.groupBy(col(idCol), col("_b")).agg(count(lit(1)).as("_tf"))
    val cb = tf.groupBy("_b").agg(sum("_tf").as("_cb"))
    val cw = cb.select(expr("split(_b, ' ')[0]").as("_w1"), col("_cb"))
      .groupBy("_w1").agg(sum("_cb").as("_cw"))
    val scored = tf.join(cb, "_b")
      .withColumn("_w1", expr("split(_b, ' ')[0]"))
      .join(cw, "_w1")
      .withColumn("_lp",
        col("_tf").cast("double") * log(col("_cb").cast("double") / col("_cw").cast("double")))
    scored.groupBy(idCol)
      .agg(sort_array(collect_list(struct(col("_b"), col("_lp")))).as("_l"),
        sum("_tf").as("n_bigrams"))
      .withColumn("_sum",
        aggregate(col("_l"), lit(0.0), (acc, x) => acc + x.getField("_lp")))
      // 6dp cross-engine-exact rounding: ln of arbitrary count RATIOS
      // disagrees by ≤1 ulp across engines and the quantization absorbs
      // it. floor(x·10⁶+0.5)/10⁶ instead of native round() — Spark rounds
      // the exact BigDecimal expansion where DuckDB rounds in float math,
      // so native round() itself diverges on grid-boundary values (the
      // r14 sf1 spot-gate measured it on text_readability)
      .withColumn("logprob", floor(col("_sum") * lit(1e6) + lit(0.5)) / lit(1e6))
      .withColumn("avg_logprob",
        floor(col("_sum") / col("n_bigrams").cast("double") * lit(1e6) + lit(0.5)) / lit(1e6))
      .select(col(idCol), col("n_bigrams"), col("logprob"), col("avg_logprob"))
  }

  /** Hashing-trick linear text scorer — the fasttext-style shape of a
    * learned quality/topic classifier, run as pure column expressions:
    * every token hashes to one of `buckets` feature slots (a cheap
    * first/last-codepoint + length hash both engines can compute; swap in
    * `xxhash64` for production hashing where no SQL oracle is needed), each
    * slot carries a deterministic integer weight in [−500, 500), and the
    * document score is Σ tf·w / (1000·n). All arithmetic is exact integers
    * until the single final division — bitwise-reproducible, zero UDFs,
    * one (doc, token) count shuffle. A trained model drops in by replacing
    * the weight formula with a broadcast weight table. */
  def withHashScore(df: DataFrame, idCol: String, textCol: String,
                    buckets: Int = 64): DataFrame = {
    val tf = df.select(col(idCol), explode(tokens(col(textCol))).as("_t"))
      .filter(length(col("_t")) > 0)
      .groupBy(col(idCol), col("_t")).agg(count(lit(1)).as("_tf"))
    val bucket = (ascii(col("_t")) * 31L + ascii(expr("right(_t, 1)")) * 7L
      + length(col("_t"))) % buckets
    val w = (bucket * lit(2654435761L)) % 1000L - 500L
    tf.select(col(idCol), col("_tf"), w.as("_w"))
      .groupBy(idCol)
      .agg(sum("_tf").as("n_tokens"), sum(col("_tf") * col("_w")).as("_num"))
      .select(col(idCol), col("n_tokens"),
        (col("_num").cast("double") / (lit(1000.0) * col("n_tokens").cast("double")))
          .as("hash_score"))
  }

  /** Per-document token-distribution Shannon entropy — the repetition-aware
    * diversity signal (spam and template docs score low even when long).
    * One (doc, token) count shuffle; the per-doc reduction is
    * H = ln n − (Σ tf·ln tf)/n with the Σ as an ORDERED fold over the
    * token-sorted list (the [[withLogprob]] discipline), so the double sum
    * is order-independent; the final 6dp rounding absorbs the ≤1-ulp
    * ln() disagreement between engines on small-integer arguments. */
  def withEntropy(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tf = df.select(col(idCol), explode(tokens(col(textCol))).as("_t"))
      .groupBy(col(idCol), col("_t")).agg(count(lit(1)).as("_tf"))
      .withColumn("_h", col("_tf").cast("double") * log(col("_tf").cast("double")))
    tf.groupBy(idCol)
      .agg(sort_array(collect_list(struct(col("_t"), col("_h")))).as("_l"),
        sum("_tf").as("n_tokens"), count(lit(1)).as("n_distinct"))
      .withColumn("entropy",
        (floor((log(col("n_tokens").cast("double"))
          - aggregate(col("_l"), lit(0.0), (acc, x) => acc + x.getField("_h"))
            / col("n_tokens").cast("double")) * lit(1e6) + lit(0.5)) / lit(1e6)))
      .select(col(idCol), col("n_tokens"), col("n_distinct"), col("entropy"))
  }

  /** Distinct n-token shingles of a document as strings (order of the array
    * irrelevant downstream — callers aggregate). Codegen'd array ops. */
  def shingles(text: Column, n: Int): Column = {
    val t = tokens(text)
    when(size(t) >= n,
      array_distinct(transform(sequence(lit(1), size(t) - (n - 1)),
        i => concat_ws(" ", slice(t, i, lit(n))))))
      .otherwise(array().cast("array<string>"))
  }

  /** Boilerplate detection — the cross-document repeated-span curation
    * signal: a shingle appearing in ≥ `minDocs` DISTINCT documents is
    * boilerplate (headers, licence blocks, navigation chrome); each doc
    * reports its shingle count, boilerplate-shingle count and ratio.
    *
    * Shape at scale: per-doc DISTINCT shingles explode map-side; the
    * document-frequency groupBy is one hash shuffle over the shingle
    * vocabulary; the flag join is shingle-keyed (never a doc×doc join) and
    * the per-doc roll-up shuffles on doc_id. Linear in corpus shingle
    * volume — no pairwise anything. */
  def withBoilerplate(df: DataFrame, idCol: String, textCol: String,
                      n: Int = 5, minDocs: Int = 3): DataFrame = {
    val ex = df.select(col(idCol), explode(shingles(col(textCol), n)).as("_s"))
    val dfreq = ex.groupBy("_s").agg(count(lit(1)).as("_df"))
    val stats = ex.join(dfreq, "_s").groupBy(idCol)
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("_df") >= minDocs, 1L).otherwise(0L)).as("n_boiler"))
    df.select(col(idCol)).join(stats, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_shingles"), lit(0L)).as("n_shingles"),
        coalesce(col("n_boiler"), lit(0L)).as("n_boiler"))
      .withColumn("boiler_ratio",
        when(col("n_shingles") === 0, lit(0.0))
          .otherwise(col("n_boiler").cast("double") / col("n_shingles")))
  }

  /** Benchmark-contamination check — the decontamination gate every
    * training pipeline needs: for each training document, how many of its
    * n-token shingles also appear in the (small) evaluation corpus. The
    * eval shingle set is DISTINCT and broadcast (eval benchmarks are tiny
    * next to training data); training shingles explode map-side and the
    * membership test is a broadcast left join — the 100 TB training side
    * shuffles only for its own per-doc roll-up.
    * Returns (idCol, n_shingles, n_contaminated, contamination_ratio). */
  def withContamination(train: DataFrame, eval_ : DataFrame, idCol: String,
                        textCol: String, n: Int = 5): DataFrame = {
    val evalSet = eval_.select(explode(shingles(col(textCol), n)).as("_s"))
      .distinct().withColumn("_hit", lit(1L))
    val ex = train.select(col(idCol), explode(shingles(col(textCol), n)).as("_s"))
    val stats = ex.join(broadcast(evalSet), Seq("_s"), "left")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_shingles"),
        sum(coalesce(col("_hit"), lit(0L))).as("n_contaminated"))
    train.select(col(idCol)).join(stats, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_shingles"), lit(0L)).as("n_shingles"),
        coalesce(col("n_contaminated"), lit(0L)).as("n_contaminated"))
      .withColumn("contamination_ratio",
        when(col("n_shingles") === 0, lit(0.0))
          .otherwise(col("n_contaminated").cast("double") / col("n_shingles")))
  }

  /** Union pattern of scrub-worthy spans: emails, URLs, long digit runs,
    * and a blocklisted term. Kept to syntax that means the same thing in
    * Java regex (Spark) and RE2 (DuckDB oracle): no captures in the
    * replacement, no lookaround. */
  val scrubPattern: String =
    "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}|https?://[^ ]+|[0-9]{4,}|\\bspark\\b"

  /** PII-style redaction for training corpora: every match of
    * [[scrubPattern]] is replaced with the sentinel, plus a per-document
    * match count. Pure codegen'd string expressions — the scrub runs inside
    * the scan's whole-stage-codegen, no shuffle at all. */
  def withScrub(df: DataFrame, textCol: String, sentinel: String = "<x>"): DataFrame =
    df.withColumn("scrubbed", regexp_replace(col(textCol), scrubPattern, sentinel))
      .withColumn("n_hits",
        size(regexp_extract_all(col(textCol), lit(scrubPattern), lit(0))).cast("bigint"))

  /** Rolling polynomial fingerprint over the token stream:
    * h ← (h·131 + len(tok)·7 + ascii(tok[0])) mod 1e9+7.
    * Order-sensitive (a true rolling hash) yet pure integer math, so the
    * oracle reproduces it with list_reduce. */
  def fingerprint(text: Column): Column =
    aggregate(
      tokens(text),
      lit(0L),
      (h, tok) => (h * 131L + length(tok).cast("bigint") * 7L + ascii(substring(tok, 1, 1)).cast("bigint")) % 1000000007L)

  def withFingerprint(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("fingerprint", fingerprint(col(textCol)))

  /** Pointwise mutual information of adjacent-token collocations:
    * pmi(x,y) = ln(c_xy·N / (c_x·c_y)) over corpus unigram/bigram counts —
    * the classic collocation-mining signal (Church & Hanks 1990) a corpus
    * curation pass uses to find multi-word terms and template phrases.
    *
    * Shape at scale: unigram and bigram counts are each ONE hash shuffle
    * with map-side partials over the distinct vocabulary (never the token
    * stream); the bigram frame (already thresholded to ≥ `minCount`) joins
    * the unigram frame twice on the word key — vocabulary-sized equi-joins,
    * no pairwise anything; the corpus total N is a broadcast 1-row cross
    * join. All counts are exact BIGINTs; pmi is a single double expression
    * over them rounded to 6dp (the ln implementations of different engines
    * disagree by 1 ulp on some arguments — the same accepted trade as
    * text_entropy), so it is reproducible across engines and partition
    * orders. */
  def pmiCollocations(df: DataFrame, textCol: String, minCount: Int = 5): DataFrame = {
    val uni = df.select(explode(tokens(col(textCol))).as("_t"))
      .groupBy("_t").agg(count(lit(1)).as("_c"))
    val n = uni.agg(sum(col("_c")).as("_n"))
    val bi = df.select(explode(bigrams(col(textCol))).as("_b"))
      .groupBy("_b").agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= minCount)
      .withColumn("w1", substring_index(col("_b"), " ", 1))
      .withColumn("w2", substring_index(col("_b"), " ", -1))
    bi.join(uni.select(col("_t").as("w1"), col("_c").as("n_w1")), "w1")
      .join(uni.select(col("_t").as("w2"), col("_c").as("n_w2")), "w2")
      .crossJoin(broadcast(n))
      .select(col("w1"), col("w2"), col("n_pair"), col("n_w1"), col("n_w2"),
        (floor((log((col("n_pair").cast("double") * col("_n").cast("double")) /
          (col("n_w1").cast("double") * col("n_w2").cast("double")))) * lit(1e6) + lit(0.5)) / lit(1e6)).as("pmi"))
  }

  /** Winnowing document fingerprints (Schleimer, Wilkerson & Aiken 2003 —
    * the MOSS local-fingerprinting algorithm): hash every k-token gram with
    * the [[fingerprint]] rolling step, then from each window of `w`
    * consecutive gram hashes keep the LEFTMOST minimum; the distinct
    * (position, hash) picks are the document's fingerprints. Winnowing
    * guarantees any shared run of ≥ w+k-1 tokens between two documents
    * shares at least one fingerprint — the screening property plagiarism /
    * near-dup pipelines rely on.
    *
    * Returns one row per document: gram count, fingerprint count, and an
    * order-independent digest Σ hash·pos mod 1e15+37. Each (hash, pos)
    * pick is packed into ONE bigint as (hash<<20)|pos — gram hashes are
    * < 1e9+7 < 2^30 and positions are capped by the 2^20-token-per-document
    * bound (SCALE_BOUNDS: a >1M-token document must be chunked first, which
    * text_chunk does anyway) — so distinct-ing the picks is integer
    * array_distinct, and the modular digest sum (modular addition is
    * commutative) is bitwise-identical across engines and partition orders.
    * Two docs with equal digests AND counts are fingerprint-identical up
    * to collision.
    *
    * Shape at scale: everything is per-row array math inside whole-stage
    * codegen — NO shuffle, no explode; the per-doc cost is O(n·(k+w)).
    * The fingerprint SET (for cross-doc matching) is `w`-fold smaller than
    * the gram stream — the point of winnowing: downstream pair-joins key on
    * a 1/w-density fingerprint index instead of every shingle. */
  def withWinnow(df: DataFrame, idCol: String, textCol: String,
                 k: Int = 4, w: Int = 4): DataFrame = {
    val M2 = 1000000000000037L
    winnowPacked(df, idCol, textCol, k, w)
      .select(col(idCol), col("n_grams"),
        size(col("_f")).cast("bigint").as("n_fingerprints"),
        aggregate(col("_f"), lit(0L),
          (acc, x) => (acc + shiftright(x, 20) * x.bitwiseAND(lit(1048575L))) % M2)
          .as("fp_digest"))
  }

  /** Exploded winnowing fingerprints — (id, fp_hash, pos) — the index a
    * cross-document matcher joins on (MOSS-style): group by fp_hash, pair
    * within buckets. 1/w the density of the shingle stream by construction. */
  def winnowFingerprints(df: DataFrame, idCol: String, textCol: String,
                         k: Int = 4, w: Int = 4): DataFrame =
    // explode_outer, NOT explode: for a bare explode the optimizer infers a
    // size(_f) > 0 filter and pushes it to the scan, inlining the whole
    // staged fingerprint expression into one interpreted per-row filter —
    // undoing the winnowPacked staging (measured ~0.24 s/doc). The outer
    // explode infers nothing; the null filter below references the
    // GENERATED attribute, so it cannot be pushed past the Generate.
    winnowPacked(df, idCol, textCol, k, w)
      .select(col(idCol), explode_outer(col("_f")).as("_x"))
      .filter(col("_x").isNotNull)
      .select(col(idCol), shiftright(col("_x"), 20).as("fp_hash"),
        col("_x").bitwiseAND(lit(1048575L)).as("pos"))

  /** MOSS-style cross-document matcher over winnowing fingerprints: pairs
    * of documents sharing ≥ `minShared` distinct fingerprint hashes, with
    * the containment-style overlap n_shared/(n_a+n_b−n_shared).
    *
    * Shape at scale: the fingerprint index is 1/w the shingle density;
    * hashes seen in only ONE document are semi-join pruned before the
    * self-join (the unique-shingle prune of the other pair-dedups), and
    * `maxDocFreq` caps boilerplate-hash fan-out so no bucket explodes
    * quadratically. Every shuffle keys on fp_hash or the (id_a, id_b)
    * pair — never O(docs²). */
  def winnowPairs(df: DataFrame, idCol: String, textCol: String,
                  k: Int = 4, w: Int = 4, minShared: Int = 2,
                  maxDocFreq: Int = 100): DataFrame = {
    // the (id, hash) index feeds FIVE plan branches (freq, both self-join
    // sides, and the two per-doc-count joins); lazy localCheckpoint pins it
    // so the corpus is fingerprinted once — the jaccardPairs discipline
    val idx0 = winnowFingerprints(df, idCol, textCol, k, w)
      .select(col(idCol).as("_id"), col("fp_hash")).distinct()
      .localCheckpoint(eager = false)
    val freq = idx0.groupBy("fp_hash").agg(count(lit(1)).as("_df"))
      .filter(col("_df") >= 2 && col("_df") <= maxDocFreq).select("fp_hash")
    val idx = idx0.join(freq, Seq("fp_hash"), "left_semi")
    val nfp = idx0.groupBy("_id").agg(count(lit(1)).as("_nf"))
    val pairs = idx.alias("a")
      .join(idx.alias("b"),
        col("a.fp_hash") === col("b.fp_hash") && col("a._id") < col("b._id"))
      .groupBy(col("a._id").as("id_a"), col("b._id").as("id_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
    pairs
      .join(nfp.select(col("_id").as("id_a"), col("_nf").as("n_a")), "id_a")
      .join(nfp.select(col("_id").as("id_b"), col("_nf").as("n_b")), "id_b")
      .select(col("id_a"), col("id_b"), col("n_shared"), col("n_a"), col("n_b"),
        (col("n_shared").cast("double") /
          (col("n_a") + col("n_b") - col("n_shared")).cast("double")).as("overlap"))
  }

  /** Shared winnowing core: per-doc packed (hash<<20)|pos fingerprint array
    * plus the gram count — one native codegen pass
    * ([[graft.functions.WinnowPackedExpr]], bitwise-pinned against
    * [[winnowPackedSql]] below). The staged SQL form still paid
    * interpreted-lambda cost at every level (~0.17 ms/doc — 8–9s of the
    * 10.1s fourth-decade dedup_winnow face, the whole curve bend); the
    * native pass is the same O(n·(k+w)) with no per-element expression
    * trees. */
  private def winnowPacked(df: DataFrame, idCol: String, textCol: String,
                           k: Int, w: Int): DataFrame = {
    val t = tokens(col(textCol))
    df.select(col(idCol),
      when(size(t) >= k, (size(t) - (k - 1)).cast("bigint"))
        .otherwise(lit(0L)).as("n_grams"),
      call_function("graft_winnow", col(textCol), lit(k), lit(w)).as("_f"))
  }

  /** Spec hook for the native/SQL bitwise pin ([[winnowPackedSql]]). */
  private[text] def winnowPackedHook(df: DataFrame, idCol: String, textCol: String,
                                     k: Int, w: Int): DataFrame =
    winnowPacked(df, idCol, textCol, k, w)

  /** The REFERENCE staged higher-order-function winnowing form, kept as
    * the spec oracle for [[graft.functions.WinnowPackedExpr]] (and as the
    * readable statement of the algebra). DELIBERATELY staged across three
    * Project boundaries (tokens → gram hashes → window picks): higher-order
    * array functions evaluate interpreted with NO common-subexpression
    * sharing, so a single fused expression re-evaluates the token split
    * inside every gram lambda and the gram array inside every window
    * lambda — O(n⁴) per document (measured: ~0.35 s/doc on 50-token docs —
    * 3 orders over the staged form). As separate aliased columns each
    * level materializes once per row and lambda references are O(1)
    * attribute reads; CollapseProject keeps the stages apart because the
    * aliases are non-cheap and multiply-referenced. */
  private[text] def winnowPackedSql(df: DataFrame, idCol: String, textCol: String,
                                    k: Int, w: Int): DataFrame = {
    val M = 1000000007L
    val step = (h: Column, tok: Column) =>
      (h * 131L + (length(tok).cast("bigint") * 7L +
        ascii(substring(tok, 1, 1)).cast("bigint"))) % M
    val toks = df.select(col(idCol), tokens(col(textCol)).as("_t"))
    val t = col("_t")
    val grams = toks.select(col(idCol),
      when(size(t) >= k,
        transform(sequence(lit(1), size(t) - (k - 1)),
          i => aggregate(slice(t, i, lit(k)), lit(0L), step)))
        .otherwise(array().cast("array<bigint>")).as("_g"))
    val g = col("_g")
    val wl = least(lit(w), size(g))
    val fps = when(size(g) > 0,
      array_distinct(transform(sequence(lit(1), size(g) - wl + 1), j => {
        val win = slice(g, j, wl)
        val mv = array_min(win)
        shiftleft(mv, 20) + (j.cast("bigint") - 1L + array_position(win, mv))
      })))
      .otherwise(array().cast("array<bigint>"))
    grams.select(col(idCol), size(g).cast("bigint").as("n_grams"), fps.as("_f"))
  }

  /** Flesch readability features: word, sentence, and syllable-proxy counts
    * (vowel-group runs — the standard codepoint-only syllable estimator)
    * plus the reading-ease and grade-level scores. Pure codegen projection,
    * no shuffle; counts are exact BIGINTs and the two scores are closed-form
    * doubles over those integers (written in one fixed evaluation order so
    * the oracle's identical expression is bitwise-equal). The 4dp rounding
    * is floor(x·10⁴ + 0.5)/10⁴ — IEEE ops spelled out identically in both
    * engines — NOT the native round(): Spark rounds the double's exact
    * BigDecimal expansion while DuckDB rounds in float math, and on a
    * 4dp-boundary value the two disagree (measured at sf1: one fk_grade
    * row in 50k, 31.0687 vs 31.0688 — the r14 sf1 spot-gate's find).
    * Half-up-toward-+∞ on negatives is the documented tie rule.
    * Sentence count floors at 1: a corpus
    * with no terminal punctuation (this one) still gets a defined score,
    * with words-per-sentence degenerating to document length — documented,
    * not hidden. Empty documents yield NULL scores, not a division crash. */
  def withReadability(df: DataFrame, textCol: String): DataFrame = {
    val w = size(regexp_extract_all(col(textCol), lit("[^ ]+"), lit(0))).cast("bigint")
    val s = greatest(lit(1L),
      size(regexp_extract_all(col(textCol), lit("[.!?]+"), lit(0))).cast("bigint"))
    val sy = size(regexp_extract_all(col(textCol), lit("[aeiouy]+"), lit(0))).cast("bigint")
    // cross-engine-exact 4dp: floor is IEEE-specified, so both engines run
    // the identical op sequence on identical doubles — no native round()
    def round4(x: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      floor(x * lit(10000.0) + lit(0.5)) / lit(10000.0)
    df.withColumn("n_words", w)
      .withColumn("n_sentences", s)
      .withColumn("n_syllables", sy)
      .withColumn("flesch",
        when(w > 0L, round4(
          lit(206.835) - lit(1.015) * (w.cast("double") / s.cast("double")) -
            lit(84.6) * (sy.cast("double") / w.cast("double")))))
      .withColumn("fk_grade",
        when(w > 0L, round4(
          lit(0.39) * (w.cast("double") / s.cast("double")) +
            lit(11.8) * (sy.cast("double") / w.cast("double")) - lit(15.59))))
  }
}
