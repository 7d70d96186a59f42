package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines: token
  * counting, quality scoring, language identification, and document
  * fingerprinting. All are per-row Catalyst expressions (codegen'd, no UDFs,
  * no shuffles) — they stream over any number of partitions unchanged at
  * 100 TB.
  */
object TextAnalysis {

  /** Whitespace token array. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Canonical text form for dedup/fingerprinting: Unicode NFC (via the
    * native codegen'd [[graft.functions.UnicodeNormalize]] expression —
    * precomposed and combining-mark spellings of the same text become one
    * string), then lowercase, then whitespace collapsed to single spaces
    * and trimmed. Pure map-side projection. */
  def normalizeText(text: Column, form: String = "NFC"): Column =
    trim(regexp_replace(lower(
      org.apache.spark.sql.graft.bridge.columnOf(
        graft.functions.UnicodeNormalize(
          org.apache.spark.sql.graft.bridge.expressionOf(text), form))),
      "\\s+", " "))

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish token count: word pieces plus standalone punctuation — the
    * standard cheap proxy for LLM token budgeting when no tokenizer model is
    * loadable. */
  def bpeishTokenCount(text: Column): Column =
    size(expr(s"regexp_extract_all(${text.toString}, '\\\\w+|[^\\\\w\\\\s]', 0)"))

  /** Distinct word count. */
  def distinctWords(text: Column): Column = size(array_distinct(tokens(text)))

  private val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "for"),
    "es" -> Seq("el", "la", "de", "y", "que", "los", "en", "un", "una", "es"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "eine", "zu", "den", "von"),
    "fr" -> Seq("le", "la", "de", "et", "est", "les", "un", "une", "des", "que")
  )

  /** Number of tokens that are English stopwords. */
  def stopwordHits(text: Column, lang: String = "en"): Column = {
    val list = stopwords(lang).map(w => s"'$w'").mkString(", ")
    size(expr(s"filter(split(trim(${text.toString}), '\\\\s+'), x -> array_contains(array($list), x))"))
  }

  /** Quality score in [0,1]: blends length, mean word length sanity, and
    * stopword presence — the usual cheap heuristics (C4/Gopher-style rules)
    * expressed as one deterministic arithmetic formula. */
  def qualityScore(text: Column): Column = {
    val n = tokenCount(text).cast("double")
    val chars = length(text).cast("double")
    val meanWord = chars / n
    val stopRatio = stopwordHits(text).cast("double") / n
    val lengthScore = least(n / lit(50.0), lit(1.0))
    val wordLenScore = when(meanWord.between(3.0, 10.0), 1.0).otherwise(0.5)
    round(lengthScore * lit(0.4) + wordLenScore * lit(0.4) + least(stopRatio * 10.0, lit(1.0)) * lit(0.2), 6)
  }

  /** Language-ID by stopword-hit voting over the supported languages; ties
    * and zero-hit rows → "und". Deterministic argmax (lexicographic on ties
    * after score). */
  def languageId(text: Column): Column = {
    val langs = stopwords.keys.toSeq.sorted
    val scores = langs.map(l => stopwordHits(text, l))
    val best = greatest(scores: _*)
    // first language (sorted order) achieving the max, if any hits at all
    langs.zip(scores).foldRight(lit("und"): Column) { case ((l, s), acc) =>
      when(best > 0 && s === best, lit(l)).otherwise(acc)
    }
  }

  /** PII redaction patterns, applied IN ORDER: emails before phone/digit
    * rules (so an address's digits aren't half-eaten), key-looking runs
    * before bare digit runs. Portable regex subset — no lookaround, no
    * backreferences — so the Java (Spark) and RE2 (DuckDB oracle) engines
    * agree byte-for-byte. */
  private[graft] val piiPatterns: Seq[(String, String)] = Seq(
    // local@domain.tld
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "<EMAIL>",
    // separator-delimited phone shapes: (555) 123-4567, 555-123-4567,
    // +1 555 123 4567 — undelimited digit runs fall through to <NUM>
    "(\\+?[0-9]{1,2}[-. ]?)?\\(?[0-9]{3}\\)?[-. ][0-9]{3}[-. ][0-9]{4}" -> "<PHONE>",
    // key/token-looking: 28+ unbroken base64ish characters
    "[A-Za-z0-9+/_-]{28,}" -> "<KEY>",
    // long digit runs: SSNs, card and account numbers
    "[0-9]{9,}" -> "<NUM>")

  /** Redact PII in place: emails, delimited phone numbers, key-looking
    * tokens, and long digit runs each collapse to a typed sentinel. A pure
    * per-row `regexp_replace` chain — codegen'd, shuffle-free, streams at
    * any scale. */
  def redactPii(text: Column): Column =
    piiPatterns.foldLeft(text) { case (c, (p, r)) => regexp_replace(c, p, r) }

  /** Number of redactions in an already-redacted text (sentinel count). */
  def piiHits(redacted: Column): Column =
    regexp_count(redacted, lit("<EMAIL>|<PHONE>|<KEY>|<NUM>")).cast("long")

  /** Scrub a document frame: redact PII in `textCol`, and DROP documents
    * with more than `maxHits` redactions — heavily-PII documents (credential
    * dumps, contact-list boilerplate) are worth dropping outright rather
    * than keeping as sentinel soup. */
  def scrubPii(df: DataFrame, textCol: String, maxHits: Int = Int.MaxValue): DataFrame =
    df.withColumn("__redacted", redactPii(col(textCol)))
      .filter(piiHits(col("__redacted")) <= maxHits)
      .withColumn(textCol, col("__redacted"))
      .drop("__redacted")

  /** Duplicate fraction of an array: 1 − distinct/total (0 when empty). */
  private def dupFrac(arr: Column): Column =
    when(size(arr) > 0,
      round(lit(1.0) - size(array_distinct(arr)).cast("double") / size(arr).cast("double"), 6))
      .otherwise(lit(0.0))

  /** Gopher-style repetition profile: the fraction of duplicate words,
    * bigrams, and trigrams in each document — the standard cheap signal for
    * boilerplate / degenerate-generation filtering. One codegen'd per-row
    * expression tree (tokenize once, shifted-slice zip for the n-grams):
    * no shuffle, no UDF, streams at 100 TB.
    *
    * Output columns: n_words, dup_word_frac, dup_bigram_frac,
    * dup_trigram_frac. */
  def repetitionStats(text: Column): Seq[(String, Column)] = {
    val w = tokens(text)
    Seq(
      "n_words" -> size(w).cast("long"),
      "dup_word_frac" -> dupFrac(w),
      "dup_bigram_frac" -> dupFrac(Dedup.wordGrams(w, 2)),
      "dup_trigram_frac" -> dupFrac(Dedup.wordGrams(w, 3)))
  }

  /** Script & encoding-health profile — the charset QC stage of a curation
    * pipeline (mojibake, binary-contaminated, or mis-decoded documents show
    * up as control/replacement characters and off-script ratios). Counts
    * use EXPLICIT code-point ranges, not named script classes, so any
    * regex engine reproduces them exactly (no Unicode-table drift):
    *
    *  - n_chars:       total characters
    *  - n_latin:       A-Za-z + Latin-1/Extended letters (U+00C0–U+024F)
    *  - n_cjk:         CJK Unified Ideographs (U+4E00–U+9FFF)
    *  - n_cyrillic:    U+0400–U+04FF
    *  - n_control:     C0 controls except tab/newline/CR, plus DEL
    *  - n_replacement: U+FFFD — the tombstone of a failed decode
    *
    * Pure per-row codegen'd `regexp_count`s; no shuffle, no UDF. */
  def scriptProfile(text: Column): Seq[(String, Column)] = Seq(
    "n_chars" -> length(text).cast("long"),
    "n_latin" -> regexp_count(text, lit("[A-Za-zÀ-ɏ]")).cast("long"),
    "n_cjk" -> regexp_count(text, lit("[一-鿿]")).cast("long"),
    "n_cyrillic" -> regexp_count(text, lit("[Ѐ-ӿ]")).cast("long"),
    "n_control" -> regexp_count(text, lit("[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]")).cast("long"),
    "n_replacement" -> regexp_count(text, lit("�")).cast("long"))

  /** Strip encoding damage in place: control characters (keeping
    * tab/newline/CR) and replacement characters are removed — the cheap
    * ftfy-style cleanup applied before any text statistic. */
  def stripEncodingDamage(text: Column): Column =
    regexp_replace(text, "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F�]", "")

  /** HTML → text extraction — the stage between a WARC response payload
    * and the curation chain (the trafilatura/jusText slot, as a
    * deterministic tag-level extractor): script/style/comment blocks are
    * removed whole, remaining tags become spaces, the five core entities
    * decode (`&amp;` LAST — decoding it first would double-decode
    * `&amp;lt;`), and whitespace collapses. A per-row codegen'd
    * `regexp_replace`/`replace` chain — no parser state, no UDF, streams
    * at any scale; patterns avoid lookarounds so any RE2-class engine
    * reproduces them byte-identically. */
  def htmlToText(html: Column): Column = {
    val noBlocks = Seq("script", "style").foldLeft(html) { (c, t) =>
      regexp_replace(c, s"(?s)<$t[^>]*>.*?</$t>", " ")
    }
    val noComments = regexp_replace(noBlocks, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComments, "<[^>]*>", " ")
    val decoded = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
        "&#39;" -> "'", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (e, ch)) => replace(c, lit(e), lit(ch)) }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** Gopher-style quality RULE BREAKDOWN (Rae et al. 2021 §A1.1, the
    * standard pre-model document filter) — each rule as a named boolean
    * column plus the conjunction, so a pipeline can both FILTER on `pass`
    * and AUDIT which rule rejected a document. All per-row codegen'd
    * expressions; no shuffle, no UDF.
    *
    *  - r_words:    word count within [minWords, maxWords]
    *  - r_word_len: mean word length within [3, 10] characters
    *  - r_symbol:   (# + ellipsis) occurrences per word ≤ 0.1
    *  - r_bullet:   ≤ 90% of lines start with a bullet (•, -, *)
    *  - r_ellipsis: ≤ 30% of lines end with an ellipsis
    *  - r_alpha:    ≥ 80% of words contain an alphabetic character
    *  - r_stop:     ≥ 2 distinct stopwords present
    */
  def gopherRules(text: Column, minWords: Int = 50,
      maxWords: Int = 100000): Seq[(String, Column)] = {
    // typed Column construction throughout (not expr() over text.toString):
    // a COMPOSED input column — concat with quoted literals, say — would
    // stringify into unparseable SQL, while typed functions compose with
    // any Column the caller passes
    val w = split(trim(text), "\\s+")
    val n = size(w)
    val nd = n.cast("double")
    val lines = split(text, "\n")
    val nLines = size(lines).cast("double")
    val meanWord = length(array_join(w, "")).cast("double") / nd
    val hashCount = length(text) - length(replace(text, lit("#"), lit("")))
    val ell3 = (length(text) - length(replace(text, lit("..."), lit("")))).cast("double") / 3.0
    val ellU = length(text) - length(replace(text, lit("…"), lit("")))
    val bulletLines = size(filter(lines, x =>
      startswith(ltrim(x), lit("•")) || startswith(ltrim(x), lit("-")) ||
        startswith(ltrim(x), lit("*")))).cast("double")
    val ellipsisLines = size(filter(lines, x =>
      endswith(rtrim(x), lit("...")) || endswith(rtrim(x), lit("…")))).cast("double")
    val alphaWords = size(filter(w, x => x.rlike("[a-zA-Z]"))).cast("double")
    val distinctStops = size(array_intersect(
      array_distinct(w), array(stopwords("en").map(lit): _*)))
    val rules = Seq(
      "r_words" -> n.between(minWords, maxWords),
      "r_word_len" -> (n > 0 && meanWord.between(3.0, 10.0)),
      "r_symbol" -> (n > 0 &&
        (hashCount.cast("double") + ell3 + ellU.cast("double")) / nd <= 0.1),
      "r_bullet" -> (bulletLines / nLines <= 0.9),
      "r_ellipsis" -> (ellipsisLines / nLines <= 0.3),
      "r_alpha" -> (n > 0 && alphaWords / nd >= 0.8),
      "r_stop" -> (distinctStops >= 2))
    rules :+ ("pass" -> rules.map(_._2).reduce(_ && _))
  }

  /** Corpus-wide heavy hitters: the `k` most frequent whitespace tokens with
    * occurrence counts, ties broken by token (deterministic cut line). The
    * plan is the right 100 TB shape without any custom code: explode →
    * partial+final count (vocabulary-sized exchange, not corpus-sized) →
    * `TakeOrderedAndProject` for the global top-k (per-partition k, never a
    * full sort). */
  def topTokens(df: DataFrame, textCol: String, k: Int): DataFrame =
    df.select(explode(tokens(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token"))
      .limit(k)

  /** Collocation mining: the `topN` most frequent word BIGRAMS with an
    * integer pointwise-mutual-information signal — the classic corpus
    * phrase detector (Church & Hanks 1990). PMI =
    * log₂ p(ab)/(p(a)p(b)); here spelled entirely in BIT LENGTHS
    * (`length(bin(x))` — the [[CorpusSignals]] surprisal convention):
    * `pmi_bits = bl(C_ab) + 2·bl(T) − bl(B) − bl(C_a) − bl(C_b)`
    * where T/B are corpus token/bigram totals. Bit lengths add where
    * logs add, cannot overflow (no products are formed), and are exact
    * on both engines — the ±couple-bit quantization is fine for the
    * screening signal this is.
    *
    * Scale shape: bigram and unigram counts are vocabulary-sized
    * partial+final aggregates; totals are two 1-row broadcasts; the
    * ranking is a bounded TakeOrderedAndProject. `minCount` drops the
    * hapax tail BEFORE the join (rare bigrams have wild PMI — the
    * published caveat).
    *
    * Output: word_a, word_b, n_pair, n_a, n_b, pmi_bits — topN by
    * (n_pair DESC, word_a ASC, word_b ASC). */
  def collocations(df: DataFrame, textCol: String, topN: Int,
      minCount: Long = 5L): DataFrame = {
    require(topN > 0, s"topN must be positive, got $topN")
    val bitLen = (c: Column) => length(bin(c)).cast("long")
    val toks = df.select(tokens(col(textCol)).as("w"))
    val uni = toks.select(explode(col("w")).as("t"))
      .filter(col("t") =!= "")
      .groupBy("t").agg(count(lit(1)).as("n"))
    val biAll = toks
      .select(explode(expr(
        "filter(transform(w, (x, i) -> struct(x as a, try_element_at(w, i + 2) as b)), " +
          "p -> p.b is not null and p.a <> '' and p.b <> '')")).as("p"))
      .select(col("p.a").as("word_a"), col("p.b").as("word_b"))
      .groupBy("word_a", "word_b").agg(count(lit(1)).as("n_pair"))
    // totals BEFORE the minCount cut — p(ab) is relative to all bigrams
    val totals = broadcast(uni.agg(sum(col("n")).as("__t"))
      .crossJoin(biAll.agg(sum(col("n_pair")).as("__b"))))
    biAll
      .filter(col("n_pair") >= minCount)
      .join(uni.select(col("t").as("word_a"), col("n").as("n_a")), Seq("word_a"))
      .join(uni.select(col("t").as("word_b"), col("n").as("n_b")), Seq("word_b"))
      .crossJoin(totals)
      .select(col("word_a"), col("word_b"), col("n_pair"), col("n_a"), col("n_b"),
        (bitLen(col("n_pair")) + lit(2L) * bitLen(col("__t")) -
          bitLen(col("__b")) - bitLen(col("n_a")) - bitLen(col("n_b"))).as("pmi_bits"))
      .orderBy(col("n_pair").desc, col("word_a"), col("word_b"))
      .limit(topN)
  }

  /** Vocabulary-growth (Heaps-law) curve: scanning documents in ascending
    * id order, each token's FIRST-OCCURRENCE document pins when it enters
    * the vocabulary; the curve reports, per `bucketSize`-doc bucket that
    * introduces at least one token, the new-token count, the cumulative
    * vocabulary size, and the cumulative corpus token total (the Heaps
    * x-axis). Bucket grain — not per-doc — is the scale choice: the
    * cumulative window runs over ≤ idRange/bucketSize rows, never one row
    * per document.
    *
    * Scale shape: one token aggregation (min doc per token — map-side
    * combined), one bucket-grain aggregation each side, windows over the
    * bucket table only.
    *
    * Output: bucket_start (first doc id of the bucket), n_new, cum_vocab,
    * cum_tokens. */
  def vocabGrowth(df: DataFrame, idCol: String, textCol: String,
      bucketSize: Long = 50L): DataFrame = {
    require(bucketSize > 0, s"bucketSize must be positive, got $bucketSize")
    val idiv = (a: Column, b: Column) => call_function("div", a, b)
    val toks = df.select(col(idCol).cast("long").as("_doc"),
      explode(tokens(col(textCol))).as("_tok"))
    val newPerBucket = toks
      .groupBy("_tok").agg(min(col("_doc")).as("_doc"))
      .groupBy(idiv(col("_doc"), lit(bucketSize)).as("_b"))
      .agg(count(lit(1)).as("n_new"))
    val toksPerBucket = toks
      .groupBy(idiv(col("_doc"), lit(bucketSize)).as("_b"))
      .agg(count(lit(1)).as("_nt"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("_b"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    toksPerBucket.join(newPerBucket, Seq("_b"), "left")
      .na.fill(0L, Seq("n_new"))
      .withColumn("cum_vocab", sum(col("n_new")).over(w))
      .withColumn("cum_tokens", sum(col("_nt")).over(w))
      .filter(col("n_new") > 0)
      .select((col("_b") * bucketSize).as("bucket_start"), col("n_new"),
        col("cum_vocab"), col("cum_tokens"))
  }

  /** 60-bit document fingerprint: minimum md5-hash over word 5-gram shingles
    * (winnowing-style robust fingerprint; falls back to whole-text hash for
    * docs shorter than 5 words). */
  def fingerprint(text: Column): Column = {
    // cast inside the lambda: array_min over decimal STRINGS would compare
    // lexicographically ("100" < "99") — must be numeric before the min
    val gram = Dedup.shingles(text, 5).toString
    val hashes = s"transform($gram, g -> md5long(g))"
    when(size(split(trim(text), "\\s+")) < 5, Hashing.md5Long(text))
      .otherwise(expr(s"array_min($hashes)"))
  }
}
