package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-relative document signals: statistics of a document computed
  * against the WHOLE corpus (unlike TextAnalysis' per-row signals).
  *
  *  - token rarity: how much of a document is made of corpus-rare tokens —
  *    the integer-exact analog of CCNet-style LM filtering (a document full
  *    of tokens the corpus has never seen is OCR noise / mojibake / spam);
  *  - boilerplate fraction: how much of a document's n-gram content is
  *    SHARED with other documents — RefinedWeb/C4-style duplicated-span
  *    detection (headers, footers, templates) without the all-pairs cost.
  *
  * All scores are integer arithmetic (counts, millionths via floor) so an
  * independent SQL engine reproduces them bit-exactly — no logs, no
  * FP-order-dependent sums.
  */
object CorpusSignals {

  /** Per-document token-rarity profile against the corpus' document
    * frequencies (df = number of documents containing the token):
    *
    * {{{ id | n_tokens | n_rare | rare_ppm | df_score }}}
    *
    *  - `n_rare`: token OCCURRENCES whose df <= maxDf;
    *  - `rare_ppm`: floor(1e6 * n_rare / n_tokens) — the rare fraction in
    *    millionths;
    *  - `df_score`: sum over occurrences of floor(1e6 / df) — an exact
    *    integer inverse-df weight (rare tokens dominate; the corpus-noise
    *    analog of an LM perplexity screen).
    *
    * 100 TB shape: the explode collapses to (doc, token, count) through a
    * map-side partial aggregate, so only doc-DISTINCT pairs cross the wire;
    * token df is a second partial+final aggregate; the join back is keyed
    * by token — hot tokens (stopwords) are exactly the high-df keys, so at
    * scale AQE skew-join splits them; nothing is collected to the driver.
    */
  def rarityStats(df: DataFrame, idCol: String, textCol: String,
      maxDf: Long): DataFrame = {
    val occ = df
      .select(col(idCol).as("id"), explode(TextAnalysis.tokens(col(textCol))).as("tok"))
      .groupBy("id", "tok").agg(count(lit(1)).as("cnt"))
    // count(cnt>0 → id), not count(*): the spelling keeps BOTH occ columns
    // referenced in this branch, so column pruning cannot specialize its
    // copy of occ's (id, tok) exchange subtree and ReuseExchange computes
    // the scan + explode + partial agg ONCE for the df count and the join
    // back (cnt is a count, always > 0 — the value is identical)
    val dfs = occ.groupBy("tok")
      .agg(count(when(col("cnt") > 0, col("id"))).as("df"))
    occ.join(dfs, "tok")
      .groupBy("id")
      .agg(
        sum(col("cnt")).as("n_tokens"),
        sum(when(col("df") <= maxDf, col("cnt")).otherwise(lit(0L))).as("n_rare"),
        sum(col("cnt") * floor(lit(1000000.0) / col("df")).cast("long")).as("df_score"))
      .withColumn("rare_ppm",
        floor(col("n_rare") * lit(1000000.0) / col("n_tokens")).cast("long"))
      .select(col("id"), col("n_tokens"), col("n_rare"), col("rare_ppm"), col("df_score"))
  }

  /** Per-document boilerplate profile: the fraction of the document's
    * DISTINCT word n-grams that also appear in at least `minDocs` documents
    * (the document itself included):
    *
    * {{{ id | n_grams | n_common | common_ppm }}}
    *
    * A near-1.0 `common_ppm` marks template/boilerplate documents; a
    * moderate one marks shared headers/footers. Documents with fewer than
    * `ngram` words produce no grams and are absent from the output.
    *
    * 100 TB shape: per-doc distinct gram HASHES are computed map-side
    * ([[Dedup.shingleHashes]] — the raw text never shuffles); gram df is a
    * partial+final aggregate; the join back is keyed by gram hash, where
    * the heavy keys are precisely the common grams — AQE skew-join
    * territory, never a pair explosion (contrast all-pairs Jaccard).
    */
  def boilerplateStats(df: DataFrame, idCol: String, textCol: String,
      ngram: Int = 3, minDocs: Int = 2): DataFrame = {
    // The repartition is a deliberate materialization barrier (the
    // fingerprintJaccardDups trick): without it the df-count branch and the
    // join-back branch are DIFFERENT exchange subtrees (one has a partial
    // agg below it), so the scan + gram md5 hashing runs twice; with it
    // both branches read ONE reused exchange, the gram df needs no further
    // shuffle (already hash-partitioned by gh), and the join is
    // co-partitioned. The (id, gh) pairs must cross the wire whole for the
    // join anyway, so the lost pre-shuffle combine costs nothing extra.
    val grams = df
      .select(col(idCol).as("id"),
        explode(Dedup.shingleHashes(col(textCol), ngram)).as("gh"))
      .repartition(col("gh"))
    // count(id), not count(*): with count(*) column pruning drops `id`
    // below THIS branch's exchange, the two subtrees stop being identical,
    // and ReuseExchange no longer fires (ids are non-null here, so the
    // counts agree)
    val dfs = grams.groupBy("gh").agg(count(col("id")).as("df"))
    grams.join(dfs, "gh")
      .groupBy("id")
      .agg(
        count(lit(1)).as("n_grams"),
        sum(when(col("df") >= minDocs, lit(1L)).otherwise(lit(0L))).as("n_common"))
      .withColumn("common_ppm",
        floor(col("n_common") * lit(1000000.0) / col("n_grams")).cast("long"))
  }

  /** Cross-document DUPLICATED-SPAN detection — the bounded analog of
    * suffix-array exact-substring dedup (Lee et al., "Deduplicating
    * Training Data Makes Language Models Better") at n-gram granularity:
    * a token position starts a duplicated gram when its `ngram`-token run
    * also appears in ≥ `minDocs` distinct documents; MAXIMAL runs of
    * consecutive duplicated positions are merged into spans (the
    * `pos − row_number` island trick). Output, one row per document that
    * contains at least one duplicated span:
    *
    * {{{ id | n_dup_grams | n_spans | longest_span_tokens }}}
    *
    * 100 TB shape: gram df is a partial+final distinct aggregate keyed by
    * the 60-bit gram hash; the join back is gram-keyed (a gram shared by k
    * docs costs k rows, never k²); island-merge windows partition on the
    * DOCUMENT id — corpus-cardinality keys, so every reducer holds a few
    * documents' positions, not a corpus slice. */
  def dupSpans(df: DataFrame, idCol: String, textCol: String,
      ngram: Int = 5, minDocs: Int = 2): DataFrame = {
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")
    val pg = df
      .select(col(idCol).as("id"),
        posexplode(Dedup.wordGrams(TextAnalysis.tokens(col(textCol)), ngram))
          .as(Seq("pos", "g")))
      .select(col("id"), col("pos"), Hashing.md5Long(col("g")).as("gh"))
    val shared = pg.groupBy("gh").agg(countDistinct(col("id")).as("gdf"))
      .filter(col("gdf") >= minDocs).select("gh")
    val w = org.apache.spark.sql.expressions.Window.partitionBy("id").orderBy("pos")
    pg.join(shared, "gh")
      .withColumn("grp", col("pos") - row_number().over(w))
      .groupBy("id", "grp").agg(count(lit(1)).as("len_g"))
      .groupBy("id").agg(
        sum("len_g").as("n_dup_grams"),
        count(lit(1)).as("n_spans"),
        (max("len_g") + lit(ngram - 1)).as("longest_span_tokens"))
      .select(col("id").as(idCol), col("n_dup_grams"),
        col("n_spans"), col("longest_span_tokens").cast("long").as("longest_span_tokens"))
  }

  /** Line-level boilerplate REMOVAL (the RefinedWeb/CCNet line-dedup
    * stage): a non-blank line appearing in ≥ `minDf` DISTINCT documents is
    * template furniture (headers, footers, cookie banners, nav) and is
    * stripped from every document; blank lines always survive (they carry
    * structure, and their corpus df is meaningless). Output:
    * `(idCol, textCol stripped, n_stripped)` — documents with no text
    * change pass through byte-identical (split/join on `\n` is lossless).
    *
    * 100 TB shape: line df is a partial+final distinct aggregate; the
    * heavy-line table (df ≥ minDf survivors) is SMALL by construction —
    * AQE broadcasts it into the probe join, so document lines never
    * shuffle; reassembly is one groupBy on the document id with a bounded
    * per-document `collect_list` (a document's own lines — not corpus
    * state). */
  def stripBoilerplateLines(df: DataFrame, idCol: String, textCol: String,
      minDf: Int = 3): DataFrame = {
    require(minDf >= 2, s"minDf must be >= 2, got $minDf")
    val lines = df.select(col(idCol).as("id"),
      posexplode(split(col(textCol), "\n")).as(Seq("pos", "line")))
    val heavy = lines
      .filter(trim(col("line")) =!= "")
      .groupBy("line").agg(countDistinct(col("id")).as("line_df"))
      .filter(col("line_df") >= minDf)
      .select(col("line"), lit(true).as("heavy"))
    lines.join(heavy, Seq("line"), "left")
      .groupBy(col("id"))
      .agg(
        array_sort(collect_list(
          when(col("heavy").isNull, struct(col("pos"), col("line"))))).as("kept"),
        count(col("heavy")).as("n_stripped"))
      .select(col("id").as(idCol),
        concat_ws("\n", expr("transform(kept, x -> x.line)")).as(textCol),
        col("n_stripped"))
  }

  /** C4-style GLOBAL line deduplication (Raffel et al., "Exploring the
    * Limits of Transfer Learning…", §2.2's line-level dedup): every
    * non-blank line that occurs in multiple places corpus-wide is kept only
    * at its FIRST occurrence — smallest (doc, position) — and dropped
    * everywhere else; blank lines always survive. Documents are then
    * reassembled from their surviving lines in order.
    *
    * Scale shape: winners are `groupBy(line).agg(min(struct(id, pos)))` —
    * partial map-side min collapses even a billion-occurrence boilerplate
    * line to one row per task BEFORE the exchange, and the join back is a
    * plain equi-join AQE can skew-split; deliberately NOT a per-line
    * `row_number` window, which would funnel each hot line through a single
    * task. Blank lines bypass the winner machinery entirely (they are the
    * most duplicated string in any corpus and carry no signal).
    *
    * Output: one row per doc — `idCol`, rebuilt `textCol`, `n_lines`
    * (original), `n_dropped` (lines removed as non-first duplicates).
    */
  def dedupLinesGlobal(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val lines = df.select(col(idCol).as("id"),
      posexplode(split(col(textCol), "\n")).as(Seq("pos", "line")))
    val blank = trim(col("line")) === ""
    val nonBlank = lines.filter(!blank)
    val winners = nonBlank
      .groupBy("line")
      .agg(min(struct(col("id"), col("pos"))).as("first_at"))
    val kept = nonBlank
      .join(winners, Seq("line"))
      .withColumn("keep", struct(col("id"), col("pos")) === col("first_at"))
      .select(col("id"), col("pos"), col("line"), col("keep"))
      .unionByName(lines.filter(blank).withColumn("keep", lit(true)))
    kept
      .groupBy("id")
      .agg(
        array_sort(collect_list(
          when(col("keep"), struct(col("pos"), col("line"))))).as("kept_lines"),
        count(lit(1)).as("n_lines"),
        count(when(!col("keep"), lit(1))).as("n_dropped"))
      .select(col("id").as(idCol),
        concat_ws("\n", expr("transform(kept_lines, x -> x.line)")).as(textCol),
        col("n_lines"), col("n_dropped"))
  }

  /** Integer bit-length `floor(log2(x)) + 1` for a positive long column —
    * the engine-portable log2 every surprisal score here is built from
    * (`length(bin(x))`: pure string ops, no FP log whose last-ulp rounding
    * could differ between engines). */
  private def bitLen(c: Column): Column = length(bin(c)).cast("long")

  /** Bigram language-model surprisal per document — the integer-exact
    * analog of the CCNet/KenLM perplexity filter (Wenzek et al., "CCNet:
    * Extracting High Quality Monolingual Datasets from Web Crawl Data"):
    * fit a bigram LM on the corpus itself, score each document by its mean
    * conditional surprisal; unusually-improbable text (mojibake, spam,
    * word salad) scores high, templated text scores low. Per bigram
    * `b = (w1, w2)`:
    *
    * {{{ surp(b) = bitlen(c(w1 ·)) − bitlen(c(w1 w2))  ≈  −log2 p(w2 | w1) }}}
    *
    * where `c(w1 ·)` is the corpus count of bigrams starting with `w1`
    * (the LM context count) and bitlen is [[bitLen]] — both counts are
    * exact integers, so the score is bit-identical across engines and
    * partitionings. Output, one row per document with ≥ 1 bigram:
    *
    * {{{ id | n_bigrams | surprisal | mean_surprisal_ppm | n_novel }}}
    *
    *  - `surprisal`: Σ count·surp over the document's bigram occurrences;
    *  - `mean_surprisal_ppm`: floor(1e6 · surprisal / n_bigrams) — the
    *    per-token perplexity proxy to threshold on;
    *  - `n_novel`: occurrences of bigrams appearing in NO other document
    *    (corpus df = 1) — the novel-content complement of
    *    [[boilerplateStats]]' shared fraction.
    *
    * 100 TB shape: document bigrams collapse to `(doc, bigram, count)`
    * through a map-side partial aggregate; the corpus LM is a second
    * partial+final aggregate over that SAME exchange (the
    * `count(when(cnt > 0, id))` df spelling keeps both branches' column
    * sets identical so ReuseExchange scans and explodes once — see
    * [[rarityStats]]); context counts come from a window over the
    * distinct-bigram table partitioned by `w1` (vocabulary-cardinality
    * keys — never a corpus-sized reducer), not a third pass over text.
    * The join back is bigram-keyed; stopword-headed bigrams are the
    * high-df keys AQE skew-splits. Nothing is collected to the driver. */
  def surprisalStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // NULL ids dropped (like [[importanceScore]]: a per-document row needs
    // an identity, and the bdf spelling below would otherwise skip NULL-id
    // rows while an engine counting rows would not — an oracle divergence).
    // The explicit isnotnull(bg) is a semantic no-op (grams are concats of
    // non-null tokens) — but the JOIN below infers it on its probe side and
    // pushes it above the explode, while on the LM side it cannot push
    // through the context Window; spelling it here puts it in BOTH branches
    // so the occ subtrees stay identical and ReuseExchange scans once
    val occ = df.filter(col(idCol).isNotNull)
      .select(col(idCol).as("id"),
        explode(Dedup.wordGrams(TextAnalysis.tokens(col(textCol)), 2)).as("bg"))
      .filter(col("bg").isNotNull)
      .groupBy("id", "bg").agg(count(lit(1)).as("cnt"))
    // corpus bigram count + bigram document-frequency in one aggregate
    // (occ rows are doc-distinct, so count(id-rows) IS the df; cnt > 0
    // always — the when() keeps id referenced for ReuseExchange)
    val grams = occ.groupBy("bg").agg(
      sum(col("cnt")).as("cb"),
      count(when(col("cnt") > 0, col("id"))).as("bdf"))
    val surp = withSurprisal(grams).select(col("bg"), col("bdf"), col("surp"))
    occ.join(surp, "bg")
      .groupBy("id")
      .agg(
        sum(col("cnt")).as("n_bigrams"),
        sum(col("cnt") * col("surp")).as("surprisal"),
        sum(when(col("bdf") === 1, col("cnt")).otherwise(lit(0L))).as("n_novel"))
      .withColumn("mean_surprisal_ppm",
        floor(col("surprisal") * lit(1000000.0) / col("n_bigrams")).cast("long"))
      .select(col("id"), col("n_bigrams"), col("surprisal"),
        col("mean_surprisal_ppm"), col("n_novel"))
  }

  /** DSIR-style hashed-n-gram importance score (Xie et al., "Data Selection
    * for Language Models via Importance Resampling"): how much more a
    * document looks like a TARGET domain than like the corpus overall.
    * Bigrams hash into `buckets` feature buckets; each bucket gets an
    * integer log-likelihood-ratio weight from add-one-smoothed counts
    *
    * {{{ w(b) = [bitlen(ct(b)+1) − bitlen(Nt+1)] − [bitlen(cs(b)+1) − bitlen(Ns+1)] }}}
    *
    * (target vs corpus log2-probabilities, [[bitLen]] integer log2; the
    * Nt/Ns terms normalize for sample size) and a document scores the
    * count-weighted sum over its features — positive ⇒ target-like.
    * Selection composes downstream: threshold, top-k, or resample with
    * [[DataMix]]'s deterministic coin. Output:
    *
    * {{{ id | n_feats | dsir_score }}}
    *
    * 100 TB shape: both count vectors live on `buckets` keys — aggregate
    * rows, never documents — and the weight table is broadcast into the
    * feature join, so the only corpus-sized shuffle is the per-document
    * partial+final aggregate; the target side reuses the same exchange
    * (filter spelled as a 0/1 weight inside the aggregate, not a separate
    * scan). Nothing is collected to the driver. */
  def importanceScore(df: DataFrame, idCol: String, textCol: String,
      targetPred: Column, buckets: Int = 4096): DataFrame = {
    require(buckets > 0, s"buckets must be > 0, got $buckets")
    // NULL ids dropped (an importance row needs an identity) — and the
    // filter licenses the when(id.isNotNull, …) aggregate spellings below
    // explicit isnotnull(fb) for the same ReuseExchange alignment as
    // [[surprisalStats]]: the join infers it probe-side only, and it cannot
    // push through the totals Window on the weights side
    val occ = df.filter(col(idCol).isNotNull)
      .select(col(idCol).as("id"), targetPred.cast("boolean").as("is_target"),
        bigramsOf(col(textCol)).as("bg"))
      .select(col("id"), col("is_target"), featureBucket(col("bg"), buckets).as("fb"))
      .filter(col("fb").isNotNull)
      .groupBy("id", "is_target", "fb").agg(count(lit(1)).as("cnt"))
    // per-bucket corpus and target counts: `buckets` rows out of a
    // partial+final aggregate; totals via a global window over those rows
    // (bucket-cardinality — trivially small) instead of a driver collect.
    // The when(id.isNotNull, …) spelling is value-identical (ids are
    // filtered non-null) and keeps id referenced in this branch, so its
    // occ subtree matches the join-back's and ReuseExchange computes the
    // scan + explode + partial aggregate ONCE — the [[rarityStats]] trick,
    // plan-pinned in PlanAuditSpec
    val weights = llrWeights(occ.groupBy("fb").agg(
      sum(when(col("id").isNotNull, col("cnt"))).as("cs"),
      sum(when(col("is_target"), col("cnt")).otherwise(lit(0L))).as("ct")))
    // is_target kept as a grouping key (constant per id): genuinely useful
    // downstream (selection usually excludes the target sample itself) and
    // it keeps this branch's occ column set identical to the weights branch
    occ.join(broadcast(weights), "fb")
      .groupBy("id", "is_target")
      .agg(sum(col("cnt")).as("n_feats"),
        sum(col("cnt") * col("w")).as("dsir_score"))
      .select(col("id"), col("is_target"), col("n_feats"), col("dsir_score"))
  }

  /** Attach the conditional bit-length surprisal to a bigram-count frame
    * `(bg, cb, …)`: context counts `c(w1 ·)` as a window over the
    * distinct-bigram rows partitioned by first word (vocabulary-cardinality
    * keys), then `surp = bitlen(cw) − bitlen(cb)`. Passes other columns
    * through. Shared by [[surprisalStats]] and [[crossSurprisal]] — the two
    * must stay formula-identical. */
  private def withSurprisal(grams: DataFrame): DataFrame = {
    val byCtx = org.apache.spark.sql.expressions.Window
      .partitionBy(substring_index(col("bg"), " ", 1))
    grams
      .withColumn("cw", sum(col("cb")).over(byCtx))
      .withColumn("surp", bitLen(col("cw")) - bitLen(col("cb")))
      .drop("cw")
  }

  /** Cross-corpus LM scoring — the actual CCNet configuration: the bigram
    * LM is fit on a REFERENCE corpus (clean text) and a different corpus is
    * scored against it. Bigrams the reference never saw take the add-one-
    * smoothed maximum surprisal `bitlen(N + 1)` (probability 1/(N+1), N =
    * reference bigram occurrences) and are counted separately — a high
    * OOV-occurrence share is its own noise signal. Output, one row per
    * target document with ≥ 1 bigram:
    *
    * {{{ id | n_bigrams | surprisal | mean_surprisal_ppm | n_unseen }}}
    *
    * 100 TB shape: the reference is scanned ONCE — the distinct-bigram LM
    * and its occurrence total N come from the same exchange (the
    * bg-referencing spelling keeps both branches' column sets identical
    * for ReuseExchange), and N rides into the plan as a broadcast one-row
    * aggregate, so the operator stays fully LAZY (no driver action at
    * build time). Target documents collapse to doc-distinct (id, bg, cnt)
    * map-side before the bigram-keyed LM join — occurrence multiplicity
    * never crosses the wire (the [[surprisalStats]] shape); stopword-headed
    * bigrams are the high-df join keys AQE skew-splits. */
  def crossSurprisal(ref: DataFrame, refTextCol: String, target: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    val grams = ref.select(bigramsOf(col(refTextCol)).as("bg"))
      .groupBy("bg").agg(count(lit(1)).as("cb"))
    val lm = withSurprisal(grams).select(col("bg"), col("surp"))
    // N = Σ cb over the SAME gram exchange; coalesce(…, 0): an EMPTY
    // reference sums to NULL, and both engines must then score every
    // bigram as unseen at bitlen(0 + 1) = 1, not NULL
    val nAgg = grams.agg(
      sum(when(col("bg").isNotNull, col("cb"))).as("n_ref"))
    val occT = target.filter(col(idCol).isNotNull)
      .select(col(idCol).as("id"), bigramsOf(col(textCol)).as("bg"))
      .groupBy("id", "bg").agg(count(lit(1)).as("cnt"))
    occT.join(lm, Seq("bg"), "left")
      .crossJoin(broadcast(nAgg))
      .withColumn("eff_surp",
        coalesce(col("surp"), bitLen(coalesce(col("n_ref"), lit(0L)) + 1)))
      .groupBy("id")
      .agg(
        sum(col("cnt")).as("n_bigrams"),
        sum(col("cnt") * col("eff_surp")).as("surprisal"),
        sum(when(col("surp").isNull, col("cnt")).otherwise(lit(0L))).as("n_unseen"))
      .withColumn("mean_surprisal_ppm",
        floor(col("surprisal") * lit(1000000.0) / col("n_bigrams")).cast("long"))
      .select(col("id"), col("n_bigrams"), col("surprisal"),
        col("mean_surprisal_ppm"), col("n_unseen"))
  }

  /** The DSIR featurization, shared verbatim by [[importanceScore]],
    * [[importanceWeights]], and `StreamingPipeline.scoreStream` — the
    * frozen-model contract depends on all three hashing features
    * bit-identically, so there is exactly one spelling of each half. */
  private[graft] def bigramsOf(textCol: Column): Column =
    explode(Dedup.wordGrams(TextAnalysis.tokens(textCol), 2))
  private[graft] def featureBucket(bg: Column, buckets: Int): Column =
    pmod(Hashing.md5Long(bg), lit(buckets))

  /** Add-one-smoothed log2-likelihood-ratio weights from a per-bucket
    * count frame `(fb, cs, ct)` — corpus and target occurrence counts.
    * Totals are windows over the bucket rows (≤ buckets of them), never a
    * driver collect. Output: `(fb, w)`. */
  private def llrWeights(bucketCounts: DataFrame): DataFrame = {
    val all = org.apache.spark.sql.expressions.Window.partitionBy(lit(1))
    bucketCounts
      .withColumn("ns", sum(col("cs")).over(all))
      .withColumn("nt", sum(col("ct")).over(all))
      .select(col("fb"),
        ((bitLen(col("ct") + 1) - bitLen(col("nt") + 1)) -
         (bitLen(col("cs") + 1) - bitLen(col("ns") + 1))).as("w"))
  }

  /** Standalone DSIR weight TRAINING — the frozen-model half of the
    * nightly-model / streaming-ingest split: the same weights
    * [[importanceScore]] fuses into its one-scan plan, as a `(fb, w)`
    * table to persist and join against fresh data (see
    * `StreamingPipeline.scoreStream`). One corpus scan, no per-document
    * collapse (occurrence totals need no doc identity) — but the SAME
    * null-id exclusion as importanceScore, or the two halves would train
    * on different corpora. The output is DENSE (every bucket 0..buckets−1,
    * unseen ones with cs = ct = 0): an unseen bucket's add-one-smoothed
    * weight is bitlen(Ns+1) − bitlen(Nt+1), NOT zero — fresh vocabulary
    * must be scored by the model's smoothing, not silently neutralized. */
  def importanceWeights(df: DataFrame, idCol: String, textCol: String,
      targetPred: Column, buckets: Int = 4096): DataFrame = {
    require(buckets > 0, s"buckets must be > 0, got $buckets")
    val counts = df.filter(col(idCol).isNotNull)
      .select(targetPred.cast("boolean").as("is_target"),
        bigramsOf(col(textCol)).as("bg"))
      .select(col("is_target"), featureBucket(col("bg"), buckets).as("fb"))
      .groupBy("fb").agg(
        count(lit(1)).as("cs"),
        sum(when(col("is_target"), lit(1L)).otherwise(lit(0L))).as("ct"))
    val dense = df.sparkSession.range(buckets)
      .select(col("id").as("fb"))
      .join(counts, Seq("fb"), "left")
      .select(col("fb"), coalesce(col("cs"), lit(0L)).as("cs"),
        coalesce(col("ct"), lit(0L)).as("ct"))
    llrWeights(dense)
  }

  /** The second half of DSIR — deterministic importance RESAMPLING over an
    * [[importanceScore]] output: accept each document with probability
    * proportional to 2^score. The scores ARE log2-likelihood-ratios (built
    * from [[bitLen]]), so the acceptance probability in millionths is the
    * base rate bit-SHIFTED by the score — integer end to end, no FP `pow`:
    *
    * {{{ p_ppm = clamp(score ≥ 0 ? basePpm << min(score, 20)
    *                             : basePpm >> min(−score, 20), 0, 1e6) }}}
    *
    * and a document is accepted when its salted md5 coin (the [[DataMix]]
    * construction — `md5('salt:' || id) % 1e6`) lands below `p_ppm`.
    * Deterministic in the id alone: the same document gets the same
    * decision on any cluster, any partitioning, any engine. Output:
    * `(id, dsir_score, p_ppm, accepted)` — one decision row per scored
    * document; callers filter `accepted` (audits keep the full frame).
    *
    * 100 TB shape: pure per-row arithmetic fused into the upstream plan —
    * zero shuffles, zero state. */
  def importanceResample(scored: DataFrame, idCol: String, scoreCol: String,
      basePpm: Long, salt: String = "dsir"): DataFrame = {
    require(basePpm >= 0 && basePpm <= 1000000L,
      s"basePpm must be in [0, 1e6], got $basePpm")
    val s = col(scoreCol).cast("long")
    // SQL-function spelling: the Scala shiftleft/shiftright helpers take a
    // literal bit count, and the shift here is the (capped) score column.
    // A NULL score is an explicit REJECTED decision (p_ppm 0 ⇒ accepted
    // false), not a NULL row — the "one decision row per scored document"
    // contract stays total under filtering on `accepted`.
    val pPpm = when(s.isNull, lit(0L)).otherwise(least(lit(1000000L),
      when(s >= 0, expr(s"shiftleft(${basePpm}L, cast(least(cast(`$scoreCol` as bigint), 20L) as int))"))
        .otherwise(expr(s"shiftright(${basePpm}L, cast(least(-cast(`$scoreCol` as bigint), 20L) as int))"))))
    scored.select(col(idCol).as("id"), col(scoreCol),
      pPpm.as("p_ppm"), (DataMix.coin(col(idCol), salt) < pPpm).as("accepted"))
  }

  /** Supervised multinomial Naive-Bayes TRAINING over the frozen
    * hashed-bigram featurization ([[bigramsOf]] ∘ [[featureBucket]]) — the
    * fastText-style classifier stage real curation pipelines train on
    * labeled reference data (wiki-vs-crawl quality, language ID, domain
    * routing) and then run over the whole crawl. Input: one row per
    * LABELED document. Output, the DENSE model — one row per
    * (label × bucket), so fresh-vocabulary buckets score by the model's
    * add-one smoothing rather than silently vanishing (the
    * [[importanceWeights]] density argument):
    *
    * {{{ label | fb | w | prior_w }}}
    *
    *  - `w = bitlen(c(label,fb) + 1) − bitlen(N(label) + buckets)` — the
    *    integer log2 of the add-one-smoothed class-conditional feature
    *    probability (c = occurrences of bucket fb under label, N(label) =
    *    all feature occurrences under label);
    *  - `prior_w = bitlen(d(label)) − bitlen(d_total)` — the integer log2
    *    class prior from document counts, repeated per row so the model is
    *    one self-contained joinable table.
    *
    * Everything is [[bitLen]] integer arithmetic — bit-exact on any engine,
    * and the weights compose additively with [[classifyNb]]'s sum exactly
    * like the DSIR ratios do. NULL ids / NULL labels are excluded (a
    * training example needs both).
    *
    * 100 TB shape: the feature pass is one labeled-corpus scan into a
    * partial+final aggregate on (label, fb) — aggregate rows out, never
    * documents; the prior pass re-scans only the pruned label column
    * (count of rows, no explode); the dense grid is labels × `buckets`
    * crossJoin'd from two aggregate frames, and the per-label totals are
    * windows over those aggregate rows. Nothing is collected. */
  def trainNbModel(labeled: DataFrame, idCol: String, textCol: String,
      labelCol: String, buckets: Int = 4096): DataFrame = {
    require(buckets > 0, s"buckets must be > 0, got $buckets")
    val base = labeled
      .filter(col(idCol).isNotNull && col(labelCol).isNotNull)
      .select(col(labelCol).cast("string").as("label"), col(textCol).as("__t"))
    // class priors: label-cardinality aggregate rows; the global total is
    // a window over them (never a driver collect)
    val allW = org.apache.spark.sql.expressions.Window.partitionBy(lit(1))
    val priors = base.groupBy("label").agg(count(lit(1)).as("d"))
      .withColumn("dt", sum(col("d")).over(allW))
      .select(col("label"),
        (bitLen(col("d")) - bitLen(col("dt"))).as("prior_w"))
    val counts = base
      .select(col("label"), bigramsOf(col("__t")).as("bg"))
      .select(col("label"), featureBucket(col("bg"), buckets).as("fb"))
      .filter(col("fb").isNotNull)
      .groupBy("label", "fb").agg(count(lit(1)).as("c"))
    val spark = labeled.sparkSession
    val grid = priors.select(col("label"), col("prior_w"))
      .crossJoin(spark.range(buckets).select(col("id").as("fb")))
    val byLabel = org.apache.spark.sql.expressions.Window.partitionBy("label")
    grid.join(counts, Seq("label", "fb"), "left")
      .withColumn("c", coalesce(col("c"), lit(0L)))
      .withColumn("nl", sum(col("c")).over(byLabel))
      .select(col("label"), col("fb"),
        (bitLen(col("c") + 1) - bitLen(col("nl") + buckets)).as("w"),
        col("prior_w"))
  }

  /** Naive-Bayes CLASSIFICATION with a frozen [[trainNbModel]] model — the
    * inference half of the nightly-train / corpus-classify split. `buckets`
    * MUST equal the training value (the frozen-featurization contract: both
    * halves hash with the one [[featureBucket]] spelling). Output, one row
    * per document with ≥ 1 bigram (the [[crossSurprisal]] contract —
    * a featureless document has no likelihood term to rank on):
    *
    * {{{ id | label | nb_score | n_feats }}}
    *
    * where `nb_score(id, l) = prior_w(l) + Σ_occ w(l, fb(occ))` and the
    * emitted label is the argmax; ties break to the lexicographically
    * GREATEST label (the max-of-struct order), deterministically.
    *
    * 100 TB shape: one corpus scan → map-side-combined (id, fb, cnt)
    * collapse (occurrence multiplicity never crosses the wire) → a
    * BROADCAST join against the labels × buckets model (aggregate-sized by
    * construction) → two aggregate-row reductions, (id, label) then the
    * argmax on (id). No windows over documents, nothing driver-side. */
  def classifyNb(model: DataFrame, docs: DataFrame, idCol: String,
      textCol: String, buckets: Int = 4096): DataFrame = {
    require(buckets > 0, s"buckets must be > 0, got $buckets")
    val occ = docs.filter(col(idCol).isNotNull)
      .select(col(idCol).as("id"), bigramsOf(col(textCol)).as("bg"))
      .select(col("id"), featureBucket(col("bg"), buckets).as("fb"))
      .filter(col("fb").isNotNull)
      .groupBy("id", "fb").agg(count(lit(1)).as("cnt"))
    // every (id, fb) row fans out to one row per label here — k is the
    // label count, so the pre-collapse above keeps the fan-out on
    // doc-distinct rows, not raw occurrences
    val scores = occ.join(broadcast(model), Seq("fb"))
      .groupBy("id", "label")
      .agg((max(col("prior_w")) + sum(col("cnt") * col("w"))).as("nb_score"),
        sum(col("cnt")).as("n_feats"))
    scores.groupBy("id")
      .agg(max(struct(col("nb_score"), col("label"))).as("top"),
        max(col("n_feats")).as("n_feats"))
      .select(col("id"), col("top.label").as("label"),
        col("top.nb_score").as("nb_score"), col("n_feats"))
  }

  /** Quality-stratified corpus report — the curriculum/mixing view: docs
    * bucketed into `nStrata` corpus-relative quality strata (bounds = the
    * exact interior percentiles of the milli-quantized quality score,
    * collected bounded and inlined; a doc's stratum = number of bounds
    * strictly below its score, so boundary ties fall DOWN — documented,
    * deterministic). Per stratum: doc count, exact mean tokens in
    * micro-units, and the score range — the table a quality-curriculum
    * schedule or quality-weighted mixture is specified against.
    *
    * Scale shape: one exact-percentile aggregate over the milli scores
    * (bounds row ≤ nStrata−1 values), then a map-side stratum expression
    * and one stratum-cardinality aggregate. Bounds round to 6 dp — the
    * [[graft.pipeline.EventAnalytics.valuePercentiles]] engine-parity
    * regime. */
  def qualityStrata(df: DataFrame, idCol: String, textCol: String,
      nStrata: Int = 10): DataFrame = {
    require(nStrata >= 2, s"nStrata must be >= 2, got $nStrata")
    val qm = round(TextAnalysis.qualityScore(col(textCol)) * 1000).cast("long")
    val scored = df.select(qm.as("q_milli"),
      TextAnalysis.tokenCount(col(textCol)).cast("long").as("n_toks"))
    val fracs = (1 until nStrata).map(_.toDouble / nStrata)
    val bounds = scored
      .agg(transform(percentile(col("q_milli"), array(fracs.map(lit): _*)),
        b => round(b, 6)).as("bs"))
      .head.getSeq[Double](0)
    val stratum = bounds.foldLeft(lit(0L): Column) { (acc, b) =>
      acc + (col("q_milli") > lit(b)).cast("long")
    }
    scored.withColumn("stratum", stratum)
      .groupBy("stratum")
      .agg(count(lit(1)).as("n_docs"),
        call_function("div", sum(col("n_toks")) * 1000000L, count(lit(1)))
          .as("mean_tokens_micro"),
        min(col("q_milli")).as("q_min"), max(col("q_milli")).as("q_max"))
  }

  /** Skip-gram training-pair extraction (the word2vec co-occurrence
    * table): for every token position, each token within `window`
    * positions (either side, excluding itself) is a (center, context)
    * pair; output is the aggregated pair table (center, context, n) —
    * what embedding trainers and PMI-style association miners consume.
    *
    * Scale shape: ONE window pass per document computes all `window`
    * forward leads (per-doc state, bounded by the doc's token count —
    * the audioFingerprints shape), and the symmetric direction is
    * emitted MAP-SIDE by mirroring each forward pair — never a
    * positions self-join, never a second window. The pair aggregation
    * is partial+final on (center, context). */
  def skipGramPairs(docs: DataFrame, idCol: String, textCol: String,
      window: Int = 2): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    val byDoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_doc")).orderBy(col("_pos"))
    val leads = array((1 to window).map(d => lead(col("_tok"), d).over(byDoc)): _*)
    docs
      .select(col(idCol).as("_doc"),
        posexplode(graft.pipeline.TextAnalysis.tokens(col(textCol)))
          .as(Seq("_pos", "_tok")))
      .select(col("_doc"), col("_pos"), col("_tok"), leads.as("_leads"))
      .select(col("_tok"), explode(col("_leads")).as("_nxt"))
      .filter(col("_nxt").isNotNull)
      // mirror map-side: the forward pair (a, b) IS the backward pair
      // (b, a) of the other position — no second window pass
      .select(explode(array(
        struct(col("_tok").as("center"), col("_nxt").as("context")),
        struct(col("_nxt").as("center"), col("_tok").as("context")))).as("_p"))
      .groupBy(col("_p.center").as("center"), col("_p.context").as("context"))
      .agg(count(lit(1)).as("n"))
  }
}
