package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.pipeline._
import graft.sources.TestDataSource

/** Training-data-pipeline operator queries (dedup, similarity search,
  * text analysis, multimodal) with DuckDB oracles.
  *
  * All hashing is md5-based ([[pipeline.Hashing]]) and all vector arithmetic
  * is integer-quantized, so both engines produce bit-identical results —
  * the oracles replicate the exact formulas, not approximations.
  */
object PipelineQueries {
  import Hashing.{P, duckMd5Long, permA, permB}

  // spread (size-gated, identity at real scale): the gate corpus is ONE
  // parquet split, so every per-row expression pipeline (regex shingling,
  // md5, token stats) otherwise runs single-task while 31 cores idle —
  // guide §2.5's exact shape. At production scale the scan has thousands
  // of splits and the repartition never fires.
  private def docs(spark: SparkSession, dir: String): DataFrame =
    Projections.spreadInput(
      new TestDataSource(spark, dir).table("documents"), col("doc_id"))

  /** Deterministic synthetic URL per doc_id for the q_url_* gates — built
    * IDENTICALLY by the DuckDB oracle, which then derives the expected
    * parse analytically from the same formulas (never re-running the
    * operator's regex machinery). Exercises: scheme/host case folding,
    * default-port stripping (https:443) vs kept ports (http:443, :8080),
    * missing paths, tracking-parameter stripping around kept parameters,
    * fragments, IP hosts, co.uk-style suffixes, and two invalid shapes
    * (no scheme; userinfo). */
  private def synthUrl(id: Column): Column = {
    val scheme = when(id % 3 === 0, lit("HTTPS")).otherwise(lit("http"))
    val host = element_at(array(
      lit("News.Example.COM"), lit("example.com"), lit("blog.example.co.uk"),
      lit("cdn.assets.example.org"), lit("192.168.0.1"), lit("spam.click"),
      lit("shop.example.com")), (id % 7 + 1).cast("int"))
    val port = when(id % 4 === 0, lit(":443"))
      .when(id % 4 === 1, lit(":8080")).otherwise(lit(""))
    val path = when(id % 5 === 4, lit(""))
      .otherwise(concat(lit("/p/"), (id % 50).cast("string")))
    val query = when(id % 2 === 0,
        concat(lit("?utm_source=feed&q="), (id % 10).cast("string"), lit("&gclid=abc")))
      .when(id % 5 === 0, lit("?ref=tw")).otherwise(lit(""))
    val frag = when(id % 5 === 0, concat(lit("#sec-"), (id % 3).cast("string")))
      .otherwise(lit(""))
    when(id % 29 === 0, lit("banana"))
      .when(id % 23 === 0, lit("http://alice@example.com/private"))
      .otherwise(concat(scheme, lit("://"), host, port, path, query, frag))
  }
  private def embs(spark: SparkSession, dir: String): DataFrame =
    Projections.spreadInput(
      new TestDataSource(spark, dir).table("embeddings"), col("vec_id"))

  // ---------------- queries ----------------

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_text_stats" -> ((s, d) => docs(s, d).select(
      col("doc_id"),
      TextAnalysis.tokenCount(col("text")).cast("long").as("tok_ws"),
      TextAnalysis.bpeishTokenCount(col("text")).cast("long").as("tok_bpe"),
      TextAnalysis.distinctWords(col("text")).cast("long").as("n_distinct"))),

    "q_text_normalize" -> ((s, d) => docs(s, d).select(
      // canonical form: the fixture prefixes DECOMPOSED é (e + U+0301),
      // uppercase, and doubled spaces; NFC (native expression) + lower +
      // whitespace collapse must agree with DuckDB's nfc_normalize chain,
      // and the codepoint length must shrink by exactly the NFC merge
      col("doc_id"),
      TextAnalysis.normalizeText(concat(lit("Cafe\u0301  NR"),
        col("doc_id").cast("string"), lit("  "), col("text"))).as("norm"),
      length(concat(lit("Cafe\u0301  NR"), col("doc_id").cast("string"),
        lit("  "), col("text"))).cast("long").as("len_before"),
      length(TextAnalysis.normalizeText(concat(lit("Cafe\u0301  NR"),
        col("doc_id").cast("string"), lit("  "), col("text"))))
        .cast("long").as("len_after"))),

    "q_text_quality" -> ((s, d) => docs(s, d).select(
      col("doc_id"),
      TextAnalysis.qualityScore(col("text")).as("quality"))),

    "q_corpus_report" -> ((s, d) => {
      // the per-source corpus report card: doc/token counts, mean quality
      // (micro-units — per-doc quality scores are 6-dp doubles rounded to
      // exact integers BEFORE summing, so aggregation order cannot move
      // the result), and Gopher pass rate in ppm
      val quality = TextAnalysis.qualityScore(col("text"))
      val pass = TextAnalysis.gopherRules(col("text"), minWords = 50).last._2
      docs(s, d)
        .select(col("source"),
          TextAnalysis.tokenCount(col("text")).cast("long").as("tok"),
          round(quality * 1000000).cast("long").as("qm"),
          pass.cast("long").as("gp"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum(col("tok")).as("tok_total"),
          sum(col("qm")).as("_qs"), sum(col("gp")).as("gopher_pass"))
        .select(col("source"), col("n_docs"), col("tok_total"),
          expr("_qs div n_docs").as("quality_mean_micro"),
          col("gopher_pass"),
          expr("(gopher_pass * 1000000) div n_docs").as("gopher_pass_ppm"))
    }),

    "q_text_langid" -> ((s, d) => docs(s, d).select(
      col("doc_id"),
      TextAnalysis.languageId(col("text")).as("lang_pred"))),

    "q_text_fingerprint" -> ((s, d) => docs(s, d).select(
      col("doc_id"),
      TextAnalysis.fingerprint(col("text")).as("fp"))),

    "q_text_redact" -> ((s, d) => {
      // the corpus text is digit-free, so PII is synthesized DETERMINISTICALLY
      // from doc_id (same construction in the oracle): every doc gets an
      // email; docs divisible by 3/5/7 also get a phone / account digit run /
      // API-key-looking token — exercising all four redaction rules
      val aug = concat_ws(" ", col("text"),
        concat(lit("user"), col("doc_id").cast("string"), lit("@example.com")),
        when(col("doc_id") % 3 === 0, lit("call (555) 123-4567 now")).otherwise(lit("")),
        when(col("doc_id") % 5 === 0,
          concat(lit("acct "), col("doc_id").cast("string"), lit("9999888877"))).otherwise(lit("")),
        when(col("doc_id") % 7 === 0,
          lit("token a1B2c3D4e5F6g7H8i9J0k1L2m3N4")).otherwise(lit("")))
      docs(s, d).select(col("doc_id"),
          TextAnalysis.redactPii(aug).as("redacted"))
        .withColumn("n_pii", TextAnalysis.piiHits(col("redacted")))
    }),

    "q_text_repetition" -> ((s, d) => {
      val stats = TextAnalysis.repetitionStats(col("text"))
      docs(s, d).select(col("doc_id") +: stats.map { case (n, c) => c.as(n) }: _*)
    }),

    "q_pipeline_v2" -> ((s, d) => {
      // the r6 curation chain composed end-to-end: line-level boilerplate
      // strip → encoding-damage strip → Gopher rule filter → exact dedup
      // (keep-min) → token stats. One oracle verifies the whole chain
      val injected = docs(s, d).select(col("doc_id"),
        concat(
          when(col("doc_id") % 2 === 0, lit("COOKIE BANNER\n")).otherwise(lit("")),
          lit("DOC START\n"), col("text"),
          when(col("doc_id") % 3 === 0, lit("\nCopyright Footer")).otherwise(lit(""))
        ).as("text"))
      val stripped = CorpusSignals.stripBoilerplateLines(injected, "doc_id", "text", minDf = 3)
      val cleaned = stripped.withColumn("text",
        TextAnalysis.stripEncodingDamage(col("text")))
      val pass = TextAnalysis.gopherRules(col("text"), minWords = 50)
        .find(_._1 == "pass").get._2
      val passed = cleaned.filter(pass)
      val keep = Dedup.exactDedup(passed, "doc_id", "text")
        .select(col("keep_id").as("doc_id"))
      passed.join(keep, Seq("doc_id"))
        .select(col("doc_id"), col("n_stripped"),
          TextAnalysis.tokenCount(col("text")).cast("long").as("tok_ws"))
    }),

    "q_dup_spans" -> ((s, d) =>
      // bounded exact-substring signal: maximal cross-doc duplicated
      // 5-gram runs, merged into spans per doc
      CorpusSignals.dupSpans(docs(s, d), "doc_id", "text", ngram = 5, minDocs = 2)),

    "q_strip_lines" -> ((s, d) => {
      // line-level boilerplate removal: inject shared banner/header/footer
      // lines (the testdata has no newlines of its own), then strip lines
      // appearing in >= 3 distinct docs; each doc's own text line survives
      val injected = docs(s, d).select(col("doc_id"),
        concat(
          when(col("doc_id") % 2 === 0, lit("COOKIE BANNER\n")).otherwise(lit("")),
          lit("DOC START\n"), col("text"),
          when(col("doc_id") % 3 === 0, lit("\nCopyright Footer")).otherwise(lit(""))
        ).as("text"))
      CorpusSignals.stripBoilerplateLines(injected, "doc_id", "text", minDf = 3)
    }),

    "q_text_script" -> ((s, d) => {
      // charset QC: script-range + encoding-damage counts per doc
      val prof = TextAnalysis.scriptProfile(col("text"))
      docs(s, d).select(col("doc_id") +: prof.map { case (n, c) => c.as(n) }: _*)
    }),

    "q_token_budget" -> ((s, d) =>
      // token-share mixture: 800/5000/400 whitespace tokens from three
      // sources in salted-hash order, boundary doc excluded; other sources
      // dropped. Two-phase prefix sum (bucket offsets + fine window)
      DataMix.takeTokenBudget(docs(s, d), "doc_id", "text", "source",
        budgets = Map("src1" -> 800L, "src2" -> 5000L, "src3" -> 400L))),

    "q_export_shards" -> ((s, d) =>
      // deterministic global shuffle into 8 training shards with per-shard
      // positions — computed by repartition + sortWithinPartitions + a
      // streaming counter, never a shard-cardinality window
      DataMix.exportShards(docs(s, d), "doc_id", nShards = 8)),

    "q_shard_manifest" -> ((s, d) => {
      // the export data card: per shard, doc/token totals and an order-
      // sensitive content fingerprint (md5 of the seq-ordered id list) —
      // what a training job checks before trusting a shard set
      val sh = DataMix.exportShards(docs(s, d), "doc_id", nShards = 8)
      sh.join(docs(s, d).select(col("doc_id"),
          TextAnalysis.tokenCount(col("text")).cast("long").as("nt")), Seq("doc_id"))
        .groupBy(col("shard").cast("long").as("shard"))
        .agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("n_tokens"),
          Hashing.md5Long(concat_ws(",",
            expr("transform(sort_array(collect_list(struct(seq, doc_id))), e -> cast(e.doc_id as string))")))
            .as("content_fp"))
    }),

    "q_text_gopher" -> ((s, d) => {
      // Gopher rule breakdown: per-rule booleans + the conjunction, so the
      // oracle checks every individual threshold, not just the final verdict
      val rules = TextAnalysis.gopherRules(col("text"), minWords = 50)
      docs(s, d).select(col("doc_id") +: rules.map { case (n, c) => c.as(n) }: _*)
    }),

    "q_sample_group" -> ((s, d) =>
      // 5 docs per source by salted-hash order — deterministic stratified
      // subsample through the bounded two-phase top-k (never a window rank)
      DataMix.samplePerGroup(docs(s, d), "source", "doc_id", n = 5)),

    "q_chunk_overlap" -> ((s, d) =>
      // 64-token windows every 48 tokens (16-token overlap; last chunk short)
      Chunking.chunk(docs(s, d), "doc_id", "text", chunkSize = 64, stride = 48)),

    "q_ingest_e2e" -> ((s, d) => {
      // the full crawl ingest composed: WARC containers (HTML payloads,
      // odd ids gzipped) → record explode → HTML-to-text → token stats.
      // The oracle only knows the original text — every byte-level stage
      // must round-trip for the hash to match
      val recs = Multimodal.parseWarcPayloads(
        Multimodal.syntheticHtmlWarcs(docs(s, d), "doc_id", "text"))
      recs.select(col("media_id").as("doc_id"), col("target_uri"),
          TextAnalysis.htmlToText(col("payload")).as("extracted"))
        .select(col("doc_id"), col("target_uri"), col("extracted"),
          TextAnalysis.tokenCount(col("extracted")).cast("long").as("tok_ws"))
    }),

    "q_corpus_rollup" -> ((s, d) =>
      // multi-granularity report in ONE pass: (source, lang) cells +
      // per-source subtotals + grand total via ROLLUP (Expand feeding one
      // partial+final aggregation — never three scans); grouping_id
      // disambiguates subtotal nulls from data nulls
      docs(s, d)
        .rollup(col("source"), col("lang"))
        .agg(grouping_id().as("gid"), count(lit(1)).as("n_docs"),
          sum(TextAnalysis.tokenCount(col("text")).cast("long")).as("tok_total"))
        .select(col("source"), col("lang"), col("gid"),
          col("n_docs"), col("tok_total"))),

    "q_jsonl_ingest" -> ((s, d) => {
      // JSONL intake with quarantine: real to_json escaping, %13 lines
      // truncated mid-record (malformed), %19 missing the required text
      // field — parse + disposition are one map-side projection; the
      // oracle only knows the id rules and the original text
      val lines = JsonIngest.syntheticJsonl(docs(s, d), "doc_id", "text", "lang")
      JsonIngest.parseJsonl(lines, "line")
        .select(col("orig_id"), col("status"),
          when(col("status") === "ok",
            TextAnalysis.tokenCount(col("text")).cast("long")).as("tok"))
    }),

    "q_csv_ingest" -> ((s, d) => {
      // CSV intake through the REAL Univocity parser (from_csv, RFC-4180
      // "" escapes): the text field carries an embedded comma AND quotes,
      // %13 rows get extra columns (malformed), %19 rows an empty text
      // (missing_field); the oracle only knows the id rules + original text
      val lines = CsvIngest.syntheticCsv(
        docs(s, d), "doc_id", "text", "lang", "n_chars")
      CsvIngest.parseCsv(lines, "line")
        .select(col("orig_id"), col("status"),
          when(col("status") === "ok", col("text")).as("text_out"),
          when(col("status") =!= "malformed", col("n_chars")).as("n_chars_out"))
    }),

    "q_html_extract" -> ((s, d) =>
      // HTML → text: wrap each doc in a full page (head/title, script,
      // style, comment, entities, markup splitting the body) and extract;
      // the oracle builds the EXPECTED text analytically from doc_id +
      // text — never by replaying the regex chain
      docs(s, d).select(col("doc_id"),
        TextAnalysis.htmlToText(concat(
          lit("<html><head><title>Doc "), col("doc_id"),
          lit("</title><script>var x = 1 &amp;&amp; 2;\nif (x < 3) { x = 4; }</script>"),
          lit("<style>p { color: red; }\n.a > .b { margin: 0; }</style></head>"),
          lit("<body><!-- boilerplate\n comment --><h1 class=\"t\">Doc "), col("doc_id"),
          lit("</h1><p>"), col("text"),
          lit("</p><div>3 &lt; 4 &amp;&amp; 5 &gt; 2, a &quot;quoted&#39; tail</div></body></html>")
        )).as("extracted"))),

    "q_multimodal_warc" -> ((s, d) =>
      // REAL container parse: a synthetic WARC per doc (2 + id%3 records,
      // analytic headers/payloads; odd ids ship whole-container gzip — the
      // .warc.gz path), exploded back to one row per record. The oracle
      // recomputes every field from the (id, k) formula, never the bytes
      Multimodal.parseWarc(Multimodal.syntheticWarcs(docs(s, d), "doc_id"))),

    "q_multimodal_ppm" -> ((s, d) =>
      // REAL image decode: synthesize a valid binary-PPM blob per doc
      // (pixel j = (id*31 + j*7) % 256), parse it back with the pure-JVM
      // decoder, emit dims + per-channel means. 64 px/channel ⇒ every mean
      // is an exact power-of-two division — bit-identical in the oracle,
      // which computes the same stats from the FORMULA (never the bytes)
      Multimodal.decodeImages(docs(s, d).select(
        col("doc_id").as("media_id"),
        Multimodal.syntheticPpm(col("doc_id"), 8, 8).as("bytes")))),

    "q_multimodal_bmp" -> ((s, d) =>
      // REAL BMP decode: same logical image as q_multimodal_ppm but through
      // BMP's bottom-up/BGR/padded layout (6×8 ⇒ 2 pad bytes per row); the
      // top-left red is the positional witness that the orientation and
      // channel unswizzling actually happened
      Multimodal.decodeBmps(docs(s, d).select(
          col("doc_id").as("media_id"),
          Multimodal.syntheticBmp(col("doc_id"), 6, 8).as("bytes")))
        .select(col("media_id"), col("width"), col("height"),
          round(col("mean_r"), 6).as("mean_r"), round(col("mean_g"), 6).as("mean_g"),
          round(col("mean_b"), 6).as("mean_b"), col("tl_r"))),

    "q_multimodal_png" -> ((s, d) =>
      // REAL compressed-codec decode: a valid 8-bit RGB PNG per doc — the
      // q_multimodal_ppm logical image pushed through scanline filtering
      // ((id+y)%5 sweeps all five filter types across the corpus), zlib
      // DEFLATE, and a two-chunk IDAT split; the decoder must verify CRCs,
      // inflate, and unfilter to reproduce the formula's stats
      Multimodal.decodePngs(Multimodal.syntheticPngs(
          docs(s, d).select(col("doc_id")), "doc_id", 5, 6))
        .select(col("media_id"), col("width"), col("height"),
          round(col("mean_r"), 6).as("mean_r"), round(col("mean_g"), 6).as("mean_g"),
          round(col("mean_b"), 6).as("mean_b"), col("tl_r"))),

    "q_multimodal_jpeg" -> ((s, d) =>
      // REAL perceptual-codec decode: a valid grayscale JPEG per doc via
      // the JDK's ImageIO write+read cycle; quality-1.0 + per-8×8-block
      // constants make the DCT round-trip bit-exact, so dims, the exact
      // power-of-two-divided mean, and the two corner witnesses all come
      // from the generation formula — the oracle never touches the codec
      Multimodal.decodeJpegs(Multimodal.syntheticJpegs(
        docs(s, d).select(col("doc_id")), "doc_id"))),

    "q_multimodal_mp3" -> ((s, d) =>
      // REAL frame-header container walk (ISO 11172-3 layout — public
      // spec, no audio decode): sync/version/layer validation, table-
      // decoded bitrate/rate, strict back-to-back frame lengths; every
      // field analytic in doc_id so the oracle recomputes the metadata
      Multimodal.mp3Metadata(Multimodal.syntheticMp3s(
        docs(s, d).select(col("doc_id")), "doc_id"))),

    "q_multimodal_gif" -> ((s, d) => {
      // REAL palette-codec decode: a valid grayscale GIF per doc through
      // ImageIO's LZW write+read cycle (lossless, palette-lookup exact),
      // plus the perceptual dHash through the SAME multi-format dispatch
      // the image dedup pipeline hashes with — both derived by the oracle
      // from the generation formula
      val gifs = Multimodal.syntheticGifs(docs(s, d).select(col("doc_id")), "doc_id")
      Multimodal.decodeGifs(gifs)
        .select(col("media_id"), col("width"), col("height"),
          round(col("mean_r"), 6).as("mean_gray"), col("tl_r").as("tl_gray"))
        .join(Multimodal.imageDHashes(gifs)
          .select(col("media_id"), col("hash_hi"), col("hash_lo")), Seq("media_id"))
    }),

    "q_multimodal_wbmp" -> ((s, d) => {
      // REAL 1-bit decode: hand-written type-0 WBMP read back by ImageIO
      // (writer shares no library with the reader), stats + the dHash
      // through the multi-format dispatch, all re-derived by the oracle
      // from the bit formula
      val wbmps = Multimodal.syntheticWbmps(docs(s, d).select(col("doc_id")), "doc_id")
      Multimodal.decodeWbmps(wbmps)
        .select(col("media_id"), col("width"), col("height"),
          round(col("mean_r"), 6).as("mean_gray"), col("tl_r").as("tl_gray"))
        .join(Multimodal.imageDHashes(wbmps)
          .select(col("media_id"), col("hash_hi"), col("hash_lo")), Seq("media_id"))
    }),

    "q_multimodal_tiff" -> ((s, d) => {
      // REAL TIFF decode with an asymmetric round-trip: the container is
      // serialized BY HAND (header | strip | 9-tag baseline IFD), ImageIO
      // only READS it — decoder and writer share no library. Stats + the
      // perceptual dHash both go through the same multi-format dispatch
      // the image dedup pipeline uses; the oracle derives everything from
      // the generation formula
      val tiffs = Multimodal.syntheticTiffs(docs(s, d).select(col("doc_id")), "doc_id")
      Multimodal.decodeTiffs(tiffs)
        .select(col("media_id"), col("width"), col("height"),
          round(col("mean_r"), 6).as("mean_gray"), col("tl_r").as("tl_gray"))
        .join(Multimodal.imageDHashes(tiffs)
          .select(col("media_id"), col("hash_hi"), col("hash_lo")), Seq("media_id"))
    }),

    "q_multimodal_avi" -> ((s, d) =>
      // REAL video decode: an MJPEG AVI per doc (RIFF container walk +
      // per-frame ImageIO decode); 2 + id%3 frames, frame f =
      // syntheticJpeg(id + 6f), so every frame stat is on the same
      // generation formula as q_multimodal_jpeg
      Multimodal.decodeAviMjpeg(Multimodal.syntheticAvis(
        docs(s, d).select(col("doc_id")), "doc_id"))),

    "q_multimodal_wav" -> ((s, d) =>
      // REAL audio decode: valid PCM16 WAV per doc — sample i's unsigned
      // word is u = (id*13 + i*97) % 65536, little-endian, so the int16
      // value is u (u < 32768) or u - 65536 (two's complement); parsed
      // back by the chunk-walking decoder; 256 samples ⇒ exact mean
      Multimodal.decodeAudio(
        Projections.spread(docs(s, d).select(col("doc_id").as("media_id")),
            col("media_id"))
          .select(col("media_id"),
            Multimodal.syntheticWav(col("media_id"), 256, 16000).as("bytes")))),

    "q_dedup_exact" -> ((s, d) =>
      Dedup.exactDedup(docs(s, d), "doc_id", "text")),

    "q_dedup_minhash" -> ((s, d) =>
      Dedup.minhashNearDups(docs(s, d), "doc_id", "text")),

    "q_decontaminate_fuzzy" -> ((s, d) => {
      // paraphrase-tolerant decontamination: the "test set" is every 25th
      // doc with its FIRST WORD dropped (a light paraphrase exact n-gram
      // containment misses at the head); cross-set banding + exact
      // Jaccard confirm flags the reworded overlaps
      val train = docs(s, d)
      val test = docs(s, d).filter(col("doc_id") % 25 === 0)
        .select((col("doc_id") + 900000L).as("doc_id"),
          concat_ws(" ",
            slice(split(trim(col("text")), "\\s+"), 2, 1000000)).as("text"))
      Dedup.minhashNearDupsAcross(train, test, "doc_id", "text")
    }),

    "q_dedup_yield" -> ((s, d) => {
      // the curation YIELD CARD: per source, docs in → exact-dedup
      // survivors → near-dup cluster survivors, with the final yield in
      // ppm — the ops row that says what each source actually contributes
      // after the dedup stack
      val dd = docs(s, d)
      val exact = dd.join(
        Dedup.exactDedup(dd, "doc_id", "text")
          .select(col("keep_id").as("doc_id")), Seq("doc_id"))
      val dropped = Clustering.connectedComponents(
          Dedup.minhashNearDups(exact, "doc_id", "text"), "id_1", "id_2",
          // minhashNearDups emits distinct id_1 < id_2 pairs by construction
          assumeCanonical = true)
        .filter(col("id") =!= col("cluster_id"))
        .select(col("id").as("doc_id"))
      val near = exact.join(dropped, Seq("doc_id"), "left_anti")
      val nIn = dd.groupBy("source").agg(count(lit(1)).as("n_in"))
      val nEx = exact.groupBy("source").agg(count(lit(1)).as("n_after_exact"))
      val nNr = near.groupBy("source").agg(count(lit(1)).as("n_after_near"))
      nIn.join(nEx, Seq("source"), "left").join(nNr, Seq("source"), "left")
        .select(col("source"), col("n_in"),
          coalesce(col("n_after_exact"), lit(0L)).as("n_after_exact"),
          coalesce(col("n_after_near"), lit(0L)).as("n_after_near"),
          expr("(coalesce(n_after_near, 0) * 1000000) div n_in").as("yield_ppm"))
    }),

    "q_dedup_prefix_join" -> ((s, d) =>
      // EXACT similarity join via prefix filtering: word-set Jaccard >= 0.5
      // with zero false negatives — the oracle is the brute-force truth,
      // which the lemma guarantees the filtered join equals byte-for-byte
      Dedup.prefixJaccardJoin(docs(s, d), "doc_id", "text")),

    "q_dedup_sorted_nbhd" -> ((s, d) =>
      // sorted-neighborhood blocking (merge/purge): global order by the
      // first-3-token key via the two-phase distributed rank, compare each
      // doc with its 3 successors, exact 3-gram-Jaccard ppm confirm
      Dedup.sortedNeighborhoodDups(docs(s, d), "doc_id", "text")),

    "q_dedup_eval_sweep" -> ((s, d) =>
      // the θ curve: one candidate + one truth pass, precision/recall at
      // 0.3 / 0.5 / 0.7 via exact-ppm Jaccard grains — same bounded
      // window as the single-θ eval
      Dedup.minhashEvalSweep(docs(s, d).filter(col("doc_id") < 1000),
        "doc_id", "text")),

    "q_dedup_minhash_eval" -> ((s, d) =>
      // the banding acceptance row: candidate precision (wasted confirms)
      // and recall (missed true pairs) of the 32×2 LSH vs brute force —
      // the oracle reproduces the 64 permutations and band packing.
      // Truth is O(n²) BY DEFINITION, so the eval runs on a bounded
      // contiguous id window (an id-mod sample would destroy the pair
      // structure — both endpoints must survive); at sf0.01 the window
      // IS the whole corpus, at sf0.1 it caps the pair space 25×
      Dedup.minhashEval(docs(s, d).filter(col("doc_id") < 1000),
        "doc_id", "text")),

    "q_snapshot_diff" -> ((s, d) => {
      // crawl-refresh diff: prev = docs except %11 (those are "new" in
      // cur... removed from prev's view), cur drops %13 (removed) and
      // rewrites %7 (changed); keys computed map-side, one id equi-join
      val all = docs(s, d)
      val prev = all.filter(col("doc_id") % 11 =!= 0).select("doc_id", "text")
      val cur = all.filter(col("doc_id") % 13 =!= 0)
        .select(col("doc_id"),
          when(col("doc_id") % 7 === 0, concat(col("text"), lit(" refreshed")))
            .otherwise(col("text")).as("text"))
      Dedup.snapshotDiff(prev, cur, "doc_id", "text")
    }),

    "q_dedup_editdist" -> ((s, d) =>
      // LSH-banded candidates confirmed by exact LEVENSHTEIN (≤10% of the
      // longer text) — the right verifier for small in-place edits; the
      // quadratic distance is paid only on band collisions, and Spark's
      // and DuckDB's codegen'd edit distances agree exactly. Banding is
      // the operator DEFAULT (bandingForRecall at the predicate's J≈0.5
      // floor ⇒ 35×3): capture ≥ 0.99 at the floor BY CONSTRUCTION — the
      // r12-flagged 16×4 sizing captured at-floor pairs with only ~0.64
      // probability, an oracle equality held up by dataset luck — while
      // still suppressing sub-threshold collisions ~8× harder than the
      // original 32×2 (BandingRecallSpec pins both numbers)
      Dedup.editDistanceNearDups(docs(s, d), "doc_id", "text",
        maxLen = 2000, maxDistPpm = 100000L)),

    "q_dedup_simhash" -> ((s, d) => docs(s, d).select(
      col("doc_id"),
      Dedup.simhash(col("text")).as("simhash"))),

    "q_dedup_jaccard" -> ((s, d) =>
      Dedup.fingerprintJaccardDups(docs(s, d), "doc_id", "text")),

    "q_dedup_incremental" -> ((s, d) => {
      // nightly-refresh shape: corpus = 4/5 of the docs; batch = the other
      // 1/5 PLUS re-submitted exact copies under fresh ids — corpus copies
      // (%7=3 → dup_exact_corpus) and batch-internal copies (%10=0 →
      // dup_exact_batch); near-dup pairs straddling the split exercise the
      // LSH-confirmed rules
      val all = docs(s, d)
      val corpus = all.filter(col("doc_id") % 5 =!= 0).select("doc_id", "text")
      val batch = all.filter(col("doc_id") % 5 === 0).select("doc_id", "text")
        .unionByName(all.filter(col("doc_id") % 7 === 3)
          .select((col("doc_id") + 100000).as("doc_id"), col("text")))
        .unionByName(all.filter(col("doc_id") % 10 === 0)
          .select((col("doc_id") + 200000).as("doc_id"), col("text")))
      Dedup.incrementalDedup(batch, corpus, "doc_id", "text")
    }),

    "q_dedup_incr_update" -> ((s, d) => {
      // the persisted-artifact nightly cycle: build artifacts once, decide
      // night-1's batch against them, fold the admitted docs back in
      // (insert-only), then decide night-2's batch — a re-submission of
      // night 1 under fresh ids, so every night-1 admission must now read
      // dup_exact_corpus and every near_dup_batch loser's key (admitted
      // via its smaller-id holder) must flip to a corpus rejection
      val all = docs(s, d)
      val corpus = all.filter(col("doc_id") % 5 =!= 0).select("doc_id", "text")
      val batch1 = all.filter(col("doc_id") % 5 === 0).select("doc_id", "text")
        .unionByName(all.filter(col("doc_id") % 7 === 3)
          .select((col("doc_id") + 100000).as("doc_id"), col("text")))
        .unionByName(all.filter(col("doc_id") % 10 === 0)
          .select((col("doc_id") + 200000).as("doc_id"), col("text")))
      // the REAL storage boundary between nights: write the artifact
      // tables to parquet and read them back (DedupArtifacts.write /
      // Dedup.readArtifacts) — the lineage cut materialize() only
      // simulates. The fold-back is the APPEND-ONLY path
      // (Dedup.appendDedupDelta): only the admitted delta's rows land,
      // never a rewrite of the corpus-sized artifact set. Night 2's
      // decision plan scans ONLY the read-back artifact tables + the
      // batch (plan-pinned).
      val tmp = java.nio.file.Files.createTempDirectory("graft_dedup_art_").toString
      val params = Map("ngram" -> 3L, "bands" -> 32L, "rowsPerBand" -> 2L)
      Dedup.buildDedupArtifacts(corpus, "doc_id", "text").write(s"$tmp/art", params)
      val art = Dedup.readArtifacts(s, s"$tmp/art")
      require(Dedup.readArtifactParams(s, s"$tmp/art") == params,
        "artifact build parameters must round-trip through the manifest")
      val dec1 = Dedup.incrementalDedup(batch1, art, "doc_id", "text", 3, 32, 2, 0.5)
        .localCheckpoint()
      Dedup.appendDedupDelta(s"$tmp/art", batch1, dec1, "doc_id", "text")
      val art2 = Dedup.readArtifacts(s, s"$tmp/art")
      val batch2 = batch1.select((col("doc_id") + 300000).as("doc_id"), col("text"))
      Dedup.incrementalDedup(batch2, art2, "doc_id", "text", 3, 32, 2, 0.5)
    }),

    "q_dedup_cluster" -> ((s, d) =>
      // pairs → connected components → survivor marking (large-star/small-star)
      Clustering.nearDupClusters(docs(s, d), "doc_id", "text")),

    "q_dedup_embed" -> ((s, d) =>
      // the operator's DEFAULT is the 100 TB path (SRP-LSH candidates +
      // exact confirm); the hyperplanes are deterministic md5-derived
      // integers, so the oracle inlines them and reproduces the candidate
      // set EXACTLY — hash-checked, not rows-only
      Similarity.cosineNearDups(embs(s, d), "vec_id", "embedding", threshold = 0.4)),

    "q_dedup_embed_exact" -> ((s, d) =>
      // exact O(n²) slice on a BOUNDED contiguous id window (the
      // minhashEval truth discipline, r13): the exact pair space is an
      // EVAL baseline, so its input is capped — the window is the whole
      // corpus at sf0.01 and volume-independent beyond it. The production
      // operator default is the LSH path (q_dedup_embed).
      Similarity.cosineNearDups(
        embs(s, d).filter(col("vec_id") < 1000), "vec_id", "embedding",
        threshold = 0.4, lshPrefilter = false)),

    "q_embed_communities" -> ((s, d) =>
      // semantic communities: the SRP-LSH-candidate cosine pair graph
      // (production path, auto-sized depth — r13) collapsed by 3
      // deterministic LPA rounds — finer than CC on embedding graphs,
      // where transitive chains of 0.4-cosine links otherwise fuse
      // unrelated topics
      Clustering.labelPropagation(
        Similarity.cosineNearDups(embs(s, d), "vec_id", "embedding",
          threshold = 0.4),
        "id_1", "id_2",
        // cosineNearDups emits distinct id_1 < id_2 pairs by construction
        assumeCanonical = true)),

    "q_dedup_embed_lsh" -> ((s, d) =>
      // kept for bench continuity with rounds 1-2 (≡ q_dedup_embed now)
      Similarity.cosineNearDups(embs(s, d), "vec_id", "embedding", threshold = 0.4,
        lshPrefilter = true, tables = 16)),

    "q_top_tokens" -> ((s, d) =>
      // corpus heavy hitters: vocabulary-sized exchange + global top-k
      TextAnalysis.topTokens(docs(s, d), "text", k = 20)),

    "q_vocab_growth" -> ((s, d) =>
      // Heaps-law curve at 50-doc bucket grain. The testdata's own
      // vocabulary saturates by doc 8 (31 tokens), so the gate enriches
      // each doc with a unique `u<id>` token (linear arrivals) and a
      // quadratic-residue `m<id² mod 997>` token (decelerating arrivals)
      // — a real decaying-new-token curve, same formula on both engines
      TextAnalysis.vocabGrowth(
        docs(s, d).select(col("doc_id"),
          concat(col("text"), lit(" u"), col("doc_id"), lit(" m"),
            pmod(col("doc_id") * col("doc_id"), lit(997L))).as("text")),
        "doc_id", "text")),

    "q_zorder" -> ((s, d) => {
      // Morton z-values over (doc_id, n_chars): the multi-column
      // clustering key — scaling bounds are one bounded collect, the
      // interleave is pure codegen'd bit arithmetic (oracle replays the
      // identical mask-spread chain)
      val dd = docs(s, d)
      dd.select(col("doc_id"),
        graft.sources.ZOrder.zValue(dd, "doc_id", "n_chars").as("z"))
    }),

    "q_collocations" -> ((s, d) =>
      // phrase detection: top bigrams + integer bit-length PMI signal —
      // vocabulary-sized aggregates, broadcast totals, bounded TakeOrdered
      TextAnalysis.collocations(docs(s, d), "text", topN = 20, minCount = 5L)),

    "q_rare_tokens" -> ((s, d) =>
      // corpus-relative token rarity (integer inverse-df weights) — the
      // exact analog of an LM/CCNet noise screen; df <= 50 marks "rare"
      CorpusSignals.rarityStats(docs(s, d), "doc_id", "text", maxDf = 50)),

    "q_lm_surprisal" -> ((s, d) =>
      // bigram-LM conditional surprisal (CCNet/KenLM perplexity filter,
      // bit-length integer log2) + novel-bigram occurrence count
      CorpusSignals.surprisalStats(docs(s, d), "doc_id", "text")),

    "q_dsir_score" -> ((s, d) =>
      // DSIR hashed-bigram importance vs the src0 target domain: integer
      // log-likelihood-ratio weights over 512 feature buckets
      CorpusSignals.importanceScore(docs(s, d), "doc_id", "text",
        col("source") === "src0", buckets = 512)),

    "q_lm_cross_score" -> ((s, d) => {
      // the CCNet split: LM fit on the single-digit sources (src0..src9,
      // the "clean reference"), the double-digit half scored against it;
      // unseen bigrams take the smoothed max surprisal and are counted
      val d0 = docs(s, d)
      CorpusSignals.crossSurprisal(
        d0.filter(length(col("source")) === 4), "text",
        d0.filter(length(col("source")) === 5), "doc_id", "text")
    }),

    "q_dsir_resample" -> ((s, d) =>
      // DSIR's second half: accept ∝ 2^score via bit shifts on the base
      // rate (the scores ARE log2 ratios) against the salted md5 coin
      CorpusSignals.importanceResample(
        CorpusSignals.importanceScore(docs(s, d), "doc_id", "text",
          col("source") === "src0", buckets = 512),
        "id", "dsir_score", basePpm = 250000L)),

    "q_nb_train" -> ((s, d) =>
      // supervised multinomial Naive-Bayes (the fastText-style classifier
      // stage): language-ID model trained on the even-doc_id half with
      // lang labels — dense 5-label x 512-bucket integer weight table
      CorpusSignals.trainNbModel(
        docs(s, d).filter(col("doc_id") % 2 === 0),
        "doc_id", "text", "lang", buckets = 512)),

    "q_nb_classify" -> ((s, d) => {
      // the inference half: classify the held-out odd-doc_id split with
      // the frozen even-split model — argmax label, ties to the
      // lexicographically greatest label
      val d0 = docs(s, d)
      CorpusSignals.classifyNb(
        CorpusSignals.trainNbModel(d0.filter(col("doc_id") % 2 === 0),
          "doc_id", "text", "lang", buckets = 512),
        d0.filter(col("doc_id") % 2 === 1), "doc_id", "text", buckets = 512)
    }),

    "q_url_parse" -> ((s, d) =>
      // C4-style URL normalization: case folding, fragment + default-port
      // + tracking-param stripping, registrable-domain heuristic — checked
      // against an analytic oracle on the synthesized URL corpus
      UrlCuration.parseUrls(
        docs(s, d).select(col("doc_id"), synthUrl(col("doc_id")).as("url")),
        "doc_id", "url")),

    "q_url_curate" -> ((s, d) => {
      // the composed URL gate: parse -> drop invalid -> blocklist
      // anti-join -> deterministic 15-per-domain cap
      import s.implicits._
      UrlCuration.curate(
        docs(s, d).select(col("doc_id"), synthUrl(col("doc_id")).as("url")),
        "doc_id", "url", Seq("spam.click").toDF("domain"), perDomainCap = 15)
    }),

    "q_bpe_merges" -> ((s, d) =>
      // BPE vocabulary training on the word-frequency table: 8 exact
      // merge rounds, ties broken on the pair string (model memoized per
      // dir — the three q_bpe_* queries are facets of one training run)
      bpeModel(s, d).merges),

    "q_bpe_vocab" -> ((s, d) =>
      // the segmented word table after those same 8 merges
      bpeModel(s, d).vocab),

    "q_bpe_encode" -> ((s, d) =>
      // corpus tokenization with the learned tokenizer: per-doc word and
      // BPE-token counts via the segmented-vocab lookup join
      Bpe.encode(docs(s, d), "doc_id", "text", bpeModel(s, d).vocab)),

    "q_bpe_fertility" -> ((s, d) =>
      // tokenizer FERTILITY by source (BPE tokens per word, ppm) — the
      // acceptance read for "does this tokenizer suit this source mix";
      // per-doc encode rolled up source-cardinality
      Bpe.encode(docs(s, d), "doc_id", "text", bpeModel(s, d).vocab)
        .join(docs(s, d).select(col("doc_id").as("id"), col("source")), Seq("id"))
        .groupBy("source")
        .agg(sum("n_words").as("n_words"), sum("n_bpe_tokens").as("n_bpe_tokens"))
        .withColumn("fertility_ppm",
          expr("(n_bpe_tokens * 1000000) div n_words"))),

    "q_pipeline_v3" -> ((s, d) => {
      // the model-based selection chain composed end-to-end: quality gate →
      // bigram-LM surprisal band (CCNet's perplexity band: drop BOTH tails)
      // → DSIR positive selection vs the src0 target (target sample itself
      // excluded) → exact dedup (keep-min). One oracle checks the chain
      val d0 = docs(s, d)
      val surp = CorpusSignals.surprisalStats(d0, "doc_id", "text")
        .select(col("id").as("doc_id"), col("mean_surprisal_ppm"))
      val imp = CorpusSignals.importanceScore(d0, "doc_id", "text",
          col("source") === "src0", buckets = 512)
        .select(col("id").as("doc_id"), col("is_target"), col("dsir_score"))
      val band = d0
        .filter(TextAnalysis.qualityScore(col("text")) >= 0.4)
        .join(surp, "doc_id").join(imp, "doc_id")
        .filter(col("mean_surprisal_ppm").between(4400000L, 4650000L))
        .filter(!col("is_target") && col("dsir_score") >= 1)
      val keep = Dedup.exactDedup(band, "doc_id", "text")
        .select(col("keep_id").as("doc_id"))
      band.join(keep, Seq("doc_id"))
        .select(col("doc_id"), col("mean_surprisal_ppm"), col("dsir_score"),
          TextAnalysis.tokenCount(col("text")).cast("long").as("tok_ws"))
    }),

    "q_boilerplate" -> ((s, d) =>
      // duplicated-span fraction: share of each doc's distinct 3-grams
      // appearing in >= 2 documents (RefinedWeb-style boilerplate signal)
      CorpusSignals.boilerplateStats(docs(s, d), "doc_id", "text")),

    "q_search_topk" -> ((s, d) =>
      // inverse-df weighted term search, global top-15 via bounded top-k
      // (TakeOrderedAndProject) — never a full sort
      Search.searchTopK(docs(s, d), "doc_id", "text",
        Seq("dup", "vector", "slow"), k = 15)),

    "q_search_bm25" -> ((s, d) =>
      // Okapi BM25 (k1=1.2, b=0.75 as exact rationals): tf saturation +
      // doc-length normalization over the inverse-df weights, all-integer
      // scoring, global top-15 via TakeOrdered
      Search.bm25TopK(docs(s, d), "doc_id", "text",
        Seq("dup", "vector", "slow"), k = 15)),

    "q_postings" -> ((s, d) =>
      // capped inverted index (df, tf, first-8 posting head per token),
      // flattened to one row per (token, rank) for the hash compare
      Search.buildPostings(docs(s, d), "doc_id", "text", cap = 8)
        .select(col("token"), col("df"), col("tf"),
          posexplode(col("head_ids")).as(Seq("rank", "head_id")))
        .withColumn("rank", col("rank").cast("long"))),

    "q_postings_incr" -> ((s, d) => {
      // nightly index refresh: 3/4 of the corpus indexed, the last quarter
      // folded in via one token-keyed merge — the result must equal the
      // full rebuild bit-for-bit (same oracle as q_postings)
      val dd = docs(s, d)
      Search.updatePostings(
          Search.buildPostings(dd.filter(col("doc_id") % 4 =!= 0), "doc_id", "text"),
          dd.filter(col("doc_id") % 4 === 0), "doc_id", "text")
        .select(col("token"), col("df"), col("tf"),
          posexplode(col("head_ids")).as(Seq("rank", "head_id")))
        .withColumn("rank", col("rank").cast("long"))
    }),

    "q_embed_stats" -> ((s, d) =>
      // embedding QC per label: count, dim, quantized-norm² range/mean —
      // the degenerate-embedding detector (all-zero / exploded vectors show
      // up as norm outliers). Integer norms ⇒ exact sums on both engines
      embs(s, d)
        .select(col("label"),
          size(col("embedding")).cast("long").as("dim"),
          Similarity.dotLong(Similarity.quantize(col("embedding")),
            Similarity.quantize(col("embedding"))).as("n2"))
        .groupBy("label")
        .agg(count(lit(1)).as("n_vecs"), max(col("dim")).as("dim"),
          min(col("n2")).as("min_norm2"), max(col("n2")).as("max_norm2"),
          round(avg(col("n2")), 6).as("avg_norm2"))),

    "q_split_assign" -> ((s, d) =>
      // deterministic 90/5/5 train/val/test assignment by salted-id hash
      DataMix.assignSplits(docs(s, d), "doc_id",
          Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05))
        .select(col("doc_id"), col("source"), col("split"))),

    "q_semantic_dedup" -> ((s, d) =>
      // SemDeDup on the PRODUCTION path (r13): SRP-LSH candidates with the
      // auto-sized depth + exact confirm → connected components → min-id
      // survivors. The oracle reproduces the sizing rule + hyperplanes, so
      // the labeling is hash-checked without an O(n²) pair slice (the old
      // exact-slice gate measured a ~1.7-exponent oracle artifact, not the
      // operator; LSH recall vs exact is graded by q_sim_lsh_recall)
      Clustering.semanticDedup(embs(s, d), "vec_id", "embedding",
        threshold = 0.4)),

    "q_hybrid_dedup" -> ((s, d) =>
      // lexical ∪ semantic pair graphs → ONE component labeling; clusters
      // may chain across signals. Both legs on their production paths
      // (recall-floored banding / auto-depth SRP) — r13, same rationale
      // as q_semantic_dedup
      Clustering.hybridDedup(docs(s, d), "doc_id", "text",
        embs(s, d), "vec_id", "embedding",
        cosineThreshold = 0.4)),

    "q_seq_pack" -> ((s, d) =>
      // token-budget sequence packing (greedy within hash buckets),
      // flattened to one row per packed doc for the hash compare
      SequencePacking.packGreedy(
          docs(s, d).withColumn("tok", TextAnalysis.tokenCount(col("text")).cast("long")),
          "doc_id", "tok", budget = 512, buckets = 8)
        .select(col("seq_id"), explode(col("doc_ids")).as("doc_id"),
          col("n_docs"), col("n_tokens"))),

    "q_corpus_stats" -> ((s, d) =>
      // per-source corpus report: doc/token counts + exact token median —
      // the mixture-design summary a curation run ends with. Partial+final
      // agg; integer-exact everywhere (no FP-order-dependent sums)
      docs(s, d)
        .select(col("source"), TextAnalysis.tokenCount(col("text")).cast("long").as("t"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum(col("t")).as("total_tokens"),
          min(col("t")).as("min_tokens"), max(col("t")).as("max_tokens"),
          round(expr("percentile(t, 0.5)"), 6).as("median_tokens"))),

    "q_data_mix" -> ((s, d) =>
      // domain-weighted mixture: upsample src0 2.5x, keep src1, halve src2,
      // quarter everything else — weights chosen FP-exact (w*1e6 integral)
      DataMix.mixByDomain(docs(s, d), "doc_id", "source",
        Map("src0" -> 2.5, "src1" -> 1.0, "src2" -> 0.5), defaultWeight = 0.25)
        .select(col("doc_id"), col("source"), col("copy_idx"))),

    "q_decontaminate" -> ((s, d) => {
      // benchmark = every 50th doc (deterministic eval-set stand-in);
      // corpus = the rest; 3-gram collision check
      val all = docs(s, d)
      Contamination.contamination(
        all.filter(col("doc_id") % 50 =!= 0), "doc_id", "text",
        all.filter(col("doc_id") % 50 === 0), "text", ngram = 3)
    }),

    "q_sim_topk" -> ((s, d) => {
      val e = embs(s, d)
      Similarity.bruteForceTopK(e, e.filter(col("vec_id") < 10), "vec_id", "embedding", 5)
    }),

    "q_cluster_terms" -> ((s, d) => {
      // embedding-cluster topic labeling: every vector tags its nearest
      // centroid map-side (plan-time centroid literals — zero joins for
      // the assignment), clusters join their documents' tokens, and each
      // cluster reports its top-3 terms. The ranking window runs over the
      // AGGREGATED (cluster, token) matrix (≤ clusters × vocab rows),
      // never over tokens
      val e = embs(s, d)
      val cents = e.filter(col("vec_id") < 8)
        .select(col("vec_id").as("cid"), col("embedding"))
      val assign = Similarity.classifyByCentroids(
        e, "vec_id", "embedding", cents, "cid", "embedding")
      val toks = docs(s, d).select(col("doc_id"),
        explode(TextAnalysis.tokens(col("text"))).as("token"))
      val counts = assign.select(col("vec_id").as("doc_id"), col("cid"))
        .join(toks, Seq("doc_id"))
        .groupBy("cid", "token").agg(count(lit(1)).as("n"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("cid")).orderBy(col("n").desc, col("token"))
      counts.withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 3)
        .select(col("cid"), col("rank"), col("token"), col("n"))
    }),

    "q_margin_mine" -> ((s, d) => {
      // margin-based cross-corpus pair mining (the bitext ratio): even-id
      // vectors vs odd-id vectors, each pair's cosine against the MEAN of
      // both sides' top-4 neighborhoods — pairs standing ≥ 4% above both
      // neighborhoods survive. Candidates come from the SCALE path: SRP-LSH
      // bucket co-occurrence (never a cross join); the oracle replays the
      // same deterministic hyperplanes, so the blocked candidate set — and
      // therefore the blocked-neighborhood margin — is exactly reproduced
      val e = embs(s, d)
      Similarity.marginPairs(
        Similarity.lshCosCandidates(e.filter(col("vec_id") % 2 === 0),
          e.filter(col("vec_id") % 2 === 1), "vec_id", "embedding",
          dims = 64, tables = 8),
        k = 4, thresholdPpm = 1040000L)
    }),

    "q_sim_lsh_topk" -> ((s, d) => {
      // approximate recall vs the exact sibling BY DESIGN, but exactly
      // reproducible: the oracle inlines the deterministic hyperplanes and
      // derives the same candidate set — hash-checked
      val e = embs(s, d)
      Similarity.lshTopK(e, e.filter(col("vec_id") < 50), "vec_id", "embedding", 5, dims = 64, planes = 4)
    }),

    "q_sim_lsh_recall" -> ((s, d) => {
      // ANN acceptance metric: per-query recall of the LSH ranking against
      // the exact ground truth, integer ppm — both sides run their normal
      // scale paths and the metric itself is oracle-checked
      val e = embs(s, d)
      Similarity.lshRecall(e, e.filter(col("vec_id") < 50), "vec_id", "embedding",
        k = 5, dims = 64, planes = 4)
    }),

    "q_sim_prefix_recall" -> ((s, d) => {
      // matryoshka eval: top-5 on the FIRST 16 of 64 dims vs full-dim
      // truth — 4× cheaper serving, and this row says what recall it buys;
      // both rankings deterministic so the metric is oracle-exact
      val e = embs(s, d)
      Similarity.prefixDimRecall(e, e.filter(col("vec_id") < 50),
        "vec_id", "embedding", k = 5, prefixDims = 16)
    }),

    "q_sim_ivf_recall" -> ((s, d) => {
      // the same acceptance metric for the IVF family: per-query recall of
      // the cell-probe ranking vs exact truth — deterministic end to end,
      // so unlike LSH the ranking AND the metric are both oracle-exact
      val e = embs(s, d)
      Similarity.ivfRecall(e, e.filter(col("vec_id") < 50), "vec_id", "embedding",
        k = 5, nClusters = 16, nProbe = 4)
    }),

    "q_classify_embed" -> ((s, d) => {
      // nearest-centroid domain tagging: 8 labeled centroids inlined as
      // literals, one codegen'd pass over the corpus — no join, no window
      val e = embs(s, d)
      Similarity.classifyByCentroids(e, "vec_id", "embedding",
        e.filter(col("vec_id") < 8), "vec_id", "embedding")
    }),

    "q_sim_ivf_topk" -> ((s, d) => {
      // IVF cell-probe ANN — deterministic centroids/assignment, so unlike
      // LSH this approximate path IS oracle-checked
      val e = embs(s, d)
      Similarity.ivfTopK(e, e.filter(col("vec_id") < 50), "vec_id", "embedding",
        k = 5, nClusters = 16, nProbe = 4)
    }),

    "q_sim_pq_topk" -> ((s, d) => {
      // product-quantization ADC: 8 subspaces × 16 seed centroids, corpus
      // compressed to 8 codes/vector, queries ranked by m lookup-table
      // reads per candidate — deterministic integer arithmetic end to end
      val e = embs(s, d)
      Similarity.pqTopK(e, e.filter(col("vec_id") < 50), "vec_id", "embedding",
        k = 5, m = 8, ksub = 16)
    }),

    "q_sim_pq_recall" -> ((s, d) => {
      // the PQ family's acceptance row: per-query recall of the ADC
      // ranking vs exact truth, integer ppm
      val e = embs(s, d)
      Similarity.pqRecall(e, e.filter(col("vec_id") < 50), "vec_id", "embedding",
        k = 5, m = 8, ksub = 16)
    }),

    "q_sim_ivfpq_topk" -> ((s, d) => {
      // IVF-PQ (the FAISS production composition): coarse cell probe
      // prunes candidates, ADC codes rank them — cell + codes computed in
      // ONE map-side pass, probes broadcast with their LUTs
      val e = embs(s, d)
      Similarity.ivfPqTopK(e, e.filter(col("vec_id") < 50), "vec_id", "embedding",
        k = 5, nClusters = 16, nProbe = 4, m = 8, ksub = 16)
    }),

    "q_sim_ivfpq_res_topk" -> ((s, d) => {
      // residual IVF-PQ (IVFADC): codes quantize x − centroid(cell); the
      // residual is algebraically folded into per-cell literal constants,
      // so the corpus pass stays one codegen'd projection
      val e = embs(s, d)
      Similarity.ivfPqResidualTopK(e, e.filter(col("vec_id") < 50), "vec_id",
        "embedding", k = 5, nClusters = 16, nProbe = 4, m = 8, ksub = 16)
    }),

    "q_sim_ivfpq_res_recall" -> ((s, d) => {
      // the acceptance row that prices residual quantization against the
      // plain-vector codes of q_sim_ivfpq_recall
      val e = embs(s, d)
      Similarity.ivfPqResidualRecall(e, e.filter(col("vec_id") < 50), "vec_id",
        "embedding", k = 5, nClusters = 16, nProbe = 4, m = 8, ksub = 16)
    }),

    "q_quality_strata" -> ((s, d) =>
      // curriculum view: corpus-relative quality deciles with exact
      // integer per-stratum stats; bounds one bounded percentile collect
      CorpusSignals.qualityStrata(docs(s, d), "doc_id", "text")),

    "q_hard_negatives" -> ((s, d) => {
      // contrastive-training negatives: each query's 5 most similar
      // DIFFERENT-label vectors — wrong-label candidates filtered in the
      // join predicate, never ranked
      val e = embs(s, d)
      Similarity.hardNegatives(e, e.filter(col("vec_id") < 50), "vec_id",
        "embedding", "label", k = 5)
    }),

    "q_knn_eval" -> ((s, d) => {
      // embedding-quality acceptance: kNN majority-vote label recovery
      // (self excluded, vote ties to the smaller label)
      val e = embs(s, d)
      Similarity.knnClassify(e, e.filter(col("vec_id") < 50), "vec_id",
        "embedding", "label", k = 5)
    }),

    "q_sim_ivf_stats" -> ((s, d) => {
      // the IVF maintenance row: per-cell posting counts + corpus share
      // ppm — the imbalance report that triggers index re-training
      val e = embs(s, d)
      Similarity.ivfCellStats(
        Similarity.buildIvfIndex(e, "vec_id", "embedding", nClusters = 16))
    }),

    "q_sim_ivfpq_recall" -> ((s, d) => {
      // acceptance row for the composed index: what the double
      // approximation (cell pruning + code quantization) costs in recall
      val e = embs(s, d)
      Similarity.ivfPqRecall(e, e.filter(col("vec_id") < 50), "vec_id", "embedding",
        k = 5, nClusters = 16, nProbe = 4, m = 8, ksub = 16)
    }),

    "q_sim_ivf_persisted" -> ((s, d) => {
      // the ANN nightly-build/query-time boundary: build the IVF index,
      // write centroids + inverted lists to parquet, read them back, and
      // answer through the read-back artifacts ONLY — identical ranking
      // to the inline path, so the oracle is the same derivation
      val e = embs(s, d)
      val tmp = java.nio.file.Files.createTempDirectory("graft_ivf_idx_").toString
      Similarity.writeIvfIndex(
        Similarity.buildIvfIndex(e, "vec_id", "embedding", nClusters = 16),
        tmp, Map("nClusters" -> 16L, "lloydIters" -> 0L))
      val idx = Similarity.readIvfIndex(s, tmp)
      Similarity.ivfTopKIndexed(idx, e.filter(col("vec_id") < 50),
        "vec_id", "embedding", k = 5, nProbe = 4)
    }),

    "q_sim_ivf_lloyd" -> ((s, d) => {
      // one k-means (Lloyd) refinement round — exact integer arithmetic
      // (truncated integer cell means), so the refined path is oracle-checked
      // just like the seed path
      val e = embs(s, d)
      Similarity.ivfTopK(e, e.filter(col("vec_id") < 50), "vec_id", "embedding",
        k = 5, nClusters = 16, nProbe = 4, lloydIters = 1)
    }),

    "q_pipeline_e2e" -> ((s, d) =>
      // the composite curation pipeline: lang filter → quality filter →
      // exact dedup (window, single shuffle) → token stats
      TrainingPipeline.curate(docs(s, d), "doc_id", "text")),

    "q_multimodal_frames" -> ((s, d) => {
      // frame-sampling plumbing: offsets/lengths are oracle-checked; the
      // byte slices themselves are pinned by MultimodalSpec
      val media = Multimodal.packFromText(docs(s, d), "doc_id", "text", "video")
      Multimodal.sampleFrames(media, k = 4)
        .select(col("media_id"), col("frame_idx"), col("frame_offset"), col("frame_len"))
    }),

    "q_multimodal_stats" -> ((s, d) => {
      val media = Multimodal.packFromText(docs(s, d), "doc_id", "text", "image")
      val feats = Multimodal.extractFeatures(media)
      feats.select(
        col("media_id"), col("kind"),
        element_at(col("features"), 1).cast("long").as("n_bytes"),
        round(element_at(col("features"), 2), 6).as("mean_byte"),
        element_at(col("features"), 5).cast("long").as("first_byte"),
        element_at(col("features"), 6).cast("long").as("last_byte"))
    })
  )

  // ---------------- oracles ----------------

  // DuckDB fragments mirroring the Spark expressions exactly.
  private val toks = "regexp_split_to_array(trim(text), '\\s+')"

  /** The q_url_* oracles' analytic derivation of [[synthUrl]]'s expected
    * parse — same per-doc_id formulas, never the operator's regexes. */
  private val urlDerived =
    """b AS (SELECT doc_id AS id,
      |    NOT (doc_id % 29 = 0 OR doc_id % 23 = 0) AS valid,
      |    (doc_id % 3 = 0) AS https, CAST(doc_id % 7 AS INT) AS hi,
      |    doc_id % 4 AS pm, doc_id % 5 AS fm, doc_id % 2 AS qm,
      |    doc_id % 50 AS pn, doc_id % 10 AS qn
      |  FROM documents),
      |u AS (SELECT id, valid,
      |    CASE WHEN https THEN 'https' ELSE 'http' END AS scheme,
      |    (['news.example.com','example.com','blog.example.co.uk',
      |      'cdn.assets.example.org','192.168.0.1','spam.click',
      |      'shop.example.com'])[hi + 1] AS host,
      |    (['example.com','example.com','example.co.uk','example.org',
      |      '192.168.0.1','spam.click','example.com'])[hi + 1] AS reg_domain,
      |    CAST(CASE WHEN pm = 0 AND NOT https THEN 443
      |              WHEN pm = 1 THEN 8080 END AS BIGINT) AS port,
      |    CASE WHEN fm = 4 THEN '/' ELSE '/p/' || pn END AS path,
      |    CASE WHEN qm = 0 THEN 'q=' || qn ELSE '' END AS query_clean
      |  FROM b),
      |cu AS (SELECT *, scheme || '://' || host ||
      |    (CASE WHEN port IS NULL THEN '' ELSE ':' || port END) || path ||
      |    (CASE WHEN query_clean = '' THEN '' ELSE '?' || query_clean END)
      |    AS clean_url
      |  FROM u)""".stripMargin
  private def duckStop(lang: String): String = {
    val list = Map(
      "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "for"),
      "es" -> Seq("el", "la", "de", "y", "que", "los", "en", "un", "una", "es"),
      "de" -> Seq("der", "die", "das", "und", "ist", "ein", "eine", "zu", "den", "von"),
      "fr" -> Seq("le", "la", "de", "et", "est", "les", "un", "une", "des", "que")
    )(lang).map(w => s"'$w'").mkString(", ")
    s"len(list_filter($toks, x -> list_contains([$list], x)))"
  }

  private val duckShingles3 =
    s"list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] for i in range(1, len(w) - 1)])"

  private val duckShingleHashes =
    s"list_transform(s, g -> ${duckMd5Long("g")} % $P)"

  /** q_dedup_minhash_eval's oracle: the 64 MinHash permutations and 32
    * packed bands reproduced literally (the [[graft.pipeline.Hashing]]
    * perm constants inlined), candidates = pairs sharing ANY band, truth =
    * brute-force Jaccard ≥ 0.5. */
  private val minhashEvalOracle: String = {
    val bands = 32
    def mh(i: Int) =
      s"list_min(list_transform(h, x -> (${Hashing.permA(i)} * x + ${Hashing.permB(i)}) % $P))"
    val bhCols = (0 until bands)
      .map(b => s"${mh(2 * b)} * $P + ${mh(2 * b + 1)} AS bh$b").mkString(",\n    ")
    val orClause = (0 until bands).map(b => s"a.bh$b = b.bh$b").mkString(" OR ")
    s"""WITH t AS (SELECT doc_id, $toks AS w FROM documents WHERE doc_id < 1000),
       |g AS (SELECT doc_id, $duckShingles3 AS s FROM t),
       |hl AS (SELECT doc_id, s, $duckShingleHashes AS h FROM g),
       |sig AS (SELECT doc_id, s,
       |    $bhCols
       |  FROM hl),
       |jac AS (SELECT a.doc_id AS id_1, b.doc_id AS id_2,
       |    len(list_intersect(a.s, b.s)) * 1.0 /
       |      (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) AS j,
       |    ($orClause) AS cand
       |  FROM sig a JOIN sig b ON a.doc_id < b.doc_id
       |  WHERE len(a.s) > 0 AND len(b.s) > 0)
       |SELECT CAST(count(*) FILTER (WHERE j >= 0.5) AS BIGINT) AS n_truth,
       |  CAST(count(*) FILTER (WHERE cand) AS BIGINT) AS n_candidates,
       |  CAST(count(*) FILTER (WHERE cand AND j >= 0.5) AS BIGINT) AS n_hits,
       |  count(*) FILTER (WHERE cand AND j >= 0.5) * 1000000
       |    // count(*) FILTER (WHERE cand) AS precision_ppm,
       |  count(*) FILTER (WHERE cand AND j >= 0.5) * 1000000
       |    // count(*) FILTER (WHERE j >= 0.5) AS recall_ppm
       |FROM jac""".stripMargin
  }

  /** The sweep variant of [[minhashEvalOracle]]: same signature/candidate
    * CTEs, Jaccard as an exact-ppm integer grain, one output row per θ via
    * a CROSS JOIN over the threshold list. */
  private val minhashEvalSweepOracle: String = {
    val bands = 32
    def mh(i: Int) =
      s"list_min(list_transform(h, x -> (${Hashing.permA(i)} * x + ${Hashing.permB(i)}) % $P))"
    val bhCols = (0 until bands)
      .map(b => s"${mh(2 * b)} * $P + ${mh(2 * b + 1)} AS bh$b").mkString(",\n    ")
    val orClause = (0 until bands).map(b => s"a.bh$b = b.bh$b").mkString(" OR ")
    s"""WITH t AS (SELECT doc_id, $toks AS w FROM documents WHERE doc_id < 1000),
       |g AS (SELECT doc_id, $duckShingles3 AS s FROM t),
       |hl AS (SELECT doc_id, s, $duckShingleHashes AS h FROM g),
       |sig AS (SELECT doc_id, s,
       |    $bhCols
       |  FROM hl),
       |jac AS (SELECT a.doc_id AS id_1, b.doc_id AS id_2,
       |    len(list_intersect(a.s, b.s)) * 1000000 //
       |      (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) AS jp,
       |    ($orClause) AS cand
       |  FROM sig a JOIN sig b ON a.doc_id < b.doc_id
       |  WHERE len(a.s) > 0 AND len(b.s) > 0),
       |th AS (SELECT unnest([300000, 500000, 700000]) AS theta_ppm)
       |SELECT CAST(th.theta_ppm AS BIGINT) AS theta_ppm,
       |  CAST(count(*) FILTER (WHERE jp >= th.theta_ppm) AS BIGINT) AS n_truth,
       |  CAST(count(*) FILTER (WHERE cand) AS BIGINT) AS n_candidates,
       |  CAST(count(*) FILTER (WHERE cand AND jp >= th.theta_ppm) AS BIGINT) AS n_hits,
       |  CASE WHEN count(*) FILTER (WHERE cand) = 0 THEN NULL
       |    ELSE CAST(count(*) FILTER (WHERE cand AND jp >= th.theta_ppm) * 1000000
       |      // count(*) FILTER (WHERE cand) AS BIGINT) END AS precision_ppm,
       |  CASE WHEN count(*) FILTER (WHERE jp >= th.theta_ppm) = 0 THEN NULL
       |    ELSE CAST(count(*) FILTER (WHERE cand AND jp >= th.theta_ppm) * 1000000
       |      // count(*) FILTER (WHERE jp >= th.theta_ppm) AS BIGINT) END AS recall_ppm
       |FROM jac CROSS JOIN th GROUP BY 1""".stripMargin
  }

  /** `k` unrolled BPE merge rounds as chained CTEs, independently
    * re-implementing [[pipeline.Bpe.train]]: per round, pair counts over
    * the current vocabulary (p), the (count DESC, pair ASC) winner (b),
    * and a per-word greedy left-to-right merge pass as a positional
    * recursive scan (m → v). The winning pair is joined into the
    * recursion's ANCHOR and carried in its state — referencing b inside
    * the recursive term would re-evaluate the whole CTE chain every
    * iteration. */
  /** One BPE model per corpus dir, shared by the three q_bpe_* queries —
    * they are facets of the SAME training run; without this a verify pass
    * trains the identical model three times. */
  private val bpeModels =
    new java.util.concurrent.ConcurrentHashMap[String, pipeline.Bpe.BpeModel]()
  private def bpeModel(s: SparkSession, d: String): pipeline.Bpe.BpeModel =
    // mergeBatch = 4 deliberately ON: the sequential DuckDB oracle then
    // hash-verifies the batcher's order-equivalence proof every round
    bpeModels.computeIfAbsent(d, _ =>
      Bpe.train(docs(s, d), "text", merges = 8, mergeBatch = 4))

  /** Shared PQ CTE chain: quantized vectors, sub-codebooks (subspace
    * slices of the 16 lowest-id vectors), per-(vector, subspace) argmin
    * codes, and per-query LUTs. Slices spelled with list_slice so the
    * subspace bounds can be computed from the unnested j. */
  private val pqCtes =
    """v AS (SELECT vec_id, list_transform(embedding::DOUBLE[], x -> CAST(round(x * 1000) AS BIGINT)) AS qv FROM embeddings),
      |cb AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cidx, qv AS cv
      |  FROM (SELECT vec_id, qv FROM v ORDER BY vec_id LIMIT 16)),
      |js AS (SELECT unnest(range(0, 8)) AS j),
      |costs AS (SELECT v.vec_id, js.j, cb.cidx,
      |    list_dot_product(list_slice(cb.cv, js.j*8+1, js.j*8+8), list_slice(cb.cv, js.j*8+1, js.j*8+8))
      |    - 2*list_dot_product(list_slice(v.qv, js.j*8+1, js.j*8+8), list_slice(cb.cv, js.j*8+1, js.j*8+8)) AS cost
      |  FROM v CROSS JOIN js CROSS JOIN cb),
      |codes AS (SELECT vec_id AS neighbor_id, j, cidx AS code FROM (
      |    SELECT *, row_number() OVER (PARTITION BY vec_id, j ORDER BY cost, cidx) AS rk
      |    FROM costs) WHERE rk = 1),
      |luts AS (SELECT v.vec_id AS query_id, js.j, cb.cidx,
      |    CAST(list_dot_product(list_slice(v.qv, js.j*8+1, js.j*8+8), list_slice(cb.cv, js.j*8+1, js.j*8+8)) AS BIGINT) AS lval
      |  FROM v CROSS JOIN js CROSS JOIN cb WHERE v.vec_id < 50)""".stripMargin

  /** The PQ/ADC top-5 derivation (q_sim_pq_topk), reused as the approx
    * ranking inside q_sim_pq_recall. */
  private val pqTopKOracle =
    s"""WITH $pqCtes
      |SELECT query_id, neighbor_id, approx_dot FROM (
      |  SELECT query_id, neighbor_id, CAST(sum(lval) AS BIGINT) AS approx_dot
      |  FROM codes JOIN luts ON codes.j = luts.j AND codes.code = luts.cidx
      |  WHERE neighbor_id <> query_id GROUP BY 1, 2)
      |QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY approx_dot DESC, neighbor_id) <= 5""".stripMargin

  /** IVF-PQ top-5 (q_sim_ivfpq_topk): the IVF home-cell/probe CTEs prune
    * the candidate space, the PQ code/LUT CTEs rank it by ADC. */
  private val ivfPqTopKOracle =
    s"""WITH $pqCtes,
      |c AS (SELECT vec_id AS cid, qv AS centroid FROM v ORDER BY vec_id LIMIT 16),
      |cells AS (SELECT vec_id AS neighbor_id, cid FROM (
      |  SELECT v.vec_id, c.cid,
      |         row_number() OVER (PARTITION BY v.vec_id ORDER BY list_dot_product(v.qv, c.centroid) DESC, c.cid ASC) AS rk
      |  FROM v CROSS JOIN c) WHERE rk = 1),
      |probes AS (SELECT vec_id AS query_id, cid FROM (
      |  SELECT v.vec_id, c.cid,
      |         row_number() OVER (PARTITION BY v.vec_id ORDER BY list_dot_product(v.qv, c.centroid) DESC, c.cid ASC) AS rk
      |  FROM v CROSS JOIN c WHERE v.vec_id < 50) WHERE rk <= 4)
      |SELECT query_id, neighbor_id, approx_dot FROM (
      |  SELECT p.query_id, cl.neighbor_id, CAST(sum(l.lval) AS BIGINT) AS approx_dot
      |  FROM probes p JOIN cells cl USING (cid)
      |  JOIN codes co ON co.neighbor_id = cl.neighbor_id
      |  JOIN luts l ON l.query_id = p.query_id AND l.j = co.j AND l.cidx = co.code
      |  WHERE cl.neighbor_id <> p.query_id GROUP BY 1, 2)
      |QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY approx_dot DESC, neighbor_id) <= 5""".stripMargin

  /** Residual IVF-PQ top-5 (q_sim_ivfpq_res_topk): home cells as in the
    * IVF oracles, residuals computed DIRECTLY (the SQL side has no reason
    * to fold them into constants), codebooks = subspace slices of the 16
    * lowest-id vectors' residuals, ADC = q·centroid(cell) + Σ LUT. */
  private val ivfPqResTopKOracle =
    """WITH v AS (SELECT vec_id, list_transform(embedding::DOUBLE[], x -> CAST(round(x * 1000) AS BIGINT)) AS qv FROM embeddings),
      |c AS (SELECT vec_id AS cid, qv AS centroid FROM v ORDER BY vec_id LIMIT 16),
      |cells AS (SELECT vec_id, cid FROM (
      |  SELECT v.vec_id, c.cid,
      |         row_number() OVER (PARTITION BY v.vec_id ORDER BY list_dot_product(v.qv, c.centroid) DESC, c.cid ASC) AS rk
      |  FROM v CROSS JOIN c) WHERE rk = 1),
      |res AS (SELECT v.vec_id, v.qv,
      |    list_transform(range(1, len(v.qv) + 1), i -> v.qv[i] - cc.centroid[i]) AS r
      |  FROM v JOIN cells cl ON cl.vec_id = v.vec_id JOIN c cc ON cc.cid = cl.cid),
      |cb AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cidx, r AS cv
      |  FROM (SELECT vec_id, r FROM res ORDER BY vec_id LIMIT 16 OFFSET 16)),
      |js AS (SELECT unnest(range(0, 8)) AS j),
      |costs AS (SELECT res.vec_id, js.j, cb.cidx,
      |    list_dot_product(list_slice(cb.cv, js.j*8+1, js.j*8+8), list_slice(cb.cv, js.j*8+1, js.j*8+8))
      |    - 2*list_dot_product(list_slice(res.r, js.j*8+1, js.j*8+8), list_slice(cb.cv, js.j*8+1, js.j*8+8)) AS cost
      |  FROM res CROSS JOIN js CROSS JOIN cb),
      |codes AS (SELECT vec_id AS neighbor_id, j, cidx AS code FROM (
      |    SELECT *, row_number() OVER (PARTITION BY vec_id, j ORDER BY cost, cidx) AS rk
      |    FROM costs) WHERE rk = 1),
      |probes AS (SELECT vec_id AS query_id, cid, base FROM (
      |  SELECT v.vec_id, c.cid,
      |         CAST(list_dot_product(v.qv, c.centroid) AS BIGINT) AS base,
      |         row_number() OVER (PARTITION BY v.vec_id ORDER BY list_dot_product(v.qv, c.centroid) DESC, c.cid ASC) AS rk
      |  FROM v CROSS JOIN c WHERE v.vec_id < 50) WHERE rk <= 4),
      |luts AS (SELECT v.vec_id AS query_id, js.j, cb.cidx,
      |    CAST(list_dot_product(list_slice(v.qv, js.j*8+1, js.j*8+8), list_slice(cb.cv, js.j*8+1, js.j*8+8)) AS BIGINT) AS lval
      |  FROM v CROSS JOIN js CROSS JOIN cb WHERE v.vec_id < 50)
      |SELECT query_id, neighbor_id, approx_dot FROM (
      |  SELECT p.query_id, cl.vec_id AS neighbor_id,
      |    p.base + CAST(sum(l.lval) AS BIGINT) AS approx_dot
      |  FROM probes p JOIN cells cl USING (cid)
      |  JOIN codes co ON co.neighbor_id = cl.vec_id
      |  JOIN luts l ON l.query_id = p.query_id AND l.j = co.j AND l.cidx = co.code
      |  WHERE cl.vec_id <> p.query_id GROUP BY 1, 2, p.base)
      |QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY approx_dot DESC, neighbor_id) <= 5""".stripMargin

  private def bpeOracle(k: Int, select: String): String = {
    val rounds = (1 to k).map { r =>
      val prev = s"v${r - 1}"
      s"""p$r AS (SELECT p, CAST(sum(wc) AS BIGINT) AS pc FROM (
         |    SELECT wc, unnest(list_transform(range(1, len(s)),
         |      i -> s[i] || ' ' || s[i+1])) AS p FROM $prev) GROUP BY 1),
         |b$r AS (SELECT p, pc FROM p$r ORDER BY pc DESC, p LIMIT 1),
         |m$r AS (SELECT word, wc, s, 1 AS pos, []::VARCHAR[] AS acc,
         |    split_part(b$r.p, ' ', 1) AS bl, split_part(b$r.p, ' ', 2) AS br
         |  FROM $prev LEFT JOIN b$r ON true
         |  UNION ALL
         |  SELECT word, wc, s,
         |    CASE WHEN pos < len(s) AND s[pos] = bl AND s[pos+1] = br
         |         THEN pos + 2 ELSE pos + 1 END,
         |    CASE WHEN pos < len(s) AND s[pos] = bl AND s[pos+1] = br
         |         THEN list_append(acc, bl || br) ELSE list_append(acc, s[pos]) END,
         |    bl, br
         |  FROM m$r WHERE pos <= len(s)),
         |v$r AS (SELECT word, wc, acc AS s FROM m$r WHERE pos = len(s) + 1)""".stripMargin
    }.mkString(",\n")
    s"""WITH RECURSIVE v0 AS (
       |  SELECT word, CAST(count(*) AS BIGINT) AS wc,
       |    regexp_split_to_array(word, '') AS s
       |  FROM (SELECT unnest($toks) AS word FROM documents)
       |  WHERE word <> '' GROUP BY word),
       |$rounds
       |$select""".stripMargin
  }

  /** The quantized-vector CTE shared by every embedding oracle. */
  private val qvCte =
    "SELECT vec_id, list_transform(embedding::DOUBLE[], x -> CAST(round(x * 1000) AS BIGINT)) AS qv FROM embeddings"

  /** SRP bucket table as SQL: one row per (vector, hash table) with the
    * packed sign-bit bucket — the SAME deterministic md5-derived hyperplanes
    * as [[Similarity.srpBuckets]], inlined as integer-array literals, so the
    * "approximate" LSH paths are exactly reproducible by the oracle (the
    * planes are data-independent; only the CANDIDATE set depends on them,
    * and both engines derive it from identical integer dot-product signs —
    * magnitudes ≤ 64·500·|qv| ≪ 2^53, exact in DuckDB's double). */
  private def srpBucketsSql(tables: Int, planes: Int, dims: Int): String =
    (0 until tables).map { t =>
      val bits = (0 until planes).map { p =>
        val w = Similarity.planeWeights(t, p, dims).mkString("[", ", ", "]")
        s"(CASE WHEN list_dot_product(qv, $w) > 0 THEN ${1L << p} ELSE 0 END)"
      }.mkString(" + ")
      s"SELECT vec_id, $t AS tbl, $bits AS bkt FROM v"
    }.mkString("\nUNION ALL ")

  /** [[Similarity.srpPlanesFor]] as a one-row CTE body: the SAME integer
    * arithmetic (`ceil(log2(ceil(n/target)))` via the bit length of m−1 —
    * both engines avoid float log2 entirely) over the corpus count, so the
    * AUTO-sized LSH depth is replicated bit-exactly at ANY scale factor the
    * oracle runs at, not pinned to one dataset's count. */
  private def srpPlanesSql(table: String, targetPerBucket: Long = 64L): String =
    s"""SELECT least(20, greatest(2,
       |    CASE WHEN m <= 1 THEN 0 ELSE len(bin(m - 1)) END)) AS planes
       |  FROM (SELECT (count(*) + ${targetPerBucket - 1}) // $targetPerBucket AS m FROM $table)""".stripMargin

  /** [[srpBucketsSql]] for the AUTO-sized depth: every plane up to the
    * clamp maximum (20) is inlined and GATED on the one-row `pl` CTE
    * (`srpPlanesSql`), so one static SQL string reproduces the runtime
    * depth at any corpus size — plane p's weights are a function of
    * (table, p, dims) only, independent of how many planes are active. */
  private def srpBucketsSqlAuto(tables: Int, dims: Int, maxPlanes: Int = 20): String =
    (0 until tables).map { t =>
      val bits = (0 until maxPlanes).map { p =>
        val w = Similarity.planeWeights(t, p, dims).mkString("[", ", ", "]")
        s"(CASE WHEN $p < pl.planes AND list_dot_product(qv, $w) > 0 THEN ${1L << p} ELSE 0 END)"
      }.mkString(" + ")
      s"SELECT vec_id, $t AS tbl, $bits AS bkt FROM v, pl"
    }.mkString("\nUNION ALL ")

  def oracleSql: Map[String, String] = Map(
    // the SRP-LSH default path, exactly reproduced: the AUTO-sized depth
    // (planes from the corpus count, integer-exact on both engines) +
    // identical inlined hyperplanes → identical candidate set → exact
    // confirm — the oracle replicates the SIZING RULE, not one dataset's
    // plane constant
    "q_dedup_embed" ->
      s"""WITH v AS ($qvCte),
         |pl AS (${srpPlanesSql("embeddings")}),
         |bk AS (${srpBucketsSqlAuto(16, 64)}),
         |cand AS (SELECT DISTINCT a.vec_id AS id_1, b.vec_id AS id_2
         |  FROM bk a JOIN bk b ON a.tbl = b.tbl AND a.bkt = b.bkt AND a.vec_id < b.vec_id),
         |p AS (SELECT id_1, id_2,
         |    CAST(list_dot_product(va.qv, vb.qv) AS BIGINT) AS dot,
         |    list_dot_product(va.qv, vb.qv) /
         |      (sqrt(list_dot_product(va.qv, va.qv)) * sqrt(list_dot_product(vb.qv, vb.qv))) AS cos
         |  FROM cand JOIN v va ON va.vec_id = cand.id_1 JOIN v vb ON vb.vec_id = cand.id_2)
         |SELECT id_1, id_2, dot, round(cos, 6) AS cosine FROM p WHERE cos >= 0.4""".stripMargin,

    // the SRP-LSH-candidate cosine pair graph (production path, sizing
    // rule + hyperplanes replicated), then three unrolled synchronous LPA
    // rounds (count DESC, label min-tie) — the q_graph_lpa recurrence on
    // embedding edges
    "q_embed_communities" -> {
      val rounds = (1 to 3).map { i =>
        s"""n$i AS (SELECT e.u AS node, l.label, CAST(count(*) AS BIGINT) AS c
           |  FROM ed e JOIN l${i - 1} l ON e.v = l.node GROUP BY 1, 2),
           |l$i AS (SELECT node, label FROM (
           |    SELECT node, label, row_number() OVER (PARTITION BY node
           |      ORDER BY c DESC, label) AS rn FROM n$i) WHERE rn = 1)""".stripMargin
      }.mkString(",\n")
      s"""WITH v AS ($qvCte),
         |pl AS (${srpPlanesSql("embeddings")}),
         |bk AS (${srpBucketsSqlAuto(16, 64)}),
         |sc AS (SELECT DISTINCT a.vec_id AS id_1, b.vec_id AS id_2
         |  FROM bk a JOIN bk b ON a.tbl = b.tbl AND a.bkt = b.bkt AND a.vec_id < b.vec_id),
         |p AS (SELECT id_1, id_2
         |  FROM sc JOIN v va ON va.vec_id = sc.id_1 JOIN v vb ON vb.vec_id = sc.id_2
         |  WHERE list_dot_product(va.qv, vb.qv) /
         |    (sqrt(list_dot_product(va.qv, va.qv)) * sqrt(list_dot_product(vb.qv, vb.qv))) >= 0.4),
         |ed AS (SELECT id_1 AS u, id_2 AS v FROM p
         |  UNION ALL SELECT id_2 AS u, id_1 AS v FROM p),
         |l0 AS (SELECT DISTINCT u AS node, u AS label FROM ed),
         |$rounds
         |SELECT node, label AS community FROM l3""".stripMargin
    },

    "q_dedup_embed_lsh" ->
      s"""WITH v AS ($qvCte),
         |pl AS (${srpPlanesSql("embeddings")}),
         |bk AS (${srpBucketsSqlAuto(16, 64)}),
         |cand AS (SELECT DISTINCT a.vec_id AS id_1, b.vec_id AS id_2
         |  FROM bk a JOIN bk b ON a.tbl = b.tbl AND a.bkt = b.bkt AND a.vec_id < b.vec_id),
         |p AS (SELECT id_1, id_2,
         |    CAST(list_dot_product(va.qv, vb.qv) AS BIGINT) AS dot,
         |    list_dot_product(va.qv, vb.qv) /
         |      (sqrt(list_dot_product(va.qv, va.qv)) * sqrt(list_dot_product(vb.qv, vb.qv))) AS cos
         |  FROM cand JOIN v va ON va.vec_id = cand.id_1 JOIN v vb ON vb.vec_id = cand.id_2)
         |SELECT id_1, id_2, dot, round(cos, 6) AS cosine FROM p WHERE cos >= 0.4""".stripMargin,

    // exact top-5 truth vs the LSH top-5 (both reproduced from first
    // principles), counted per query
    "q_sim_lsh_recall" ->
      s"""WITH v AS ($qvCte),
         |ex AS (SELECT query_id, neighbor_id FROM (
         |    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |      CAST(list_dot_product(q.qv, c.qv) AS BIGINT) AS dot
         |    FROM v q JOIN v c ON q.vec_id < 50 AND c.vec_id <> q.vec_id)
         |  QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY dot DESC, neighbor_id) <= 5),
         |bk AS (${srpBucketsSql(8, 4, 64)}),
         |cand AS (SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
         |  FROM bk q JOIN bk c ON q.tbl = c.tbl AND q.bkt = c.bkt
         |  WHERE q.vec_id < 50 AND c.vec_id <> q.vec_id),
         |ap AS (SELECT query_id, neighbor_id FROM (
         |    SELECT cand.query_id, cand.neighbor_id,
         |      CAST(list_dot_product(vq.qv, vc.qv) AS BIGINT) AS dot
         |    FROM cand JOIN v vq ON vq.vec_id = cand.query_id
         |      JOIN v vc ON vc.vec_id = cand.neighbor_id)
         |  QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY dot DESC, neighbor_id) <= 5)
         |SELECT ex.query_id, CAST(count(*) AS BIGINT) AS n_exact,
         |  CAST(count(ap.neighbor_id) AS BIGINT) AS n_hit,
         |  CAST((count(ap.neighbor_id) * 1000000) // count(*) AS BIGINT) AS recall_ppm
         |FROM ex LEFT JOIN ap USING (query_id, neighbor_id) GROUP BY 1""".stripMargin,

    // lshTopK with 8 tables: bucket-co-occurrence candidates (query side
    // restricted to vec_id < 50), exact rank, top-5 per query
    "q_sim_lsh_topk" ->
      s"""WITH v AS ($qvCte),
         |bk AS (${srpBucketsSql(8, 4, 64)}),
         |cand AS (SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
         |  FROM bk q JOIN bk c ON q.tbl = c.tbl AND q.bkt = c.bkt
         |  WHERE q.vec_id < 50 AND c.vec_id <> q.vec_id),
         |j AS (SELECT query_id, neighbor_id,
         |    CAST(list_dot_product(vq.qv, vc.qv) AS BIGINT) AS dot
         |  FROM cand JOIN v vq ON vq.vec_id = cand.query_id
         |    JOIN v vc ON vc.vec_id = cand.neighbor_id)
         |SELECT query_id, neighbor_id, dot FROM j
         |QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY dot DESC, neighbor_id) <= 5""".stripMargin,

    "q_bpe_merges" -> bpeOracle(8,
      "SELECT * FROM (" + (1 to 8).map(r =>
        s"SELECT CAST($r AS BIGINT) AS merge_rank, split_part(p, ' ', 1) AS l_sym, " +
        s"split_part(p, ' ', 2) AS r_sym, replace(p, ' ', '') AS merged, " +
        s"pc AS pair_count FROM b$r").mkString("\nUNION ALL ") + ")"),

    "q_bpe_vocab" -> bpeOracle(8,
      "SELECT word, wc, CAST(len(s) AS BIGINT) AS n_symbols, " +
      "array_to_string(s, ' ') AS seg FROM v8"),

    // per-source fertility from the same 8-round segmentation chain
    "q_bpe_fertility" -> bpeOracle(8,
      s"""SELECT source, CAST(count(*) AS BIGINT) AS n_words,
         |  CAST(sum(len(s)) AS BIGINT) AS n_bpe_tokens,
         |  CAST((sum(len(s)) * 1000000) // count(*) AS BIGINT) AS fertility_ppm
         |FROM (SELECT source, unnest($toks) AS word FROM documents) o
         |JOIN v8 USING (word) WHERE word <> '' GROUP BY source""".stripMargin),

    // per-doc encode = segmented-vocab lookup join, same 8-round chain
    "q_bpe_encode" -> bpeOracle(8,
      s"""SELECT doc_id AS id, CAST(count(*) AS BIGINT) AS n_words,
         |  CAST(sum(len(s)) AS BIGINT) AS n_bpe_tokens
         |FROM (SELECT doc_id, unnest($toks) AS word FROM documents) o
         |JOIN v8 USING (word) WHERE word <> '' GROUP BY doc_id""".stripMargin),

    // the quality → surprisal band → DSIR selection → dedup chain, each
    // stage the verified q_text_quality / q_lm_surprisal / q_dsir_score /
    // q_dedup_exact oracle with CTEs prefixed to compose
    "q_pipeline_v3" ->
      s"""WITH q AS (SELECT doc_id,
         |  round(least(len($toks) / 50.0, 1.0) * 0.4 +
         |    (CASE WHEN length(text)*1.0/len($toks) BETWEEN 3.0 AND 10.0
         |      THEN 1.0 ELSE 0.5 END) * 0.4 +
         |    least(${duckStop("en")} * 10.0 / len($toks), 1.0) * 0.2, 6) AS quality
         |  FROM documents),
         |s_t AS (SELECT doc_id, $toks AS w FROM documents
         |    WHERE doc_id IS NOT NULL),
         |s_o AS (SELECT doc_id, bg, CAST(count(*) AS BIGINT) AS cnt FROM (
         |    SELECT doc_id, unnest(list_transform(range(1, len(w)),
         |      i -> w[i] || ' ' || w[i+1])) AS bg FROM s_t) GROUP BY 1, 2),
         |s_g AS (SELECT bg, CAST(sum(cnt) AS BIGINT) AS cb FROM s_o GROUP BY 1),
         |s_s AS (SELECT bg, CAST(length(bin(sum(cb) OVER (PARTITION BY split_part(bg, ' ', 1))))
         |    - length(bin(cb)) AS BIGINT) AS surp FROM s_g),
         |surp AS (SELECT doc_id,
         |    CAST(floor(sum(cnt * surp) * 1000000.0 / sum(cnt)) AS BIGINT) AS mean_surprisal_ppm
         |  FROM s_o JOIN s_s USING (bg) GROUP BY doc_id),
         |d_o AS (SELECT doc_id, is_target, ${duckMd5Long("bg")} % 512 AS fb,
         |    CAST(count(*) AS BIGINT) AS cnt FROM (
         |    SELECT doc_id, (source = 'src0') AS is_target,
         |      unnest(list_transform(range(1, len(w)),
         |        i -> w[i] || ' ' || w[i+1])) AS bg
         |    FROM (SELECT doc_id, source, $toks AS w FROM documents
         |          WHERE doc_id IS NOT NULL))
         |  GROUP BY 1, 2, 3),
         |d_wt AS (SELECT fb, CAST(sum(cnt) AS BIGINT) AS cs,
         |    CAST(sum(CASE WHEN is_target THEN cnt ELSE 0 END) AS BIGINT) AS ct
         |  FROM d_o GROUP BY 1),
         |d_ww AS (SELECT fb,
         |  CAST((length(bin(ct + 1)) - length(bin(sum(ct) OVER () + 1))) -
         |       (length(bin(cs + 1)) - length(bin(sum(cs) OVER () + 1))) AS BIGINT) AS w
         |  FROM d_wt),
         |imp AS (SELECT doc_id, is_target, CAST(sum(cnt * w) AS BIGINT) AS dsir_score
         |  FROM d_o JOIN d_ww USING (fb) GROUP BY 1, 2),
         |band AS (SELECT d.doc_id, d.text, surp.mean_surprisal_ppm, imp.dsir_score
         |  FROM documents d JOIN q USING (doc_id) JOIN surp USING (doc_id)
         |    JOIN imp USING (doc_id)
         |  WHERE q.quality >= 0.4
         |    AND surp.mean_surprisal_ppm BETWEEN 4400000 AND 4650000
         |    AND NOT imp.is_target AND imp.dsir_score >= 1),
         |keep AS (SELECT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS ck,
         |    min(doc_id) AS keep_id FROM band GROUP BY 1)
         |SELECT b.doc_id, b.mean_surprisal_ppm, b.dsir_score,
         |  CAST(len(regexp_split_to_array(trim(b.text), '\\s+')) AS BIGINT) AS tok_ws
         |FROM band b JOIN keep k ON b.doc_id = k.keep_id""".stripMargin,

    "q_text_stats" ->
      s"""SELECT doc_id, CAST(len($toks) AS BIGINT) AS tok_ws,
         |  CAST(len(regexp_extract_all(text, '\\w+|[^\\w\\s]')) AS BIGINT) AS tok_bpe,
         |  CAST(len(list_distinct($toks)) AS BIGINT) AS n_distinct
         |FROM documents""".stripMargin,

    // DuckDB's own nfc_normalize defines the canonical form the native
    // expression must reproduce; lengths are codepoints on both engines
    "q_text_normalize" ->
      """WITH r AS (SELECT doc_id,
        |    'Cafe' || chr(769) || '  NR' || doc_id || '  ' || text AS raw
        |  FROM documents)
        |SELECT doc_id,
        |  trim(regexp_replace(lower(nfc_normalize(raw)), '\s+', ' ', 'g')) AS norm,
        |  CAST(length(raw) AS BIGINT) AS len_before,
        |  CAST(length(trim(regexp_replace(lower(nfc_normalize(raw)),
        |    '\s+', ' ', 'g'))) AS BIGINT) AS len_after
        |FROM r""".stripMargin,

    "q_text_quality" ->
      s"""SELECT doc_id, round(
         |  least(len($toks) / 50.0, 1.0) * 0.4 +
         |  (CASE WHEN length(text)*1.0/len($toks) BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.5 END) * 0.4 +
         |  least(${duckStop("en")} * 10.0 / len($toks), 1.0) * 0.2, 6) AS quality
         |FROM documents""".stripMargin,

    // quality micro-units and the Gopher conjunction aggregated per source
    // — exact integers before summation, so order-independent
    "q_corpus_report" ->
      s"""WITH t AS (SELECT source, text, $toks AS w,
         |    string_split(text, chr(10)) AS ln FROM documents),
         |q AS (SELECT source, CAST(len(w) AS BIGINT) AS tok,
         |  CAST(round(round(
         |    least(len(w) / 50.0, 1.0) * 0.4 +
         |    (CASE WHEN length(text)*1.0/len(w) BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.5 END) * 0.4 +
         |    least(${duckStop("en")} * 10.0 / len(w), 1.0) * 0.2, 6) * 1000000) AS BIGINT) AS qm,
         |  CAST((len(w) BETWEEN 50 AND 100000)
         |    AND (len(w) > 0 AND len(array_to_string(w, '')) * 1.0 / len(w) BETWEEN 3 AND 10)
         |    AND (len(w) > 0 AND ((len(text) - len(replace(text, '#', ''))) * 1.0
         |      + (len(text) - len(replace(text, '...', ''))) / 3.0
         |      + (len(text) - len(replace(text, '…', '')))) / len(w) <= 0.1)
         |    AND (len(list_filter(ln, x -> starts_with(ltrim(x), '•') or starts_with(ltrim(x), '-')
         |      or starts_with(ltrim(x), '*'))) * 1.0 / len(ln) <= 0.9)
         |    AND (len(list_filter(ln, x -> ends_with(rtrim(x), '...') or ends_with(rtrim(x), '…')))
         |      * 1.0 / len(ln) <= 0.3)
         |    AND (len(w) > 0 AND len(list_filter(w, x -> regexp_matches(x, '[a-zA-Z]')))
         |      * 1.0 / len(w) >= 0.8)
         |    AND (len(list_intersect(list_distinct(w),
         |      ['the', 'a', 'of', 'and', 'to', 'in', 'is', 'it', 'that', 'for'])) >= 2) AS BIGINT) AS gp
         |  FROM t)
         |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(tok) AS BIGINT) AS tok_total,
         |  CAST(sum(qm) // count(*) AS BIGINT) AS quality_mean_micro,
         |  CAST(sum(gp) AS BIGINT) AS gopher_pass,
         |  CAST((sum(gp) * 1000000) // count(*) AS BIGINT) AS gopher_pass_ppm
         |FROM q GROUP BY source""".stripMargin,

    "q_text_langid" -> {
      val langs = Seq("de", "en", "es", "fr")
      val scoreDefs = langs.map(l => s"${duckStop(l)} AS s_$l").mkString(", ")
      val best = s"greatest(${langs.map("s_" + _).mkString(", ")})"
      val pick = langs.map(l => s"WHEN best > 0 AND s_$l = best THEN '$l'").mkString(" ")
      s"""WITH t AS (SELECT doc_id, $scoreDefs FROM documents),
         |b AS (SELECT *, $best AS best FROM t)
         |SELECT doc_id, CASE $pick ELSE 'und' END AS lang_pred FROM b""".stripMargin
    },

    "q_text_fingerprint" ->
      s"""WITH t AS (SELECT doc_id, text, $toks AS w FROM documents)
         |SELECT doc_id, CASE WHEN len(w) < 5 THEN ${duckMd5Long("text")}
         |  ELSE list_min(list_transform(
         |    [w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4] for i in range(1, len(w) - 3)],
         |    g -> ${duckMd5Long("g")})) END AS fp
         |FROM t""".stripMargin,

    // same synthetic augmentation, then the same 4-rule replace chain
    // (email → phone → key → digit-run; 'g' = Spark's replace-all)
    "q_text_redact" ->
      """WITH aug AS (SELECT doc_id, concat_ws(' ', text,
        |    'user' || CAST(doc_id AS VARCHAR) || '@example.com',
        |    CASE WHEN doc_id % 3 = 0 THEN 'call (555) 123-4567 now' ELSE '' END,
        |    CASE WHEN doc_id % 5 = 0 THEN 'acct ' || CAST(doc_id AS VARCHAR) || '9999888877' ELSE '' END,
        |    CASE WHEN doc_id % 7 = 0 THEN 'token a1B2c3D4e5F6g7H8i9J0k1L2m3N4' ELSE '' END) AS t
        |  FROM documents),
        |r AS (SELECT doc_id, regexp_replace(regexp_replace(regexp_replace(regexp_replace(t,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '(\+?[0-9]{1,2}[-. ]?)?\(?[0-9]{3}\)?[-. ][0-9]{3}[-. ][0-9]{4}', '<PHONE>', 'g'),
        |    '[A-Za-z0-9+/_-]{28,}', '<KEY>', 'g'),
        |    '[0-9]{9,}', '<NUM>', 'g') AS redacted FROM aug)
        |SELECT doc_id, redacted,
        |  CAST(len(regexp_extract_all(redacted, '<EMAIL>|<PHONE>|<KEY>|<NUM>')) AS BIGINT) AS n_pii
        |FROM r""".stripMargin,

    // same tokenize-once + shifted-window n-grams; duplicate fraction is
    // 1 - distinct/total with the same round(…, 6)
    "q_text_repetition" ->
      s"""WITH t AS (SELECT doc_id, $toks AS w FROM documents),
         |g AS (SELECT doc_id, w,
         |  [w[i] || ' ' || w[i+1] for i in range(1, len(w))] AS b2,
         |  [w[i] || ' ' || w[i+1] || ' ' || w[i+2] for i in range(1, len(w) - 1)] AS b3
         |  FROM t)
         |SELECT doc_id, CAST(len(w) AS BIGINT) AS n_words,
         |  CASE WHEN len(w) > 0 THEN round(1.0 - len(list_distinct(w)) * 1.0 / len(w), 6) ELSE 0.0 END AS dup_word_frac,
         |  CASE WHEN len(b2) > 0 THEN round(1.0 - len(list_distinct(b2)) * 1.0 / len(b2), 6) ELSE 0.0 END AS dup_bigram_frac,
         |  CASE WHEN len(b3) > 0 THEN round(1.0 - len(list_distinct(b3)) * 1.0 / len(b3), 6) ELSE 0.0 END AS dup_trigram_frac
         |FROM g""".stripMargin,

    // the bounded top-k aggregate ranks (-hash DESC, id ASC) ≡ (hash ASC,
    // id ASC) — the window spelling is the oracle, not the plan
    "q_sample_group" -> {
      val h = duckMd5Long("'mix:' || CAST(doc_id AS VARCHAR)")
      s"""WITH c AS (SELECT source, doc_id, $h AS h FROM documents),
         |r AS (SELECT source, doc_id,
         |        row_number() OVER (PARTITION BY source ORDER BY h, doc_id) - 1 AS rk
         |      FROM c)
         |SELECT source, doc_id, CAST(rk AS BIGINT) AS rk FROM r WHERE rk < 5""".stripMargin
    },

    "q_chunk_overlap" ->
      s"""WITH t AS (SELECT doc_id, $toks AS w FROM documents),
         |s AS (SELECT doc_id, w, unnest(range(0, len(w), 48)) AS st FROM t)
         |SELECT doc_id, CAST(st // 48 AS BIGINT) AS chunk_idx,
         |  array_to_string(list_slice(w, st + 1, st + 64), ' ') AS chunk_text,
         |  CAST(least(64, len(w) - st) AS BIGINT) AS n_tokens
         |FROM s""".stripMargin,

    // the oracle never decodes: it recomputes the decoded stats from the
    // same analytic pixel/sample formulas the blob was built from — a
    // mismatch means the DECODER misparsed real bytes
    // expected text built ANALYTICALLY (title + h1 + body + decoded div
    // tail), with only the final whitespace collapse shared with the
    // operator; the tag/entity machinery itself is never replayed
    "q_html_extract" ->
      """SELECT doc_id, trim(regexp_replace(
        |  'Doc ' || doc_id || ' Doc ' || doc_id || ' ' || text ||
        |  ' 3 < 4 && 5 > 2, a "quoted'' tail', '\s+', ' ', 'g')) AS extracted
        |FROM documents""".stripMargin,

    // the composed ingest chain: the oracle rebuilds the expected EXTRACTED
    // text analytically from doc_id + text (the synthetic page is
    // '<title>D<id></title>…<p>text</p>'; title + body survive extraction)
    // and the target URI from the WARC framing formula — so a hash match
    // proves WARC framing, gzip round-trip, HTML extraction, and token
    // stats all composed correctly, without replaying any byte-level stage
    "q_corpus_rollup" ->
      s"""SELECT source, lang, CAST(GROUPING(source, lang) AS BIGINT) AS gid,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(len($toks)) AS BIGINT) AS tok_total
         |FROM documents GROUP BY ROLLUP (source, lang)""".stripMargin,

    // disposition from the id rules alone; token count from the original
    // text — the JSON round-trip (escape → truncate/omit → parse) must
    // reproduce both for the hash to match
    "q_jsonl_ingest" ->
      s"""SELECT doc_id AS orig_id,
         |  CASE WHEN doc_id % 13 = 0 THEN 'malformed'
         |       WHEN doc_id % 19 = 0 THEN 'missing_field'
         |       ELSE 'ok' END AS status,
         |  CASE WHEN doc_id % 13 = 0 OR doc_id % 19 = 0 THEN NULL
         |       ELSE CAST(len($toks) AS BIGINT) END AS tok
         |FROM documents""".stripMargin,

    // the oracle rebuilds the hostile text analytically from documents —
    // the '""' escaping round trip is entirely the engine's to prove
    "q_csv_ingest" ->
      """SELECT doc_id AS orig_id,
        |  CASE WHEN doc_id % 13 = 0 THEN 'malformed'
        |       WHEN doc_id % 19 = 0 THEN 'missing_field'
        |       ELSE 'ok' END AS status,
        |  CASE WHEN doc_id % 13 = 0 OR doc_id % 19 = 0 THEN NULL
        |       ELSE 'c:' || text || ', "q' || doc_id || '"' END AS text_out,
        |  CASE WHEN doc_id % 13 = 0 THEN NULL
        |       ELSE n_chars END AS n_chars_out
        |FROM documents""".stripMargin,

    "q_ingest_e2e" ->
      """WITH e AS (SELECT doc_id,
        |  trim(regexp_replace('D' || doc_id || ' ' || text, '\s+', ' ', 'g')) AS extracted
        |  FROM documents)
        |SELECT doc_id, 'http://example.com/' || doc_id AS target_uri, extracted,
        |  CAST(len(regexp_split_to_array(extracted, '\s+')) AS BIGINT) AS tok_ws
        |FROM e""".stripMargin,

    // record k of doc id: 5 + (id+k)%4 tokens "tok<(id*31+k*7+t*13)%100>";
    // content_length = token byte lengths + separating spaces
    "q_multimodal_warc" ->
      """WITH r AS (SELECT doc_id, unnest(range(0, 2 + doc_id % 3)) AS k FROM documents),
        |t AS (SELECT doc_id, k, unnest(range(0, 5 + (doc_id + k) % 4)) AS t FROM r),
        |v AS (SELECT doc_id, k,
        |    3 + length(CAST((doc_id * 31 + k * 7 + t * 13) % 100 AS VARCHAR)) AS tl FROM t)
        |SELECT doc_id AS media_id, CAST(k AS BIGINT) AS rec_idx,
        |  CASE WHEN k % 2 = 0 THEN 'response' ELSE 'request' END AS warc_type,
        |  'http://example.com/' || doc_id || '/' || k AS target_uri,
        |  CAST(sum(tl) + count(*) - 1 AS BIGINT) AS content_length,
        |  CAST(count(*) AS BIGINT) AS n_tokens
        |FROM v GROUP BY doc_id, k""".stripMargin,

    "q_multimodal_ppm" ->
      """WITH px AS (SELECT doc_id, unnest(range(0, 192)) AS j FROM documents),
        |v AS (SELECT doc_id, j % 3 AS ch, (doc_id * 31 + j * 7) % 256 AS val FROM px)
        |SELECT doc_id AS media_id, CAST(8 AS INTEGER) AS width, CAST(8 AS INTEGER) AS height,
        |  sum(CASE WHEN ch = 0 THEN val END) / 64.0 AS mean_r,
        |  sum(CASE WHEN ch = 1 THEN val END) / 64.0 AS mean_g,
        |  sum(CASE WHEN ch = 2 THEN val END) / 64.0 AS mean_b
        |FROM v GROUP BY doc_id""".stripMargin,

    // identical logical-formula strategy to q_multimodal_ppm; 6×8 ⇒ 48 px
    // per channel; tl_r = channel value at j = 0
    "q_multimodal_bmp" ->
      """WITH px AS (SELECT doc_id, unnest(range(0, 144)) AS j FROM documents),
        |v AS (SELECT doc_id, j % 3 AS ch, (doc_id * 31 + j * 7) % 256 AS val FROM px)
        |SELECT doc_id AS media_id, CAST(6 AS INTEGER) AS width, CAST(8 AS INTEGER) AS height,
        |  round(sum(CASE WHEN ch = 0 THEN val END) / 48.0, 6) AS mean_r,
        |  round(sum(CASE WHEN ch = 1 THEN val END) / 48.0, 6) AS mean_g,
        |  round(sum(CASE WHEN ch = 2 THEN val END) / 48.0, 6) AS mean_b,
        |  CAST(doc_id * 31 % 256 AS INTEGER) AS tl_r
        |FROM v GROUP BY doc_id""".stripMargin,

    // identical logical-formula strategy to q_multimodal_ppm — the oracle
    // never touches zlib or filtering, it recomputes the DECODED stats from
    // the formula; 5×6 ⇒ 30 px per channel
    "q_multimodal_png" ->
      """WITH px AS (SELECT doc_id, unnest(range(0, 90)) AS j FROM documents),
        |v AS (SELECT doc_id, j % 3 AS ch, (doc_id * 31 + j * 7) % 256 AS val FROM px)
        |SELECT doc_id AS media_id, CAST(5 AS INTEGER) AS width, CAST(6 AS INTEGER) AS height,
        |  round(sum(CASE WHEN ch = 0 THEN val END) / 30.0, 6) AS mean_r,
        |  round(sum(CASE WHEN ch = 1 THEN val END) / 30.0, 6) AS mean_g,
        |  round(sum(CASE WHEN ch = 2 THEN val END) / 30.0, 6) AS mean_b,
        |  CAST(doc_id * 31 % 256 AS INTEGER) AS tl_r
        |FROM v GROUP BY doc_id""".stripMargin,

    // every MP3 header field is analytic in doc_id (nf = 3 + id%4,
    // bitrate index 1 + id%14, rate index id%3); duration is the
    // truncating 1152-samples-per-frame formula
    "q_multimodal_mp3" ->
      """WITH d AS (SELECT doc_id AS media_id,
        |    CAST(3 + doc_id % 4 AS BIGINT) AS n_frames,
        |    CAST(1 + doc_id % 14 AS INT) AS b_idx,
        |    CAST(doc_id % 3 AS INT) AS r_idx FROM documents),
        |t AS (SELECT media_id, n_frames,
        |    CAST(CASE r_idx WHEN 0 THEN 44100 WHEN 1 THEN 48000 ELSE 32000 END AS INT) AS sample_rate,
        |    CAST(CASE b_idx WHEN 1 THEN 32 WHEN 2 THEN 40 WHEN 3 THEN 48
        |      WHEN 4 THEN 56 WHEN 5 THEN 64 WHEN 6 THEN 80 WHEN 7 THEN 96
        |      WHEN 8 THEN 112 WHEN 9 THEN 128 WHEN 10 THEN 160 WHEN 11 THEN 192
        |      WHEN 12 THEN 224 WHEN 13 THEN 256 ELSE 320 END AS INT) AS bitrate_kbps
        |  FROM d)
        |SELECT media_id, n_frames, sample_rate, bitrate_kbps,
        |  CAST(n_frames * 1152 * 1000 // sample_rate AS BIGINT) AS duration_ms
        |FROM t""".stripMargin,

    // gray GIF formula v(x,y) = (id*37 + x*11 + y*17) % 256 on a
    // (5 + id%3) × (6 + id%2) canvas: stats re-aggregated per doc, dHash
    // from the NN-sampled 9×8 gray grid (gray = v since r=g=b)
    "q_multimodal_gif" ->
      """WITH dims AS (SELECT doc_id, 5 + doc_id % 3 AS w, 6 + doc_id % 2 AS h FROM documents),
        |ys AS (SELECT doc_id, w, h, unnest(range(0, 8)) AS y FROM dims),
        |pts AS (SELECT doc_id, w, h, y, unnest(range(0, 9)) AS x FROM ys),
        |g AS (SELECT doc_id, y, x,
        |    (doc_id*37 + ((x*w)//9)*11 + ((y*h)//8)*17) % 256 AS gv FROM pts),
        |bits AS (SELECT l.doc_id, l.y, l.x,
        |    CASE WHEN l.gv > r.gv THEN 1 ELSE 0 END AS bit
        |  FROM g l JOIN g r ON l.doc_id = r.doc_id AND l.y = r.y AND r.x = l.x + 1
        |  WHERE l.x < 8),
        |dh AS (SELECT doc_id,
        |    CAST(sum(CASE WHEN y*8+x >= 32 THEN bit * (CAST(1 AS BIGINT) << (y*8+x-32)) ELSE 0 END) AS BIGINT) AS hash_hi,
        |    CAST(sum(CASE WHEN y*8+x < 32 THEN bit * (CAST(1 AS BIGINT) << (y*8+x)) ELSE 0 END) AS BIGINT) AS hash_lo
        |  FROM bits GROUP BY doc_id),
        |px AS (SELECT doc_id, w, h, unnest(range(0, w*h)) AS j FROM dims),
        |v AS (SELECT doc_id, w, h,
        |    (doc_id*37 + (j % w)*11 + (j // w)*17) % 256 AS val FROM px),
        |st AS (SELECT doc_id, CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
        |    round(sum(val) * 1.0 / (w * h), 6) AS mean_gray,
        |    CAST(doc_id * 37 % 256 AS INTEGER) AS tl_gray
        |  FROM v GROUP BY doc_id, w, h)
        |SELECT st.doc_id AS media_id, st.width, st.height, st.mean_gray, st.tl_gray,
        |  dh.hash_hi, dh.hash_lo
        |FROM st JOIN dh ON st.doc_id = dh.doc_id""".stripMargin,

    // 1-bit formula v(x,y) = 255·(((id*7 + x*3 + y*5) % 11) % 2) on a
    // (5 + id%3) × (6 + id%2) canvas — the GIF/TIFF oracle shape over the
    // expanded 0/255 gray plane
    "q_multimodal_wbmp" ->
      """WITH dims AS (SELECT doc_id, 5 + doc_id % 3 AS w, 6 + doc_id % 2 AS h FROM documents),
        |ys AS (SELECT doc_id, w, h, unnest(range(0, 8)) AS y FROM dims),
        |pts AS (SELECT doc_id, w, h, y, unnest(range(0, 9)) AS x FROM ys),
        |g AS (SELECT doc_id, y, x,
        |    255 * (((doc_id*7 + ((x*w)//9)*3 + ((y*h)//8)*5) % 11) % 2) AS gv FROM pts),
        |bits AS (SELECT l.doc_id, l.y, l.x,
        |    CASE WHEN l.gv > r.gv THEN 1 ELSE 0 END AS bit
        |  FROM g l JOIN g r ON l.doc_id = r.doc_id AND l.y = r.y AND r.x = l.x + 1
        |  WHERE l.x < 8),
        |dh AS (SELECT doc_id,
        |    CAST(sum(CASE WHEN y*8+x >= 32 THEN bit * (CAST(1 AS BIGINT) << (y*8+x-32)) ELSE 0 END) AS BIGINT) AS hash_hi,
        |    CAST(sum(CASE WHEN y*8+x < 32 THEN bit * (CAST(1 AS BIGINT) << (y*8+x)) ELSE 0 END) AS BIGINT) AS hash_lo
        |  FROM bits GROUP BY doc_id),
        |px AS (SELECT doc_id, w, h, unnest(range(0, w*h)) AS j FROM dims),
        |v AS (SELECT doc_id, w, h,
        |    255 * (((doc_id*7 + (j % w)*3 + (j // w)*5) % 11) % 2) AS val FROM px),
        |st AS (SELECT doc_id, CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
        |    round(sum(val) * 1.0 / (w * h), 6) AS mean_gray,
        |    CAST(255 * (((doc_id * 7) % 11) % 2) AS INTEGER) AS tl_gray
        |  FROM v GROUP BY doc_id, w, h)
        |SELECT st.doc_id AS media_id, st.width, st.height, st.mean_gray, st.tl_gray,
        |  dh.hash_hi, dh.hash_lo
        |FROM st JOIN dh ON st.doc_id = dh.doc_id""".stripMargin,

    // gray TIFF formula v(x,y) = (id*41 + x*13 + y*19) % 256 on a
    // (5 + id%3) × (6 + id%2) canvas — the q_multimodal_gif oracle shape
    // with the TIFF generation constants
    "q_multimodal_tiff" ->
      """WITH dims AS (SELECT doc_id, 5 + doc_id % 3 AS w, 6 + doc_id % 2 AS h FROM documents),
        |ys AS (SELECT doc_id, w, h, unnest(range(0, 8)) AS y FROM dims),
        |pts AS (SELECT doc_id, w, h, y, unnest(range(0, 9)) AS x FROM ys),
        |g AS (SELECT doc_id, y, x,
        |    (doc_id*41 + ((x*w)//9)*13 + ((y*h)//8)*19) % 256 AS gv FROM pts),
        |bits AS (SELECT l.doc_id, l.y, l.x,
        |    CASE WHEN l.gv > r.gv THEN 1 ELSE 0 END AS bit
        |  FROM g l JOIN g r ON l.doc_id = r.doc_id AND l.y = r.y AND r.x = l.x + 1
        |  WHERE l.x < 8),
        |dh AS (SELECT doc_id,
        |    CAST(sum(CASE WHEN y*8+x >= 32 THEN bit * (CAST(1 AS BIGINT) << (y*8+x-32)) ELSE 0 END) AS BIGINT) AS hash_hi,
        |    CAST(sum(CASE WHEN y*8+x < 32 THEN bit * (CAST(1 AS BIGINT) << (y*8+x)) ELSE 0 END) AS BIGINT) AS hash_lo
        |  FROM bits GROUP BY doc_id),
        |px AS (SELECT doc_id, w, h, unnest(range(0, w*h)) AS j FROM dims),
        |v AS (SELECT doc_id, w, h,
        |    (doc_id*41 + (j % w)*13 + (j // w)*19) % 256 AS val FROM px),
        |st AS (SELECT doc_id, CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
        |    round(sum(val) * 1.0 / (w * h), 6) AS mean_gray,
        |    CAST(doc_id * 41 % 256 AS INTEGER) AS tl_gray
        |  FROM v GROUP BY doc_id, w, h)
        |SELECT st.doc_id AS media_id, st.width, st.height, st.mean_gray, st.tl_gray,
        |  dh.hash_hi, dh.hash_lo
        |FROM st JOIN dh ON st.doc_id = dh.doc_id""".stripMargin,

    // same logical-formula strategy through a REAL perceptual codec: block
    // (bx, by) of the grayscale JPEG is constant (id*31+bx*7+by*13)%256,
    // the block grid is (1<<id%3)×(1<<id%2) so the mean is an exact
    // power-of-two division, and the corners witness block orientation
    "q_multimodal_jpeg" ->
      """WITH dims AS (SELECT doc_id,
        |  CAST(1 << (doc_id % 3) AS BIGINT) AS bw,
        |  CAST(1 << (doc_id % 2) AS BIGINT) AS bh FROM documents),
        |px AS (SELECT doc_id, bw, bh, unnest(range(0, bw * bh)) AS j FROM dims),
        |v AS (SELECT doc_id, bw, bh,
        |  (doc_id * 31 + (j % bw) * 7 + (j // bw) * 13) % 256 AS val FROM px)
        |SELECT doc_id AS media_id,
        |  CAST(bw * 8 AS INTEGER) AS width, CAST(bh * 8 AS INTEGER) AS height,
        |  CAST(1 AS INTEGER) AS n_bands,
        |  CAST(sum(val) AS DOUBLE) / count(*) AS mean_b0,
        |  CAST(doc_id * 31 % 256 AS INTEGER) AS tl_b0,
        |  CAST((doc_id * 31 + (bw - 1) * 7 + (bh - 1) * 13) % 256 AS INTEGER) AS br_b0
        |FROM v GROUP BY doc_id, bw, bh""".stripMargin,

    // the q_multimodal_jpeg formula per (doc, frame): frame f's JPEG id is
    // doc_id + 6f (same block grid, advanced block values)
    "q_multimodal_avi" ->
      """WITH f AS (SELECT doc_id, unnest(range(0, 2 + doc_id % 3)) AS fi FROM documents),
        |d AS (SELECT doc_id, fi, doc_id + 6 * fi AS jid,
        |  CAST(1 << (doc_id % 3) AS BIGINT) AS bw,
        |  CAST(1 << (doc_id % 2) AS BIGINT) AS bh FROM f),
        |px AS (SELECT doc_id, fi, jid, bw, bh, unnest(range(0, bw * bh)) AS j FROM d),
        |v AS (SELECT doc_id, fi, jid, bw, bh,
        |  (jid * 31 + (j % bw) * 7 + (j // bw) * 13) % 256 AS val FROM px)
        |SELECT doc_id AS media_id, CAST(fi AS BIGINT) AS frame_idx,
        |  CAST(2 + doc_id % 3 AS INTEGER) AS n_frames,
        |  CAST(bw * 8 AS INTEGER) AS width, CAST(bh * 8 AS INTEGER) AS height,
        |  CAST(sum(val) AS DOUBLE) / count(*) AS mean_b0,
        |  CAST(jid * 31 % 256 AS INTEGER) AS tl_b0
        |FROM v GROUP BY doc_id, fi, jid, bw, bh""".stripMargin,

    "q_multimodal_wav" ->
      """WITH s AS (SELECT doc_id, unnest(range(0, 256)) AS i FROM documents),
        |u AS (SELECT doc_id, (doc_id * 13 + i * 97) % 65536 AS w FROM s),
        |v AS (SELECT doc_id, CASE WHEN w >= 32768 THEN w - 65536 ELSE w END AS smp FROM u)
        |SELECT doc_id AS media_id, CAST(16000 AS INTEGER) AS sample_rate,
        |  CAST(256 AS BIGINT) AS n_samples,
        |  sum(smp) / 256.0 AS mean_amp,
        |  CAST(max(abs(smp)) AS BIGINT) AS peak_abs
        |FROM v GROUP BY doc_id""".stripMargin,

    // the strip/clean/gopher/dedup chain replicated stage by stage
    "q_pipeline_v2" ->
      s"""WITH injected AS (SELECT doc_id,
         |  CASE WHEN doc_id % 2 = 0 THEN 'COOKIE BANNER' || chr(10) ELSE '' END ||
         |  'DOC START' || chr(10) || text ||
         |  CASE WHEN doc_id % 3 = 0 THEN chr(10) || 'Copyright Footer' ELSE '' END AS text
         |  FROM documents),
         |d0 AS (SELECT doc_id, string_split(text, chr(10)) AS ls FROM injected),
         |l0 AS (SELECT doc_id, unnest(range(1, len(ls) + 1)) AS pos, ls FROM d0),
         |l AS (SELECT doc_id, pos, ls[pos] AS line FROM l0),
         |hv AS (SELECT line FROM l WHERE trim(line) != ''
         |       GROUP BY line HAVING count(DISTINCT doc_id) >= 3),
         |j AS (SELECT l.*, l.line IN (SELECT line FROM hv) AS heavy FROM l),
         |stripped AS (SELECT doc_id,
         |  COALESCE(string_agg(CASE WHEN NOT heavy THEN line END, chr(10) ORDER BY pos), '') AS text,
         |  CAST(count(CASE WHEN heavy THEN 1 END) AS BIGINT) AS n_stripped
         |  FROM j GROUP BY doc_id),
         |cleaned AS (SELECT doc_id, n_stripped,
         |  regexp_replace(text, '[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F�]', '', 'g') AS text
         |  FROM stripped),
         |gw AS (SELECT doc_id, n_stripped, text, $toks AS w,
         |  string_split(text, chr(10)) AS ln FROM cleaned),
         |passed AS (SELECT * FROM gw WHERE
         |  (len(w) BETWEEN 50 AND 100000)
         |  AND (len(w) > 0 AND len(array_to_string(w, '')) * 1.0 / len(w) BETWEEN 3 AND 10)
         |  AND (len(w) > 0 AND ((len(text) - len(replace(text, '#', ''))) * 1.0
         |    + (len(text) - len(replace(text, '...', ''))) / 3.0
         |    + (len(text) - len(replace(text, '…', '')))) / len(w) <= 0.1)
         |  AND (len(list_filter(ln, x -> starts_with(ltrim(x), '•') or starts_with(ltrim(x), '-')
         |    or starts_with(ltrim(x), '*'))) * 1.0 / len(ln) <= 0.9)
         |  AND (len(list_filter(ln, x -> ends_with(rtrim(x), '...') or ends_with(rtrim(x), '…')))
         |    * 1.0 / len(ln) <= 0.3)
         |  AND (len(w) > 0 AND len(list_filter(w, x -> regexp_matches(x, '[a-zA-Z]')))
         |    * 1.0 / len(w) >= 0.8)
         |  AND (len(list_intersect(list_distinct(w),
         |    ['the', 'a', 'of', 'and', 'to', 'in', 'is', 'it', 'that', 'for'])) >= 2)),
         |keep AS (SELECT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS ck,
         |  min(doc_id) AS keep_id FROM passed GROUP BY 1)
         |SELECT p.doc_id, p.n_stripped, CAST(len(p.w) AS BIGINT) AS tok_ws
         |FROM passed p JOIN keep k ON p.doc_id = k.keep_id""".stripMargin,

    // positional 5-grams; islands via pos - row_number (offset-invariant)
    "q_dup_spans" ->
      s"""WITH t AS (SELECT doc_id, $toks AS w FROM documents),
         |g0 AS (SELECT doc_id, unnest(range(1, len(w) - 3)) AS pos, w FROM t),
         |g AS (SELECT doc_id, pos, w[pos] || ' ' || w[pos+1] || ' ' || w[pos+2]
         |        || ' ' || w[pos+3] || ' ' || w[pos+4] AS gram FROM g0),
         |s AS (SELECT gram FROM g GROUP BY gram HAVING count(DISTINCT doc_id) >= 2),
         |d AS (SELECT g.doc_id, g.pos FROM g JOIN s USING (gram)),
         |i AS (SELECT doc_id, pos,
         |  pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp FROM d),
         |sp AS (SELECT doc_id, grp, count(*) AS len_g FROM i GROUP BY doc_id, grp)
         |SELECT doc_id, CAST(sum(len_g) AS BIGINT) AS n_dup_grams,
         |  CAST(count(*) AS BIGINT) AS n_spans,
         |  CAST(max(len_g) + 4 AS BIGINT) AS longest_span_tokens
         |FROM sp GROUP BY doc_id""".stripMargin,

    // same injected corpus; heavy = line in >= 3 distinct docs, blanks kept
    "q_strip_lines" ->
      """WITH injected AS (SELECT doc_id,
        |  CASE WHEN doc_id % 2 = 0 THEN 'COOKIE BANNER' || chr(10) ELSE '' END ||
        |  'DOC START' || chr(10) || text ||
        |  CASE WHEN doc_id % 3 = 0 THEN chr(10) || 'Copyright Footer' ELSE '' END AS text
        |  FROM documents),
        |d AS (SELECT doc_id, string_split(text, chr(10)) AS ls FROM injected),
        |l0 AS (SELECT doc_id, unnest(range(1, len(ls) + 1)) AS pos, ls FROM d),
        |l AS (SELECT doc_id, pos, ls[pos] AS line FROM l0),
        |h AS (SELECT line FROM l WHERE trim(line) != ''
        |      GROUP BY line HAVING count(DISTINCT doc_id) >= 3),
        |j AS (SELECT l.*, l.line IN (SELECT line FROM h) AS heavy FROM l)
        |SELECT doc_id,
        |  COALESCE(string_agg(CASE WHEN NOT heavy THEN line END, chr(10) ORDER BY pos), '') AS text,
        |  CAST(count(CASE WHEN heavy THEN 1 END) AS BIGINT) AS n_stripped
        |FROM j GROUP BY doc_id""".stripMargin,

    // explicit code-point ranges → identical counts in any regex engine
    "q_text_script" ->
      """SELECT doc_id, CAST(len(text) AS BIGINT) AS n_chars,
        |  CAST(len(regexp_extract_all(text, '[A-Za-zÀ-ɏ]')) AS BIGINT) AS n_latin,
        |  CAST(len(regexp_extract_all(text, '[一-鿿]')) AS BIGINT) AS n_cjk,
        |  CAST(len(regexp_extract_all(text, '[Ѐ-ӿ]')) AS BIGINT) AS n_cyrillic,
        |  CAST(len(regexp_extract_all(text, '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]')) AS BIGINT) AS n_control,
        |  CAST(len(regexp_extract_all(text, '�')) AS BIGINT) AS n_replacement
        |FROM documents""".stripMargin,

    // the oracle MAY use the per-domain window — it defines the semantics;
    // the Spark plan computes the same running totals two-phase
    "q_token_budget" ->
      s"""WITH t AS (SELECT doc_id, source, CAST(len($toks) AS BIGINT) AS n_tok,
         |  ${duckMd5Long("'budget:' || doc_id")} % 1000000 AS h
         |  FROM documents WHERE source IN ('src1', 'src2', 'src3') AND doc_id IS NOT NULL),
         |c AS (SELECT *, CAST(COALESCE(SUM(n_tok) OVER (PARTITION BY source ORDER BY h, doc_id
         |  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before FROM t)
         |SELECT doc_id, source, n_tok, cum_before FROM c
         |WHERE cum_before < CASE source WHEN 'src1' THEN 800
         |                               WHEN 'src2' THEN 5000
         |                               WHEN 'src3' THEN 400 END""".stripMargin,

    // the oracle MAY use the window formulation — it defines the semantics;
    // the Spark plan computes the same ranks without one
    "q_export_shards" ->
      s"""WITH h AS (SELECT doc_id,
         |  ${duckMd5Long("'shard:' || doc_id")} % 1000000 AS h
         |  FROM documents WHERE doc_id IS NOT NULL)
         |SELECT doc_id, CAST(h % 8 AS INTEGER) AS shard,
         |  CAST(row_number() OVER (PARTITION BY h % 8 ORDER BY h, doc_id) - 1 AS BIGINT) AS seq
         |FROM h""".stripMargin,

    // per-shard totals + md5 fingerprint of the seq-ordered id list — the
    // q_export_shards derivation rolled up
    "q_shard_manifest" ->
      s"""WITH h AS (SELECT doc_id,
         |  ${duckMd5Long("'shard:' || doc_id")} % 1000000 AS h
         |  FROM documents WHERE doc_id IS NOT NULL),
         |s AS (SELECT doc_id, CAST(h % 8 AS BIGINT) AS shard,
         |  CAST(row_number() OVER (PARTITION BY h % 8 ORDER BY h, doc_id) - 1 AS BIGINT) AS seq
         |  FROM h),
         |t AS (SELECT doc_id, CAST(len($toks) AS BIGINT) AS nt FROM documents)
         |SELECT s.shard, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(t.nt) AS BIGINT) AS n_tokens,
         |  ${duckMd5Long("string_agg(CAST(s.doc_id AS VARCHAR), ',' ORDER BY s.seq)")} AS content_fp
         |FROM s JOIN t USING (doc_id) GROUP BY s.shard""".stripMargin,

    // every Gopher rule replicated arithmetically; booleans hash-compared
    "q_text_gopher" ->
      s"""WITH t AS (SELECT doc_id, text, $toks AS w,
         |  string_split(text, chr(10)) AS ln FROM documents)
         |SELECT doc_id,
         |  len(w) BETWEEN 50 AND 100000 AS r_words,
         |  len(w) > 0 AND len(array_to_string(w, '')) * 1.0 / len(w) BETWEEN 3 AND 10 AS r_word_len,
         |  len(w) > 0 AND ((len(text) - len(replace(text, '#', ''))) * 1.0
         |    + (len(text) - len(replace(text, '...', ''))) / 3.0
         |    + (len(text) - len(replace(text, '…', '')))) / len(w) <= 0.1 AS r_symbol,
         |  len(list_filter(ln, x -> starts_with(ltrim(x), '•') or starts_with(ltrim(x), '-')
         |    or starts_with(ltrim(x), '*'))) * 1.0 / len(ln) <= 0.9 AS r_bullet,
         |  len(list_filter(ln, x -> ends_with(rtrim(x), '...') or ends_with(rtrim(x), '…')))
         |    * 1.0 / len(ln) <= 0.3 AS r_ellipsis,
         |  len(w) > 0 AND len(list_filter(w, x -> regexp_matches(x, '[a-zA-Z]')))
         |    * 1.0 / len(w) >= 0.8 AS r_alpha,
         |  len(list_intersect(list_distinct(w),
         |    ['the', 'a', 'of', 'and', 'to', 'in', 'is', 'it', 'that', 'for'])) >= 2 AS r_stop,
         |  (len(w) BETWEEN 50 AND 100000)
         |    AND (len(w) > 0 AND len(array_to_string(w, '')) * 1.0 / len(w) BETWEEN 3 AND 10)
         |    AND (len(w) > 0 AND ((len(text) - len(replace(text, '#', ''))) * 1.0
         |      + (len(text) - len(replace(text, '...', ''))) / 3.0
         |      + (len(text) - len(replace(text, '…', '')))) / len(w) <= 0.1)
         |    AND (len(list_filter(ln, x -> starts_with(ltrim(x), '•') or starts_with(ltrim(x), '-')
         |      or starts_with(ltrim(x), '*'))) * 1.0 / len(ln) <= 0.9)
         |    AND (len(list_filter(ln, x -> ends_with(rtrim(x), '...') or ends_with(rtrim(x), '…')))
         |      * 1.0 / len(ln) <= 0.3)
         |    AND (len(w) > 0 AND len(list_filter(w, x -> regexp_matches(x, '[a-zA-Z]')))
         |      * 1.0 / len(w) >= 0.8)
         |    AND (len(list_intersect(list_distinct(w),
         |      ['the', 'a', 'of', 'and', 'to', 'in', 'is', 'it', 'that', 'for'])) >= 2) AS pass
         |FROM t""".stripMargin,

    "q_dedup_exact" ->
      """SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS content_key,
        |  min(doc_id) AS keep_id, CAST(count(*) AS BIGINT) AS n_copies
        |FROM documents GROUP BY 1""".stripMargin,

    // exact all-pairs 3-gram Jaccard >= 0.5: equals the MinHash+LSH output
    // when no pair above threshold is missed (32 bands x 2 rows → miss
    // probability ~1e-4 at J=0.5; verified empirically on this data).
    // disposition from the id rules alone — the content-key compare must
    // agree (the %7 rewrite MUST flip the normalized key, and only it)
    "q_snapshot_diff" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 11 = 0 THEN 'added'
        |       WHEN doc_id % 13 = 0 THEN 'removed'
        |       WHEN doc_id % 7 = 0 THEN 'changed'
        |       ELSE 'same' END AS status
        |FROM documents
        |WHERE NOT (doc_id % 11 = 0 AND doc_id % 13 = 0)""".stripMargin,

    // brute-force pair scan defines the semantics; the banded plan must
    // reproduce it exactly (recall property of the 32x2 scheme at <=10%
    // edits on this corpus)
    "q_dedup_editdist" ->
      """WITH t AS (SELECT doc_id, text FROM documents WHERE len(text) <= 2000)
        |SELECT a.doc_id AS id_1, b.doc_id AS id_2,
        |  CAST(levenshtein(a.text, b.text) AS BIGINT) AS dist,
        |  CAST(levenshtein(a.text, b.text) * 1000000 //
        |       greatest(len(a.text), len(b.text)) AS BIGINT) AS rel_ppm
        |FROM t a JOIN t b ON a.doc_id < b.doc_id
        |WHERE levenshtein(a.text, b.text) * 1000000 //
        |      greatest(len(a.text), len(b.text)) <= 100000""".stripMargin,

    "q_dedup_minhash_eval" -> minhashEvalOracle,

    "q_dedup_eval_sweep" -> minhashEvalSweepOracle,

    // exact keep-min per normalized content key, then min-label CC
    // survivors over exact-Jaccard pairs among the exact survivors
    "q_dedup_yield" ->
      s"""WITH RECURSIVE ck AS (SELECT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS k,
         |    min(doc_id) AS keep FROM documents GROUP BY 1),
         |sv AS (SELECT d.doc_id, d.source, d.text FROM documents d JOIN ck ON ck.keep = d.doc_id),
         |t AS (SELECT doc_id, $toks AS w FROM sv),
         |g AS (SELECT doc_id, $duckShingles3 AS s FROM t),
         |p AS (SELECT a.doc_id AS id_1, b.doc_id AS id_2
         |      FROM g a JOIN g b ON a.doc_id < b.doc_id
         |      WHERE len(list_intersect(a.s, b.s)) * 1.0 /
         |            (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.5),
         |e AS (SELECT id_1 AS u, id_2 AS v FROM p UNION SELECT id_2, id_1 FROM p),
         |n AS (SELECT DISTINCT u AS id FROM e),
         |walk(id, label) AS (
         |  SELECT id, id FROM n
         |  UNION
         |  SELECT e.v, w.label FROM walk w JOIN e ON e.u = w.id WHERE w.label < e.v),
         |dr AS (SELECT id FROM walk GROUP BY id HAVING min(label) <> id),
         |i AS (SELECT source, CAST(count(*) AS BIGINT) AS n_in FROM documents GROUP BY 1),
         |x AS (SELECT source, CAST(count(*) AS BIGINT) AS n_after_exact FROM sv GROUP BY 1),
         |nr AS (SELECT source, CAST(count(*) AS BIGINT) AS n_after_near FROM sv
         |  WHERE doc_id NOT IN (SELECT id FROM dr) GROUP BY 1)
         |SELECT i.source, i.n_in,
         |  coalesce(x.n_after_exact, 0) AS n_after_exact,
         |  coalesce(nr.n_after_near, 0) AS n_after_near,
         |  (coalesce(nr.n_after_near, 0) * 1000000) // i.n_in AS yield_ppm
         |FROM i LEFT JOIN x USING (source) LEFT JOIN nr USING (source)""".stripMargin,

    // shingle-set Jaccard brute force — the prefix-filter lemma says the
    // filtered join must equal this exactly (no false negatives); same
    // truth as q_dedup_minhash's oracle
    "q_dedup_prefix_join" ->
      s"""WITH t AS (SELECT doc_id, $toks AS w FROM documents),
         |g AS (SELECT doc_id, $duckShingles3 AS s FROM t WHERE len(w) >= 3)
         |SELECT a.doc_id AS id_1, b.doc_id AS id_2,
         |  round(len(list_intersect(a.s, b.s)) * 1.0 /
         |        (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 6) AS jaccard
         |FROM g a JOIN g b ON a.doc_id < b.doc_id
         |WHERE len(a.s) > 0 AND len(b.s) > 0 AND
         |      len(list_intersect(a.s, b.s)) * 1.0 /
         |      (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.5""".stripMargin,

    // global row_number over the same (first-3-token key, id) order; the
    // distributed two-phase rank must agree with the single window exactly
    "q_dedup_sorted_nbhd" ->
      s"""WITH t AS (SELECT doc_id, $toks AS w FROM documents),
         |k AS (SELECT doc_id, array_to_string(w[1:3], ' ') AS key,
         |    $duckShingles3 AS s FROM t),
         |r AS (SELECT *, row_number() OVER (ORDER BY key, doc_id) AS rn FROM k)
         |SELECT a.doc_id AS id_1, b.doc_id AS id_2,
         |  CAST(b.rn - a.rn AS BIGINT) AS rank_dist,
         |  CAST(len(list_intersect(a.s, b.s)) * 1000000 //
         |    (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) AS BIGINT) AS jaccard_ppm
         |FROM r a JOIN r b ON b.rn - a.rn BETWEEN 1 AND 3
         |WHERE len(a.s) > 0 AND len(b.s) > 0 AND
         |  len(list_intersect(a.s, b.s)) * 1000000 //
         |    (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 500000""".stripMargin,

    "q_dedup_minhash" ->
      s"""WITH t AS (SELECT doc_id, $toks AS w FROM documents),
         |g AS (SELECT doc_id, $duckShingles3 AS s FROM t)
         |SELECT a.doc_id AS id_1, b.doc_id AS id_2,
         |  round(len(list_intersect(a.s, b.s)) * 1.0 /
         |        (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 6) AS jaccard
         |FROM g a JOIN g b ON a.doc_id < b.doc_id
         |WHERE len(list_intersect(a.s, b.s)) * 1.0 /
         |      (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.5""".stripMargin,

    // brute-force cross Jaccard as truth (the q_dedup_minhash banding
    // argument); the test side re-derives the first-word-dropped text
    "q_decontaminate_fuzzy" ->
      s"""WITH t AS (SELECT doc_id, $toks AS w FROM documents),
         |g AS (SELECT doc_id, $duckShingles3 AS s FROM t),
         |tt AS (SELECT doc_id + 900000 AS doc_id,
         |    (regexp_split_to_array(trim(text), '\\s+'))[2:] AS w
         |  FROM documents WHERE doc_id % 25 = 0),
         |gt AS (SELECT doc_id, $duckShingles3 AS s FROM tt)
         |SELECT g.doc_id AS id_a, gt.doc_id AS id_b,
         |  round(len(list_intersect(g.s, gt.s)) * 1.0 /
         |        (len(g.s) + len(gt.s) - len(list_intersect(g.s, gt.s))), 6) AS jaccard
         |FROM g CROSS JOIN gt
         |WHERE len(list_intersect(g.s, gt.s)) * 1.0 /
         |      (len(g.s) + len(gt.s) - len(list_intersect(g.s, gt.s))) >= 0.5""".stripMargin,

    // Exact replication of the incremental-dedup admission rules; the
    // near-dup stages use exact all-pairs Jaccard >= 0.5 in place of the
    // LSH candidates (same justification as q_dedup_minhash's oracle).
    "q_dedup_incremental" ->
      s"""WITH corpus AS (SELECT doc_id, text FROM documents WHERE doc_id % 5 != 0),
         |batch AS (
         |  SELECT doc_id, text FROM documents WHERE doc_id % 5 = 0
         |  UNION ALL SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id % 7 = 3
         |  UNION ALL SELECT doc_id + 200000 AS doc_id, text FROM documents WHERE doc_id % 10 = 0),
         |bk AS (SELECT doc_id, text,
         |  md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS ck FROM batch),
         |ckeys AS (SELECT DISTINCT
         |  md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS ck FROM corpus),
         |flagged AS (SELECT bk.*, bk.ck IN (SELECT ck FROM ckeys) AS in_corpus FROM bk),
         |keepers AS (SELECT ck, min(doc_id) AS keep_id FROM flagged WHERE NOT in_corpus GROUP BY ck),
         |exact AS (SELECT f.doc_id, f.text,
         |    CASE WHEN f.in_corpus THEN 'dup_exact_corpus'
         |         WHEN f.doc_id != k.keep_id THEN 'dup_exact_batch' END AS es
         |  FROM flagged f LEFT JOIN keepers k USING (ck)),
         |survt AS (SELECT doc_id, $toks AS w FROM (SELECT doc_id, text FROM exact WHERE es IS NULL)),
         |sgg AS (SELECT doc_id, $duckShingles3 AS s FROM survt),
         |corpt AS (SELECT doc_id, $toks AS w FROM corpus),
         |cgg AS (SELECT doc_id, $duckShingles3 AS s FROM corpt),
         |nearc AS (SELECT DISTINCT a.doc_id FROM sgg a JOIN cgg b
         |  ON len(a.s) > 0 AND len(b.s) > 0 AND
         |     len(list_intersect(a.s, b.s)) * 1.0 /
         |     (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.5),
         |standing AS (SELECT * FROM sgg WHERE doc_id NOT IN (SELECT doc_id FROM nearc)),
         |nearb AS (SELECT DISTINCT b.doc_id FROM standing a JOIN standing b
         |  ON a.doc_id < b.doc_id AND len(a.s) > 0 AND len(b.s) > 0 AND
         |     len(list_intersect(a.s, b.s)) * 1.0 /
         |     (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.5)
         |SELECT e.doc_id, COALESCE(e.es,
         |  CASE WHEN e.doc_id IN (SELECT doc_id FROM nearc) THEN 'near_dup_corpus'
         |       WHEN e.doc_id IN (SELECT doc_id FROM nearb) THEN 'near_dup_batch'
         |       ELSE 'admitted' END) AS status
         |FROM exact e""".stripMargin,

    // the two-night artifact cycle: night 1 = q_dedup_incremental's rules
    // verbatim, then corpus2 = corpus + night-1 admissions, and night 2
    // replays the same rules for the re-submitted batch against corpus2
    "q_dedup_incr_update" ->
      s"""WITH corpus AS (SELECT doc_id, text FROM documents WHERE doc_id % 5 != 0),
         |batch AS (
         |  SELECT doc_id, text FROM documents WHERE doc_id % 5 = 0
         |  UNION ALL SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id % 7 = 3
         |  UNION ALL SELECT doc_id + 200000 AS doc_id, text FROM documents WHERE doc_id % 10 = 0),
         |bk AS (SELECT doc_id, text,
         |  md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS ck FROM batch),
         |ckeys AS (SELECT DISTINCT
         |  md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS ck FROM corpus),
         |flagged AS (SELECT bk.*, bk.ck IN (SELECT ck FROM ckeys) AS in_corpus FROM bk),
         |keepers AS (SELECT ck, min(doc_id) AS keep_id FROM flagged WHERE NOT in_corpus GROUP BY ck),
         |exact AS (SELECT f.doc_id, f.text,
         |    CASE WHEN f.in_corpus THEN 'dup_exact_corpus'
         |         WHEN f.doc_id != k.keep_id THEN 'dup_exact_batch' END AS es
         |  FROM flagged f LEFT JOIN keepers k USING (ck)),
         |survt AS (SELECT doc_id, $toks AS w FROM (SELECT doc_id, text FROM exact WHERE es IS NULL)),
         |sgg AS (SELECT doc_id, $duckShingles3 AS s FROM survt),
         |corpt AS (SELECT doc_id, $toks AS w FROM corpus),
         |cgg AS (SELECT doc_id, $duckShingles3 AS s FROM corpt),
         |nearc AS (SELECT DISTINCT a.doc_id FROM sgg a JOIN cgg b
         |  ON len(a.s) > 0 AND len(b.s) > 0 AND
         |     len(list_intersect(a.s, b.s)) * 1.0 /
         |     (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.5),
         |standing AS (SELECT * FROM sgg WHERE doc_id NOT IN (SELECT doc_id FROM nearc)),
         |nearb AS (SELECT DISTINCT b.doc_id FROM standing a JOIN standing b
         |  ON a.doc_id < b.doc_id AND len(a.s) > 0 AND len(b.s) > 0 AND
         |     len(list_intersect(a.s, b.s)) * 1.0 /
         |     (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.5),
         |dec1 AS (SELECT e.doc_id, COALESCE(e.es,
         |  CASE WHEN e.doc_id IN (SELECT doc_id FROM nearc) THEN 'near_dup_corpus'
         |       WHEN e.doc_id IN (SELECT doc_id FROM nearb) THEN 'near_dup_batch'
         |       ELSE 'admitted' END) AS status FROM exact e),
         |admitted1 AS (SELECT b.doc_id, b.text FROM batch b
         |  JOIN dec1 d USING (doc_id) WHERE d.status = 'admitted'),
         |corpus2 AS (SELECT doc_id, text FROM corpus
         |  UNION ALL SELECT doc_id, text FROM admitted1),
         |batch2 AS (SELECT doc_id + 300000 AS doc_id, text FROM batch),
         |bk2 AS (SELECT doc_id, text,
         |  md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS ck FROM batch2),
         |ckeys2 AS (SELECT DISTINCT
         |  md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS ck FROM corpus2),
         |flagged2 AS (SELECT bk2.*, bk2.ck IN (SELECT ck FROM ckeys2) AS in_corpus FROM bk2),
         |keepers2 AS (SELECT ck, min(doc_id) AS keep_id FROM flagged2 WHERE NOT in_corpus GROUP BY ck),
         |exact2 AS (SELECT f.doc_id, f.text,
         |    CASE WHEN f.in_corpus THEN 'dup_exact_corpus'
         |         WHEN f.doc_id != k.keep_id THEN 'dup_exact_batch' END AS es
         |  FROM flagged2 f LEFT JOIN keepers2 k USING (ck)),
         |survt2 AS (SELECT doc_id, $toks AS w FROM (SELECT doc_id, text FROM exact2 WHERE es IS NULL)),
         |sgg2 AS (SELECT doc_id, $duckShingles3 AS s FROM survt2),
         |corpt2 AS (SELECT doc_id, $toks AS w FROM corpus2),
         |cgg2 AS (SELECT doc_id, $duckShingles3 AS s FROM corpt2),
         |nearc2 AS (SELECT DISTINCT a.doc_id FROM sgg2 a JOIN cgg2 b
         |  ON len(a.s) > 0 AND len(b.s) > 0 AND
         |     len(list_intersect(a.s, b.s)) * 1.0 /
         |     (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.5),
         |standing2 AS (SELECT * FROM sgg2 WHERE doc_id NOT IN (SELECT doc_id FROM nearc2)),
         |nearb2 AS (SELECT DISTINCT b.doc_id FROM standing2 a JOIN standing2 b
         |  ON a.doc_id < b.doc_id AND len(a.s) > 0 AND len(b.s) > 0 AND
         |     len(list_intersect(a.s, b.s)) * 1.0 /
         |     (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.5)
         |SELECT e.doc_id, COALESCE(e.es,
         |  CASE WHEN e.doc_id IN (SELECT doc_id FROM nearc2) THEN 'near_dup_corpus'
         |       WHEN e.doc_id IN (SELECT doc_id FROM nearb2) THEN 'near_dup_batch'
         |       ELSE 'admitted' END) AS status
         |FROM exact2 e""".stripMargin,

    // connected components over the near-dup pair graph: recursive CTE
    // propagating every smaller reachable label, then min per node — equals
    // large-star/small-star's component-min labeling. Pair set = the exact
    // Jaccard pairs (same justification as q_dedup_minhash's oracle).
    "q_dedup_cluster" ->
      s"""WITH RECURSIVE t AS (SELECT doc_id, $toks AS w FROM documents),
         |g AS (SELECT doc_id, $duckShingles3 AS s FROM t),
         |p AS (SELECT a.doc_id AS id_1, b.doc_id AS id_2
         |      FROM g a JOIN g b ON a.doc_id < b.doc_id
         |      WHERE len(list_intersect(a.s, b.s)) * 1.0 /
         |            (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.5),
         |e AS (SELECT id_1 AS u, id_2 AS v FROM p UNION SELECT id_2, id_1 FROM p),
         |n AS (SELECT DISTINCT u AS id FROM e),
         |walk(id, label) AS (
         |  SELECT id, id FROM n
         |  UNION
         |  SELECT e.v, w.label FROM walk w JOIN e ON e.u = w.id WHERE w.label < e.v)
         |SELECT id, min(label) AS cluster_id, id = min(label) AS is_survivor
         |FROM walk GROUP BY id""".stripMargin,

    // fingerprint-blocked candidates, exact 3-gram Jaccard confirm
    "q_dedup_jaccard" ->
      s"""WITH t AS (SELECT doc_id, text, $toks AS w FROM documents),
         |f AS (SELECT doc_id,
         |  CASE WHEN len(w) < 5 THEN ${duckMd5Long("text")}
         |    ELSE list_min(list_transform(
         |      [w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4] for i in range(1, len(w) - 3)],
         |      g -> ${duckMd5Long("g")})) END AS fp,
         |  $duckShingles3 AS s FROM t)
         |SELECT a.doc_id AS id_1, b.doc_id AS id_2,
         |  round(len(list_intersect(a.s, b.s)) * 1.0 /
         |        (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 6) AS jaccard
         |FROM f a JOIN f b ON a.fp = b.fp AND a.doc_id < b.doc_id
         |WHERE len(a.s) > 0 AND len(b.s) > 0""".stripMargin,

    // exact pair space on the BOUNDED id window (eval discipline — the
    // window is the full corpus at sf0.01, capped beyond it)
    "q_dedup_embed_exact" ->
      """WITH v AS (SELECT vec_id, list_transform(embedding::DOUBLE[], x -> CAST(round(x * 1000) AS BIGINT)) AS qv FROM embeddings WHERE vec_id < 1000),
        |p AS (SELECT a.vec_id AS id_1, b.vec_id AS id_2,
        |        CAST(list_dot_product(a.qv, b.qv) AS BIGINT) AS dot,
        |        list_dot_product(a.qv, b.qv) /
        |          (sqrt(list_dot_product(a.qv, a.qv)) * sqrt(list_dot_product(b.qv, b.qv))) AS cos
        |      FROM v a JOIN v b ON a.vec_id < b.vec_id)
        |SELECT id_1, id_2, dot, round(cos, 6) AS cosine FROM p WHERE cos >= 0.4""".stripMargin,

    "q_top_tokens" ->
      s"""SELECT token, CAST(count(*) AS BIGINT) AS n
         |FROM (SELECT unnest($toks) AS token FROM documents)
         |GROUP BY token ORDER BY n DESC, token LIMIT 20""".stripMargin,

    // first-occurrence doc per token → 50-doc buckets; cumulative sums
    // windowed BEFORE the introducing-bucket filter
    "q_vocab_growth" ->
      s"""WITH en AS (SELECT doc_id,
         |    text || ' u' || doc_id || ' m' || (doc_id*doc_id % 997) AS text
         |  FROM documents),
         |tk AS (SELECT doc_id, unnest($toks) AS tok FROM en),
         |fo AS (SELECT tok, min(doc_id) AS d FROM tk GROUP BY 1),
         |nb AS (SELECT d // 50 AS b, CAST(count(*) AS BIGINT) AS n_new FROM fo GROUP BY 1),
         |tb AS (SELECT doc_id // 50 AS b, CAST(count(*) AS BIGINT) AS n_tok
         |  FROM tk GROUP BY 1),
         |j AS (SELECT tb.b, coalesce(n_new, 0) AS n_new, n_tok
         |  FROM tb LEFT JOIN nb USING (b)),
         |c AS (SELECT b, n_new,
         |    CAST(sum(n_new) OVER w AS BIGINT) AS cum_vocab,
         |    CAST(sum(n_tok) OVER w AS BIGINT) AS cum_tokens
         |  FROM j WINDOW w AS (ORDER BY b ROWS UNBOUNDED PRECEDING))
         |SELECT b * 50 AS bucket_start, n_new, cum_vocab, cum_tokens
         |FROM c WHERE n_new > 0""".stripMargin,

    // the mask-spread interleave replayed stepwise in CTE columns — the
    // same masks/shifts as ZOrder.spread16, operands all non-negative so
    // DuckDB // equals Spark div in the scaling
    "q_zorder" ->
      """WITH b AS (SELECT min(doc_id) AS a0, max(doc_id) AS a1,
        |    min(n_chars) AS b0, max(n_chars) AS b1 FROM documents),
        |s AS (SELECT doc_id,
        |    CASE WHEN a1 <= a0 THEN 0 ELSE ((doc_id - a0) * 65536) // (a1 - a0 + 1) END AS sa,
        |    CASE WHEN b1 <= b0 THEN 0 ELSE ((n_chars - b0) * 65536) // (b1 - b0 + 1) END AS sb
        |  FROM documents, b),
        |p1 AS (SELECT doc_id, sa & 65535 AS xa, sb & 65535 AS xb FROM s),
        |p2 AS (SELECT doc_id, (xa | (xa << 8)) & 16711935 AS xa, (xb | (xb << 8)) & 16711935 AS xb FROM p1),
        |p3 AS (SELECT doc_id, (xa | (xa << 4)) & 252645135 AS xa, (xb | (xb << 4)) & 252645135 AS xb FROM p2),
        |p4 AS (SELECT doc_id, (xa | (xa << 2)) & 858993459 AS xa, (xb | (xb << 2)) & 858993459 AS xb FROM p3),
        |p5 AS (SELECT doc_id, (xa | (xa << 1)) & 1431655765 AS xa, (xb | (xb << 1)) & 1431655765 AS xb FROM p4)
        |SELECT doc_id, CAST(xa | (xb << 1) AS BIGINT) AS z FROM p5""".stripMargin,

    // bigram PMI in bit lengths: bl(C_ab) + 2·bl(T) − bl(B) − bl(C_a) −
    // bl(C_b); totals computed before the min-count cut
    "q_collocations" ->
      s"""WITH w AS (SELECT $toks AS w FROM documents),
         |u AS (SELECT t, CAST(count(*) AS BIGINT) AS n
         |  FROM (SELECT unnest(w) AS t FROM w) WHERE t <> '' GROUP BY t),
         |bp AS (SELECT p FROM (SELECT unnest([{'a': w[i], 'b': w[i+1]}
         |    for i in range(1, len(w))]) AS p FROM w)
         |  WHERE p.a <> '' AND p.b <> ''),
         |ba AS (SELECT p.a AS word_a, p.b AS word_b,
         |    CAST(count(*) AS BIGINT) AS n_pair FROM bp GROUP BY 1, 2),
         |tt AS (SELECT (SELECT CAST(sum(n) AS BIGINT) FROM u) AS t_total,
         |           (SELECT CAST(sum(n_pair) AS BIGINT) FROM ba) AS b_total)
         |SELECT ba.word_a, ba.word_b, ba.n_pair, ua.n AS n_a, ub.n AS n_b,
         |  CAST(length(bin(ba.n_pair)) + 2 * length(bin(tt.t_total))
         |    - length(bin(tt.b_total)) - length(bin(ua.n))
         |    - length(bin(ub.n)) AS BIGINT) AS pmi_bits
         |FROM ba JOIN u ua ON ua.t = ba.word_a JOIN u ub ON ub.t = ba.word_b
         |  CROSS JOIN tt
         |WHERE ba.n_pair >= 5
         |ORDER BY ba.n_pair DESC, ba.word_a, ba.word_b LIMIT 20""".stripMargin,

    // same (doc, token, count) collapse, df over doc-distinct pairs, and
    // integer floor weights as the Spark plan
    "q_rare_tokens" ->
      s"""WITH o AS (SELECT doc_id, unnest($toks) AS tok FROM documents),
         |occ AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS cnt FROM o GROUP BY 1, 2),
         |dfs AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM occ GROUP BY tok)
         |SELECT doc_id AS id, CAST(sum(cnt) AS BIGINT) AS n_tokens,
         |  CAST(sum(CASE WHEN df <= 50 THEN cnt ELSE 0 END) AS BIGINT) AS n_rare,
         |  CAST(floor(sum(CASE WHEN df <= 50 THEN cnt ELSE 0 END) * 1000000.0 / sum(cnt)) AS BIGINT) AS rare_ppm,
         |  CAST(sum(cnt * CAST(floor(1000000.0 / df) AS BIGINT)) AS BIGINT) AS df_score
         |FROM occ JOIN dfs USING (tok) GROUP BY doc_id""".stripMargin,

    // LM from the reference half only; unseen-bigram surprisal is the
    // scalar length(bin(N+1)) with N from token counts, never an explode
    "q_lm_cross_score" ->
      s"""WITH ref AS (SELECT $toks AS w FROM documents WHERE length(source) = 4),
         |g AS (SELECT bg, CAST(count(*) AS BIGINT) AS cb FROM (
         |    SELECT unnest(list_transform(range(1, len(w)),
         |      i -> w[i] || ' ' || w[i+1])) AS bg FROM ref) GROUP BY 1),
         |lm AS (SELECT bg,
         |  CAST(length(bin(sum(cb) OVER (PARTITION BY split_part(bg, ' ', 1))))
         |    - length(bin(cb)) AS BIGINT) AS surp FROM g),
         |u AS (SELECT CAST(length(bin(COALESCE(sum(greatest(len(w) - 1, 0)), 0) + 1))
         |    AS BIGINT) AS unseen_surp FROM ref),
         |t AS (SELECT doc_id, unnest(list_transform(range(1, len(w)),
         |      i -> w[i] || ' ' || w[i+1])) AS bg
         |  FROM (SELECT doc_id, $toks AS w FROM documents
         |        WHERE length(source) = 5 AND doc_id IS NOT NULL))
         |SELECT doc_id AS id, CAST(count(*) AS BIGINT) AS n_bigrams,
         |  CAST(sum(COALESCE(surp, unseen_surp)) AS BIGINT) AS surprisal,
         |  CAST(floor(sum(COALESCE(surp, unseen_surp)) * 1000000.0 / count(*)) AS BIGINT)
         |    AS mean_surprisal_ppm,
         |  CAST(sum(CASE WHEN surp IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_unseen
         |FROM t LEFT JOIN lm USING (bg), u GROUP BY doc_id""".stripMargin,

    // the q_dsir_score chain + shift-based acceptance and the salted coin
    "q_dsir_resample" ->
      s"""WITH t AS (SELECT doc_id, source, $toks AS w FROM documents
         |    WHERE doc_id IS NOT NULL),
         |o AS (SELECT doc_id, is_target, ${duckMd5Long("bg")} % 512 AS fb,
         |    CAST(count(*) AS BIGINT) AS cnt FROM (
         |    SELECT doc_id, (source = 'src0') AS is_target,
         |      unnest(list_transform(range(1, len(w)),
         |        i -> w[i] || ' ' || w[i+1])) AS bg FROM t)
         |  GROUP BY 1, 2, 3),
         |wt AS (SELECT fb, CAST(sum(cnt) AS BIGINT) AS cs,
         |    CAST(sum(CASE WHEN is_target THEN cnt ELSE 0 END) AS BIGINT) AS ct
         |  FROM o GROUP BY 1),
         |ww AS (SELECT fb,
         |  CAST((length(bin(ct + 1)) - length(bin(sum(ct) OVER () + 1))) -
         |       (length(bin(cs + 1)) - length(bin(sum(cs) OVER () + 1))) AS BIGINT) AS w
         |  FROM wt),
         |sc AS (SELECT doc_id AS id, CAST(sum(cnt * w) AS BIGINT) AS dsir_score
         |  FROM o JOIN ww USING (fb) GROUP BY 1),
         |p AS (SELECT id, dsir_score,
         |  least(1000000, CASE WHEN dsir_score >= 0
         |    THEN 250000 << least(dsir_score, 20)
         |    ELSE 250000 >> least(-dsir_score, 20) END) AS p_ppm FROM sc)
         |SELECT id, dsir_score, CAST(p_ppm AS BIGINT) AS p_ppm,
         |  (${duckMd5Long("'dsir:' || id")} % 1000000) < p_ppm AS accepted
         |FROM p""".stripMargin,

    // bigram LM replicated exactly: same (doc, bigram, count) collapse,
    // bigram df as doc-distinct row count, context counts as a window over
    // the distinct-bigram table, and length(bin(x)) as the integer log2
    "q_lm_surprisal" ->
      s"""WITH t AS (SELECT doc_id, $toks AS w FROM documents
         |    WHERE doc_id IS NOT NULL),
         |o AS (SELECT doc_id, bg, CAST(count(*) AS BIGINT) AS cnt FROM (
         |    SELECT doc_id, unnest(list_transform(range(1, len(w)),
         |      i -> w[i] || ' ' || w[i+1])) AS bg FROM t)
         |  GROUP BY 1, 2),
         |g AS (SELECT bg, CAST(sum(cnt) AS BIGINT) AS cb,
         |    CAST(count(*) AS BIGINT) AS bdf FROM o GROUP BY 1),
         |s AS (SELECT bg, bdf,
         |  CAST(length(bin(sum(cb) OVER (PARTITION BY split_part(bg, ' ', 1))))
         |    - length(bin(cb)) AS BIGINT) AS surp FROM g)
         |SELECT doc_id AS id, CAST(sum(cnt) AS BIGINT) AS n_bigrams,
         |  CAST(sum(cnt * surp) AS BIGINT) AS surprisal,
         |  CAST(floor(sum(cnt * surp) * 1000000.0 / sum(cnt)) AS BIGINT) AS mean_surprisal_ppm,
         |  CAST(sum(CASE WHEN bdf = 1 THEN cnt ELSE 0 END) AS BIGINT) AS n_novel
         |FROM o JOIN s USING (bg) GROUP BY doc_id""".stripMargin,

    // DSIR weights replicated exactly: hashed-bigram buckets, add-one
    // smoothed target/corpus counts, bit-length log2 ratio, global totals
    // as windows over the bucket table
    "q_dsir_score" ->
      s"""WITH t AS (SELECT doc_id, source, $toks AS w FROM documents
         |    WHERE doc_id IS NOT NULL),
         |o AS (SELECT doc_id, is_target, ${duckMd5Long("bg")} % 512 AS fb,
         |    CAST(count(*) AS BIGINT) AS cnt FROM (
         |    SELECT doc_id, (source = 'src0') AS is_target,
         |      unnest(list_transform(range(1, len(w)),
         |        i -> w[i] || ' ' || w[i+1])) AS bg FROM t)
         |  GROUP BY 1, 2, 3),
         |wt AS (SELECT fb, CAST(sum(cnt) AS BIGINT) AS cs,
         |    CAST(sum(CASE WHEN is_target THEN cnt ELSE 0 END) AS BIGINT) AS ct
         |  FROM o GROUP BY 1),
         |ww AS (SELECT fb,
         |  CAST((length(bin(ct + 1)) - length(bin(sum(ct) OVER () + 1))) -
         |       (length(bin(cs + 1)) - length(bin(sum(cs) OVER () + 1))) AS BIGINT) AS w
         |  FROM wt)
         |SELECT doc_id AS id, is_target, CAST(sum(cnt) AS BIGINT) AS n_feats,
         |  CAST(sum(cnt * w) AS BIGINT) AS dsir_score
         |FROM o JOIN ww USING (fb) GROUP BY 1, 2""".stripMargin,

    // Naive-Bayes training replicated exactly: add-one-smoothed
    // class-conditional bucket counts over the dense label x bucket grid,
    // bit-length log2 weights, doc-count priors; per-label totals as
    // windows over the aggregate rows
    "q_nb_train" ->
      s"""WITH lab AS (SELECT lang AS label, $toks AS w FROM documents
         |    WHERE doc_id IS NOT NULL AND lang IS NOT NULL AND doc_id % 2 = 0),
         |pw AS (SELECT label,
         |    CAST(length(bin(d)) - length(bin(sum(d) OVER ())) AS BIGINT) AS prior_w
         |  FROM (SELECT label, CAST(count(*) AS BIGINT) AS d FROM lab GROUP BY 1)),
         |o AS (SELECT label, ${duckMd5Long("bg")} % 512 AS fb,
         |    CAST(count(*) AS BIGINT) AS c FROM (
         |    SELECT label, unnest(list_transform(range(1, len(w)),
         |      i -> w[i] || ' ' || w[i+1])) AS bg FROM lab)
         |  GROUP BY 1, 2),
         |m AS (SELECT g.label, g.fb, COALESCE(o.c, 0) AS c, g.prior_w
         |  FROM (SELECT label, prior_w, r.fb FROM pw
         |        CROSS JOIN (SELECT unnest(range(512)) AS fb) r) g
         |  LEFT JOIN o ON g.label = o.label AND g.fb = o.fb)
         |SELECT label, CAST(fb AS BIGINT) AS fb,
         |  CAST(length(bin(c + 1)) -
         |       length(bin(sum(c) OVER (PARTITION BY label) + 512)) AS BIGINT) AS w,
         |  prior_w
         |FROM m""".stripMargin,

    // the inference half: same model CTEs, held-out split scored as
    // prior + sum(cnt * w) per label, argmax via (score DESC, label DESC)
    // row_number — identical to Spark's max(struct(score, label))
    "q_nb_classify" ->
      s"""WITH lab AS (SELECT lang AS label, $toks AS w FROM documents
         |    WHERE doc_id IS NOT NULL AND lang IS NOT NULL AND doc_id % 2 = 0),
         |pw AS (SELECT label,
         |    CAST(length(bin(d)) - length(bin(sum(d) OVER ())) AS BIGINT) AS prior_w
         |  FROM (SELECT label, CAST(count(*) AS BIGINT) AS d FROM lab GROUP BY 1)),
         |o AS (SELECT label, ${duckMd5Long("bg")} % 512 AS fb,
         |    CAST(count(*) AS BIGINT) AS c FROM (
         |    SELECT label, unnest(list_transform(range(1, len(w)),
         |      i -> w[i] || ' ' || w[i+1])) AS bg FROM lab)
         |  GROUP BY 1, 2),
         |mdl AS (SELECT label, fb,
         |    CAST(length(bin(c + 1)) -
         |         length(bin(sum(c) OVER (PARTITION BY label) + 512)) AS BIGINT) AS w,
         |    prior_w
         |  FROM (SELECT g.label, g.fb, COALESCE(o.c, 0) AS c, g.prior_w
         |    FROM (SELECT label, prior_w, r.fb FROM pw
         |          CROSS JOIN (SELECT unnest(range(512)) AS fb) r) g
         |    LEFT JOIN o ON g.label = o.label AND g.fb = o.fb)),
         |tgt AS (SELECT doc_id, $toks AS w FROM documents
         |    WHERE doc_id IS NOT NULL AND doc_id % 2 = 1),
         |ot AS (SELECT doc_id, ${duckMd5Long("bg")} % 512 AS fb,
         |    CAST(count(*) AS BIGINT) AS cnt FROM (
         |    SELECT doc_id, unnest(list_transform(range(1, len(w)),
         |      i -> w[i] || ' ' || w[i+1])) AS bg FROM tgt)
         |  GROUP BY 1, 2),
         |sc AS (SELECT doc_id, label,
         |    CAST(max(prior_w) + sum(cnt * w) AS BIGINT) AS nb_score,
         |    CAST(sum(cnt) AS BIGINT) AS n_feats
         |  FROM ot JOIN mdl USING (fb) GROUP BY 1, 2),
         |r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
         |    ORDER BY nb_score DESC, label DESC) AS rn FROM sc)
         |SELECT doc_id AS id, label, nb_score, n_feats FROM r WHERE rn = 1""".stripMargin,

    // URL normalization checked analytically: every expected field derives
    // from the synthesis formulas (the operator's regex machinery never
    // runs oracle-side)
    "q_url_parse" ->
      s"""WITH $urlDerived
         |SELECT id, valid,
         |  CASE WHEN valid THEN scheme END AS scheme,
         |  CASE WHEN valid THEN host END AS host,
         |  CASE WHEN valid THEN port END AS port,
         |  CASE WHEN valid THEN reg_domain END AS reg_domain,
         |  CASE WHEN valid THEN path END AS path,
         |  CASE WHEN valid THEN query_clean END AS query_clean,
         |  CASE WHEN valid THEN clean_url END AS clean_url
         |FROM cu""".stripMargin,

    // the composed gate: valid rows, blocklist drop, then the
    // samplePerGroup coin replicated as (md5 coin ASC, id ASC) row_number
    "q_url_curate" ->
      s"""WITH $urlDerived,
         |v AS (SELECT id, reg_domain, clean_url,
         |    ${duckMd5Long("'url:' || CAST(id AS VARCHAR)")} AS h
         |  FROM cu WHERE valid AND reg_domain <> 'spam.click'),
         |r AS (SELECT id, reg_domain, clean_url,
         |    row_number() OVER (PARTITION BY reg_domain ORDER BY h, id) - 1 AS rk
         |  FROM v)
         |SELECT id, reg_domain, clean_url, CAST(rk AS BIGINT) AS rk
         |FROM r WHERE rk < 15""".stripMargin,

    // grams joined as strings ≡ Spark's collision-free md5long gram hashes
    // (the q_decontaminate justification)
    "q_boilerplate" ->
      s"""WITH t AS (SELECT doc_id, $toks AS w FROM documents),
         |g AS (SELECT doc_id, $duckShingles3 AS s FROM t),
         |e AS (SELECT doc_id, unnest(s) AS gram FROM g WHERE len(s) > 0),
         |dfs AS (SELECT gram, CAST(count(*) AS BIGINT) AS df FROM e GROUP BY gram)
         |SELECT doc_id AS id, CAST(count(*) AS BIGINT) AS n_grams,
         |  CAST(sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_common,
         |  CAST(floor(sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) * 1000000.0 / count(*)) AS BIGINT) AS common_ppm
         |FROM e JOIN dfs USING (gram) GROUP BY doc_id""".stripMargin,

    // scalar per-term dfs (the Spark side collects the same <= 3 aggregate
    // rows), integer-division weights, (score DESC, id) top-15
    "q_search_topk" ->
      s"""WITH t AS (SELECT doc_id, $toks AS w FROM documents),
         |dfs AS (SELECT
         |  (SELECT count(*) FROM t WHERE list_contains(w, 'dup')) AS df_dup,
         |  (SELECT count(*) FROM t WHERE list_contains(w, 'vector')) AS df_vector,
         |  (SELECT count(*) FROM t WHERE list_contains(w, 'slow')) AS df_slow),
         |s AS (SELECT doc_id,
         |  len(list_filter(w, x -> x = 'dup'))
         |    * (CASE WHEN df_dup > 0 THEN 1000000 // df_dup ELSE 0 END) +
         |  len(list_filter(w, x -> x = 'vector'))
         |    * (CASE WHEN df_vector > 0 THEN 1000000 // df_vector ELSE 0 END) +
         |  len(list_filter(w, x -> x = 'slow'))
         |    * (CASE WHEN df_slow > 0 THEN 1000000 // df_slow ELSE 0 END) AS score
         |  FROM t, dfs)
         |SELECT doc_id AS id, CAST(score AS BIGINT) AS score FROM s
         |WHERE score > 0 ORDER BY score DESC, id LIMIT 15""".stripMargin,

    // BM25 in exact rationals: sat = 22·tf·avgdl·1e6 // (10·tf·avgdl +
    // 3·avgdl + 9·dl), per-term score = sat·floor(1e6/df) // 1e6
    "q_search_bm25" -> {
      def term(t: String) =
        s"""(((tf_$t * (22000000 * avgdl)) // (tf_$t * 10 * avgdl + 3 * avgdl + 9 * dl))
           |    * (CASE WHEN df_$t > 0 THEN 1000000 // df_$t ELSE 0 END)) // 1000000""".stripMargin
      s"""WITH t AS (SELECT doc_id, $toks AS w FROM documents),
         |st AS (SELECT greatest(CAST(sum(len(w)) AS BIGINT) // count(*), 1) AS avgdl FROM t),
         |dfs AS (SELECT
         |  (SELECT count(*) FROM t WHERE list_contains(w, 'dup')) AS df_dup,
         |  (SELECT count(*) FROM t WHERE list_contains(w, 'vector')) AS df_vector,
         |  (SELECT count(*) FROM t WHERE list_contains(w, 'slow')) AS df_slow),
         |tf AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS dl,
         |  CAST(len(list_filter(w, x -> x = 'dup')) AS BIGINT) AS tf_dup,
         |  CAST(len(list_filter(w, x -> x = 'vector')) AS BIGINT) AS tf_vector,
         |  CAST(len(list_filter(w, x -> x = 'slow')) AS BIGINT) AS tf_slow FROM t),
         |s AS (SELECT doc_id,
         |  ${term("dup")} +
         |  ${term("vector")} +
         |  ${term("slow")} AS score
         |  FROM tf, st, dfs)
         |SELECT doc_id AS id, CAST(score AS BIGINT) AS score FROM s
         |WHERE score > 0 ORDER BY score DESC, id LIMIT 15""".stripMargin
    },

    // the bounded head agg ranks (-id DESC, id ASC) ≡ id ASC — the window
    // spelling is the oracle, not the plan
    "q_postings" ->
      s"""WITH o AS (SELECT doc_id, unnest($toks) AS tok FROM documents),
         |occ AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS cnt FROM o GROUP BY 1, 2),
         |r AS (SELECT tok, doc_id, cnt,
         |        row_number() OVER (PARTITION BY tok ORDER BY doc_id) AS rn,
         |        count(*) OVER (PARTITION BY tok) AS df,
         |        sum(cnt) OVER (PARTITION BY tok) AS tf
         |      FROM occ)
         |SELECT tok AS token, CAST(df AS BIGINT) AS df, CAST(tf AS BIGINT) AS tf,
         |  CAST(rn - 1 AS BIGINT) AS rank, doc_id AS head_id
         |FROM r WHERE rn <= 8""".stripMargin,

    // incremental == rebuild: the oracle is q_postings' full-corpus
    // derivation verbatim
    "q_postings_incr" ->
      s"""WITH o AS (SELECT doc_id, unnest($toks) AS tok FROM documents),
         |occ AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS cnt FROM o GROUP BY 1, 2),
         |r AS (SELECT tok, doc_id, cnt,
         |        row_number() OVER (PARTITION BY tok ORDER BY doc_id) AS rn,
         |        count(*) OVER (PARTITION BY tok) AS df,
         |        sum(cnt) OVER (PARTITION BY tok) AS tf
         |      FROM occ)
         |SELECT tok AS token, CAST(df AS BIGINT) AS df, CAST(tf AS BIGINT) AS tf,
         |  CAST(rn - 1 AS BIGINT) AS rank, doc_id AS head_id
         |FROM r WHERE rn <= 8""".stripMargin,

    "q_embed_stats" ->
      """WITH v AS (SELECT label,
        |    CAST(len(embedding) AS BIGINT) AS dim,
        |    CAST(list_dot_product(
        |      list_transform(embedding::DOUBLE[], x -> CAST(round(x * 1000) AS BIGINT)),
        |      list_transform(embedding::DOUBLE[], x -> CAST(round(x * 1000) AS BIGINT))) AS BIGINT) AS n2
        |  FROM embeddings)
        |SELECT label, CAST(count(*) AS BIGINT) AS n_vecs, max(dim) AS dim,
        |  min(n2) AS min_norm2, max(n2) AS max_norm2,
        |  round(avg(n2), 6) AS avg_norm2
        |FROM v GROUP BY label""".stripMargin,

    "q_split_assign" -> {
      val coin = s"${duckMd5Long("'split:' || CAST(doc_id AS VARCHAR)")} % 1000000"
      s"""SELECT doc_id, source,
         |  CASE WHEN $coin < 900000 THEN 'train'
         |       WHEN $coin < 950000 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM documents""".stripMargin
    },

    // union of the MinHash-confirmed 3-gram-Jaccard pair graph (brute-force
    // truth — the banding recall argument) and the SRP-LSH-candidate
    // embedding pair graph (sizing rule + hyperplanes replicated exactly),
    // then the same min-label walk — clusters may chain across the signals
    "q_hybrid_dedup" ->
      s"""WITH RECURSIVE t AS (SELECT doc_id, $toks AS w FROM documents),
         |g AS (SELECT doc_id, $duckShingles3 AS s FROM t),
         |lex AS (SELECT a.doc_id AS id_1, b.doc_id AS id_2
         |      FROM g a JOIN g b ON a.doc_id < b.doc_id
         |      WHERE len(list_intersect(a.s, b.s)) * 1.0 /
         |            (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.5),
         |v AS (SELECT vec_id, list_transform(embedding::DOUBLE[], x -> CAST(round(x * 1000) AS BIGINT)) AS qv FROM embeddings),
         |pl AS (${srpPlanesSql("embeddings")}),
         |bk AS (${srpBucketsSqlAuto(16, 64)}),
         |sc AS (SELECT DISTINCT a.vec_id AS id_1, b.vec_id AS id_2
         |      FROM bk a JOIN bk b ON a.tbl = b.tbl AND a.bkt = b.bkt AND a.vec_id < b.vec_id),
         |sem AS (SELECT id_1, id_2
         |      FROM sc JOIN v va ON va.vec_id = sc.id_1 JOIN v vb ON vb.vec_id = sc.id_2
         |      WHERE list_dot_product(va.qv, vb.qv) /
         |        (sqrt(list_dot_product(va.qv, va.qv)) * sqrt(list_dot_product(vb.qv, vb.qv))) >= 0.4),
         |p AS (SELECT * FROM lex UNION SELECT * FROM sem),
         |e AS (SELECT id_1 AS u, id_2 AS v FROM p UNION SELECT id_2, id_1 FROM p),
         |n AS (SELECT DISTINCT u AS id FROM e),
         |walk(id, label) AS (
         |  SELECT id, id FROM n
         |  UNION
         |  SELECT e.v, w.label FROM walk w JOIN e ON e.u = w.id WHERE w.label < e.v)
         |SELECT id, min(label) AS cluster_id, id = min(label) AS is_survivor
         |FROM walk GROUP BY id""".stripMargin,

    // SRP-LSH-candidate embedding pair graph (auto-sized depth, exact
    // confirm) + the same min-label walk as q_dedup_cluster — components
    // over semantic (cosine) duplicates on the production path
    "q_semantic_dedup" ->
      s"""WITH RECURSIVE v AS ($qvCte),
        |pl AS (${srpPlanesSql("embeddings")}),
        |bk AS (${srpBucketsSqlAuto(16, 64)}),
        |sc AS (SELECT DISTINCT a.vec_id AS id_1, b.vec_id AS id_2
        |      FROM bk a JOIN bk b ON a.tbl = b.tbl AND a.bkt = b.bkt AND a.vec_id < b.vec_id),
        |p AS (SELECT id_1, id_2
        |      FROM sc JOIN v va ON va.vec_id = sc.id_1 JOIN v vb ON vb.vec_id = sc.id_2
        |      WHERE list_dot_product(va.qv, vb.qv) /
        |        (sqrt(list_dot_product(va.qv, va.qv)) * sqrt(list_dot_product(vb.qv, vb.qv))) >= 0.4),
        |e AS (SELECT id_1 AS u, id_2 AS v FROM p UNION SELECT id_2, id_1 FROM p),
        |n AS (SELECT DISTINCT u AS id FROM e),
        |walk(id, label) AS (
        |  SELECT id, id FROM n
        |  UNION
        |  SELECT e.v, w.label FROM walk w JOIN e ON e.u = w.id WHERE w.label < e.v)
        |SELECT id, min(label) AS cluster_id, id = min(label) AS is_survivor
        |FROM walk GROUP BY id""".stripMargin,

    "q_dedup_simhash" -> {
      val bits = (0 until 60).map { j =>
        s"(CASE WHEN list_sum(list_transform(h, x -> CASE WHEN (x >> $j) & 1 = 1 THEN 1 ELSE -1 END)) > 0 THEN ${1L << j} ELSE 0 END)"
      }.mkString(" + ")
      s"""WITH t AS (SELECT doc_id, list_transform($toks, x -> ${duckMd5Long("x")}) AS h FROM documents)
         |SELECT doc_id, CAST($bits AS BIGINT) AS simhash FROM t""".stripMargin
    },

    // replays the greedy packing sequentially per bucket via recursive CTE
    "q_seq_pack" -> {
      val bucket = s"${duckMd5Long("'pack:' || CAST(doc_id AS VARCHAR)")} % 8"
      s"""WITH RECURSIVE b AS (
         |  SELECT $bucket AS bucket, doc_id AS id, CAST(len($toks) AS BIGINT) AS t
         |  FROM documents),
         |o AS (SELECT *, row_number() OVER (PARTITION BY bucket ORDER BY id) AS rn FROM b),
         |r AS (
         |  SELECT bucket, id, t, rn, CAST(0 AS BIGINT) AS seq, t AS acc
         |  FROM o WHERE rn = 1
         |  UNION ALL
         |  SELECT o.bucket, o.id, o.t, o.rn,
         |         CASE WHEN r.acc + o.t > 512 THEN r.seq + 1 ELSE r.seq END,
         |         CASE WHEN r.acc + o.t > 512 THEN o.t ELSE r.acc + o.t END
         |  FROM r JOIN o ON o.bucket = r.bucket AND o.rn = r.rn + 1)
         |SELECT bucket * 1099511627776 + seq AS seq_id, id AS doc_id,
         |  CAST(count(*) OVER (PARTITION BY bucket, seq) AS BIGINT) AS n_docs,
         |  CAST(sum(t) OVER (PARTITION BY bucket, seq) AS BIGINT) AS n_tokens
         |FROM r""".stripMargin
    },

    "q_corpus_stats" ->
      s"""WITH t AS (SELECT source, CAST(len($toks) AS BIGINT) AS t FROM documents)
         |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(t) AS BIGINT) AS total_tokens,
         |  min(t) AS min_tokens, max(t) AS max_tokens,
         |  round(quantile_cont(t, 0.5), 6) AS median_tokens
         |FROM t GROUP BY source""".stripMargin,

    "q_data_mix" -> {
      val coin = s"${duckMd5Long("'mix:' || CAST(doc_id AS VARCHAR)")} % 1000000"
      s"""WITH c AS (SELECT doc_id, source, $coin AS coin FROM documents),
         |n AS (SELECT doc_id, source,
         |        CASE source
         |          WHEN 'src0' THEN 2 + CASE WHEN coin < 500000 THEN 1 ELSE 0 END
         |          WHEN 'src1' THEN 1
         |          WHEN 'src2' THEN CASE WHEN coin < 500000 THEN 1 ELSE 0 END
         |          ELSE CASE WHEN coin < 250000 THEN 1 ELSE 0 END END AS n
         |      FROM c)
         |SELECT doc_id, source, CAST(unnest(range(n)) AS BIGINT) AS copy_idx
         |FROM n WHERE n > 0""".stripMargin
    },

    // grams joined as strings ≡ Spark's collision-free md5long gram hashes
    "q_decontaminate" -> {
      s"""WITH t AS (SELECT doc_id, $toks AS w FROM documents),
         |g AS (SELECT doc_id, $duckShingles3 AS s FROM t),
         |bg AS (SELECT DISTINCT unnest(s) AS gram FROM g WHERE doc_id % 50 = 0),
         |cg AS (SELECT doc_id, unnest(s) AS gram FROM g WHERE doc_id % 50 <> 0),
         |h AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hits
         |      FROM cg JOIN bg USING (gram) GROUP BY doc_id)
         |SELECT g.doc_id AS id, CAST(len(s) AS BIGINT) AS n_grams, n_hits,
         |  round(n_hits * 1.0 / len(s), 6) AS contamination
         |FROM g JOIN h ON g.doc_id = h.doc_id WHERE g.doc_id % 50 <> 0""".stripMargin
    },

    // exact argmax with (dot DESC, cid ASC) tie-break = the struct-sort
    "q_classify_embed" ->
      """WITH v AS (SELECT vec_id, list_transform(embedding::DOUBLE[], x -> CAST(round(x * 1000) AS BIGINT)) AS qv FROM embeddings),
        |c AS (SELECT vec_id AS cid, qv AS cv FROM v WHERE vec_id < 8),
        |j AS (SELECT v.vec_id, c.cid, CAST(list_dot_product(v.qv, c.cv) AS BIGINT) AS dot
        |      FROM v CROSS JOIN c),
        |r AS (SELECT vec_id, CAST(cid AS BIGINT) AS cid, dot,
        |  row_number() OVER (PARTITION BY vec_id ORDER BY dot DESC, cid ASC) AS rn FROM j)
        |SELECT vec_id, cid, dot FROM r WHERE rn = 1""".stripMargin,

    "q_sim_topk" ->
      """WITH v AS (SELECT vec_id, list_transform(embedding::DOUBLE[], x -> CAST(round(x * 1000) AS BIGINT)) AS qv FROM embeddings),
        |j AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |        CAST(list_dot_product(q.qv, c.qv) AS BIGINT) AS dot,
        |        list_dot_product(q.qv, c.qv) /
        |          (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(c.qv, c.qv))) AS cos
        |      FROM v q JOIN v c ON q.vec_id < 10 AND c.vec_id <> q.vec_id)
        |SELECT query_id, neighbor_id, dot, round(cos, 6) AS cosine FROM j
        |QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY dot DESC, neighbor_id) <= 5""".stripMargin,

    // the q_classify_embed assignment (fixed first-8 centroids) joined to
    // each doc's tokens, per-cluster (count DESC, token ASC) top-3
    "q_cluster_terms" ->
      s"""WITH v AS (SELECT vec_id, list_transform(embedding::DOUBLE[], x -> CAST(round(x * 1000) AS BIGINT)) AS qv FROM embeddings),
         |c AS (SELECT vec_id AS cid, qv AS cv FROM v WHERE vec_id < 8),
         |j AS (SELECT v.vec_id, c.cid, CAST(list_dot_product(v.qv, c.cv) AS BIGINT) AS dot
         |      FROM v CROSS JOIN c),
         |asg AS (SELECT vec_id, CAST(cid AS BIGINT) AS cid FROM (
         |  SELECT vec_id, cid,
         |    row_number() OVER (PARTITION BY vec_id ORDER BY dot DESC, cid ASC) AS rn
         |  FROM j) rr WHERE rn = 1),
         |tk AS (SELECT doc_id, unnest($toks) AS token FROM documents),
         |cnt AS (SELECT cid, token, CAST(count(*) AS BIGINT) AS n
         |  FROM asg JOIN tk ON asg.vec_id = tk.doc_id GROUP BY 1, 2)
         |SELECT cid, CAST(rank AS BIGINT) AS rank, token, n FROM (
         |  SELECT cnt.*, row_number() OVER (PARTITION BY cid
         |      ORDER BY n DESC, token) AS rank FROM cnt) rk
         |WHERE rank <= 3""".stripMargin,

    // the margin definition over the SAME LSH-blocked candidate set the
    // engine uses (identical inlined hyperplanes → identical candidates),
    // then ppm cosines, both directional top-4 neighborhood sums via ranked
    // windows, and the exact-rational mean-of-means denominator
    // auto-sized SRP depth: |a|+|b| = the whole embeddings table here, so
    // the planes CTE counts it — same integer rule as lshCosCandidates
    "q_margin_mine" ->
      s"""WITH v AS ($qvCte),
        |pl AS (${srpPlanesSql("embeddings")}),
        |bk AS (${srpBucketsSqlAuto(8, 64)}),
        |cand AS (SELECT DISTINCT a.vec_id AS a_id, b.vec_id AS b_id
        |  FROM bk a JOIN bk b ON a.tbl = b.tbl AND a.bkt = b.bkt
        |  WHERE a.vec_id % 2 = 0 AND b.vec_id % 2 = 1),
        |av AS (SELECT vec_id AS a_id, qv, sqrt(list_dot_product(qv, qv)) AS nrm
        |  FROM v WHERE vec_id % 2 = 0),
        |bv AS (SELECT vec_id AS b_id, qv, sqrt(list_dot_product(qv, qv)) AS nrm
        |  FROM v WHERE vec_id % 2 = 1),
        |c AS (SELECT cand.a_id, cand.b_id,
        |    CAST(round(1000000.0 * list_dot_product(av.qv, bv.qv) / (av.nrm * bv.nrm)) AS BIGINT) AS cos_ppm
        |  FROM cand JOIN av USING (a_id) JOIN bv USING (b_id)),
        |fa AS (SELECT a_id, CAST(sum(cos_ppm) AS BIGINT) AS sa, CAST(count(*) AS BIGINT) AS ca
        |  FROM (SELECT c.*, row_number() OVER (PARTITION BY a_id
        |      ORDER BY cos_ppm DESC, b_id) AS rn FROM c) ra
        |  WHERE rn <= 4 GROUP BY 1),
        |fb AS (SELECT b_id, CAST(sum(cos_ppm) AS BIGINT) AS sb, CAST(count(*) AS BIGINT) AS cb
        |  FROM (SELECT c.*, row_number() OVER (PARTITION BY b_id
        |      ORDER BY cos_ppm DESC, a_id) AS rn FROM c) rb
        |  WHERE rn <= 4 GROUP BY 1),
        |m AS (SELECT c.a_id, c.b_id, c.cos_ppm,
        |    CAST((c.cos_ppm * 2000000 * ca * cb) // (sa * cb + sb * ca) AS BIGINT) AS margin_ppm
        |  FROM c JOIN fa USING (a_id) JOIN fb USING (b_id)
        |  WHERE sa * cb + sb * ca > 0)
        |SELECT a_id, b_id, cos_ppm, margin_ppm FROM m
        |WHERE margin_ppm >= 1040000""".stripMargin,

    // exact top-5 truth vs the IVF cell-probe top-5 (the q_sim_ivf_topk
    // derivation), counted per query — the LSH recall harness pointed at
    // the deterministic IVF ranking
    // full-dim exact top-5 vs the same search on qv[1:16] — hit-counted
    "q_sim_prefix_recall" ->
      """WITH v AS (SELECT vec_id, list_transform(embedding::DOUBLE[], x -> CAST(round(x * 1000) AS BIGINT)) AS qv FROM embeddings),
        |ex AS (SELECT query_id, neighbor_id FROM (
        |    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |      CAST(list_dot_product(q.qv, c.qv) AS BIGINT) AS dot
        |    FROM v q JOIN v c ON q.vec_id < 50 AND c.vec_id <> q.vec_id)
        |  QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY dot DESC, neighbor_id) <= 5),
        |ap AS (SELECT query_id, neighbor_id FROM (
        |    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |      CAST(list_dot_product(q.qv[1:16], c.qv[1:16]) AS BIGINT) AS dot
        |    FROM v q JOIN v c ON q.vec_id < 50 AND c.vec_id <> q.vec_id)
        |  QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY dot DESC, neighbor_id) <= 5)
        |SELECT ex.query_id, CAST(count(*) AS BIGINT) AS n_exact,
        |  CAST(count(ap.neighbor_id) AS BIGINT) AS n_hit,
        |  (count(ap.neighbor_id) * 1000000) // count(*) AS recall_ppm
        |FROM ex LEFT JOIN ap ON ex.query_id = ap.query_id AND ex.neighbor_id = ap.neighbor_id
        |GROUP BY ex.query_id""".stripMargin,

    "q_sim_ivf_recall" ->
      """WITH v AS (SELECT vec_id, list_transform(embedding::DOUBLE[], x -> CAST(round(x * 1000) AS BIGINT)) AS qv FROM embeddings),
        |ex AS (SELECT query_id, neighbor_id FROM (
        |    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |      CAST(list_dot_product(q.qv, c.qv) AS BIGINT) AS dot
        |    FROM v q JOIN v c ON q.vec_id < 50 AND c.vec_id <> q.vec_id)
        |  QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY dot DESC, neighbor_id) <= 5),
        |c AS (SELECT vec_id AS cid, qv AS centroid FROM v ORDER BY vec_id LIMIT 16),
        |cells AS (SELECT vec_id AS neighbor_id, qv AS cv, cid FROM (
        |  SELECT v.vec_id, v.qv, c.cid,
        |         row_number() OVER (PARTITION BY v.vec_id ORDER BY list_dot_product(v.qv, c.centroid) DESC, c.cid ASC) AS rk
        |  FROM v CROSS JOIN c) WHERE rk = 1),
        |probes AS (SELECT vec_id AS query_id, qv, cid FROM (
        |  SELECT v.vec_id, v.qv, c.cid,
        |         row_number() OVER (PARTITION BY v.vec_id ORDER BY list_dot_product(v.qv, c.centroid) DESC, c.cid ASC) AS rk
        |  FROM v CROSS JOIN c WHERE v.vec_id < 50) WHERE rk <= 4),
        |ap AS (SELECT query_id, neighbor_id FROM (
        |    SELECT query_id, neighbor_id, CAST(list_dot_product(p.qv, cells.cv) AS BIGINT) AS dot
        |    FROM probes p JOIN cells USING (cid)
        |    WHERE neighbor_id <> query_id)
        |  QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY dot DESC, neighbor_id) <= 5)
        |SELECT ex.query_id, CAST(count(*) AS BIGINT) AS n_exact,
        |  CAST(count(ap.neighbor_id) AS BIGINT) AS n_hit,
        |  CAST((count(ap.neighbor_id) * 1000000) // count(*) AS BIGINT) AS recall_ppm
        |FROM ex LEFT JOIN ap USING (query_id, neighbor_id) GROUP BY 1""".stripMargin,

    // the persisted path answers EXACTLY as the inline path: same oracle
    // derivation as q_sim_ivf_topk (parquet round-trip must be lossless)
    "q_sim_ivf_persisted" ->
      """WITH v AS (SELECT vec_id, list_transform(embedding::DOUBLE[], x -> CAST(round(x * 1000) AS BIGINT)) AS qv FROM embeddings),
        |c AS (SELECT vec_id AS cid, qv AS centroid FROM v ORDER BY vec_id LIMIT 16),
        |cells AS (SELECT vec_id AS neighbor_id, qv AS cv, cid FROM (
        |  SELECT v.vec_id, v.qv, c.cid,
        |         row_number() OVER (PARTITION BY v.vec_id ORDER BY list_dot_product(v.qv, c.centroid) DESC, c.cid ASC) AS rk
        |  FROM v CROSS JOIN c) WHERE rk = 1),
        |probes AS (SELECT vec_id AS query_id, qv, cid FROM (
        |  SELECT v.vec_id, v.qv, c.cid,
        |         row_number() OVER (PARTITION BY v.vec_id ORDER BY list_dot_product(v.qv, c.centroid) DESC, c.cid ASC) AS rk
        |  FROM v CROSS JOIN c WHERE v.vec_id < 50) WHERE rk <= 4)
        |SELECT query_id, neighbor_id, CAST(list_dot_product(p.qv, cells.cv) AS BIGINT) AS dot
        |FROM probes p JOIN cells USING (cid)
        |WHERE neighbor_id <> query_id
        |QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY dot DESC, neighbor_id) <= 5""".stripMargin,

    "q_sim_ivf_topk" ->
      """WITH v AS (SELECT vec_id, list_transform(embedding::DOUBLE[], x -> CAST(round(x * 1000) AS BIGINT)) AS qv FROM embeddings),
        |c AS (SELECT vec_id AS cid, qv AS centroid FROM v ORDER BY vec_id LIMIT 16),
        |cells AS (SELECT vec_id AS neighbor_id, qv AS cv, cid FROM (
        |  SELECT v.vec_id, v.qv, c.cid,
        |         row_number() OVER (PARTITION BY v.vec_id ORDER BY list_dot_product(v.qv, c.centroid) DESC, c.cid ASC) AS rk
        |  FROM v CROSS JOIN c) WHERE rk = 1),
        |probes AS (SELECT vec_id AS query_id, qv, cid FROM (
        |  SELECT v.vec_id, v.qv, c.cid,
        |         row_number() OVER (PARTITION BY v.vec_id ORDER BY list_dot_product(v.qv, c.centroid) DESC, c.cid ASC) AS rk
        |  FROM v CROSS JOIN c WHERE v.vec_id < 50) WHERE rk <= 4)
        |SELECT query_id, neighbor_id, CAST(list_dot_product(p.qv, cells.cv) AS BIGINT) AS dot
        |FROM probes p JOIN cells USING (cid)
        |WHERE neighbor_id <> query_id
        |QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY dot DESC, neighbor_id) <= 5""".stripMargin,

    // PQ/ADC: sub-codebooks are subspace slices of the 16 lowest-id
    // vectors; code = argmin |c|²−2·x·c per (vector, subspace) with
    // smaller-index tie-break; approx dot = sum of the query's 8
    // lut reads on the codes — all integer-exact in doubles < 2^53
    "q_sim_pq_topk" -> pqTopKOracle,

    "q_sim_ivfpq_topk" -> ivfPqTopKOracle,

    "q_sim_ivfpq_res_topk" -> ivfPqResTopKOracle,

    "q_sim_ivfpq_res_recall" ->
      s"""WITH vv AS (SELECT vec_id, list_transform(embedding::DOUBLE[], x -> CAST(round(x * 1000) AS BIGINT)) AS qv FROM embeddings),
         |ex AS (SELECT query_id, neighbor_id FROM (
         |    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |      CAST(list_dot_product(q.qv, c.qv) AS BIGINT) AS dot
         |    FROM vv q JOIN vv c ON q.vec_id < 50 AND c.vec_id <> q.vec_id)
         |  QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY dot DESC, neighbor_id) <= 5),
         |ap AS (SELECT query_id, neighbor_id FROM ($ivfPqResTopKOracle))
         |SELECT ex.query_id, CAST(count(*) AS BIGINT) AS n_exact,
         |  CAST(count(ap.neighbor_id) AS BIGINT) AS n_hit,
         |  CAST((count(ap.neighbor_id) * 1000000) // count(*) AS BIGINT) AS recall_ppm
         |FROM ex LEFT JOIN ap USING (query_id, neighbor_id) GROUP BY 1""".stripMargin,

    // stratum = count of interior decile bounds strictly below the score
    // (boundary ties fall down); bounds = quantile_cont rounded 6dp — the
    // valuePercentiles parity regime
    "q_quality_strata" ->
      s"""WITH q AS (SELECT CAST(round(round(
         |    least(len($toks) / 50.0, 1.0) * 0.4 +
         |    (CASE WHEN length(text)*1.0/len($toks) BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.5 END) * 0.4 +
         |    least(${duckStop("en")} * 10.0 / len($toks), 1.0) * 0.2, 6) * 1000) AS BIGINT) AS qm,
         |    CAST(len($toks) AS BIGINT) AS nt
         |  FROM documents),
         |b AS (SELECT list_transform(quantile_cont(qm, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]),
         |    x -> round(x, 6)) AS bs FROM q),
         |s AS (SELECT qm, nt,
         |    CAST(len(list_filter(b.bs, x -> qm > x)) AS BIGINT) AS stratum
         |  FROM q, b)
         |SELECT stratum, CAST(count(*) AS BIGINT) AS n_docs,
         |  (CAST(sum(nt) AS BIGINT) * 1000000) // count(*) AS mean_tokens_micro,
         |  min(qm) AS q_min, max(qm) AS q_max
         |FROM s GROUP BY 1""".stripMargin,

    "q_hard_negatives" ->
      """WITH v AS (SELECT vec_id, label, list_transform(embedding::DOUBLE[], x -> CAST(round(x * 1000) AS BIGINT)) AS qv FROM embeddings)
        |SELECT query_id, neighbor_id, dot, neg_label FROM (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    CAST(list_dot_product(q.qv, c.qv) AS BIGINT) AS dot,
        |    c.label AS neg_label,
        |    row_number() OVER (PARTITION BY q.vec_id
        |      ORDER BY CAST(list_dot_product(q.qv, c.qv) AS BIGINT) DESC, c.vec_id) AS rk
        |  FROM v q JOIN v c ON q.vec_id < 50 AND c.vec_id <> q.vec_id
        |    AND c.label <> q.label) WHERE rk <= 5""".stripMargin,

    // majority vote over the exact top-5 (self excluded); vote ties break
    // to the SMALLER label
    "q_knn_eval" ->
      """WITH v AS (SELECT vec_id, label, list_transform(embedding::DOUBLE[], x -> CAST(round(x * 1000) AS BIGINT)) AS qv FROM embeddings),
        |nn AS (SELECT query_id, nl FROM (
        |  SELECT q.vec_id AS query_id, CAST(c.label AS BIGINT) AS nl,
        |    row_number() OVER (PARTITION BY q.vec_id
        |      ORDER BY CAST(list_dot_product(q.qv, c.qv) AS BIGINT) DESC, c.vec_id) AS rk
        |  FROM v q JOIN v c ON q.vec_id < 50 AND c.vec_id <> q.vec_id) WHERE rk <= 5),
        |votes AS (SELECT query_id, nl, count(*) AS n FROM nn GROUP BY 1, 2),
        |pred AS (SELECT query_id, nl AS predicted_label FROM (
        |  SELECT query_id, nl, row_number() OVER (PARTITION BY query_id
        |    ORDER BY n DESC, nl ASC) AS rk FROM votes) WHERE rk = 1)
        |SELECT p.query_id, CAST(v.label AS BIGINT) AS true_label, p.predicted_label,
        |  CAST(v.label AS BIGINT) = p.predicted_label AS correct
        |FROM pred p JOIN v ON v.vec_id = p.query_id""".stripMargin,

    "q_sim_ivf_stats" ->
      """WITH v AS (SELECT vec_id, list_transform(embedding::DOUBLE[], x -> CAST(round(x * 1000) AS BIGINT)) AS qv FROM embeddings),
        |c AS (SELECT vec_id AS cid, qv AS centroid FROM v ORDER BY vec_id LIMIT 16),
        |cells AS (SELECT vec_id, cid FROM (
        |  SELECT v.vec_id, c.cid,
        |         row_number() OVER (PARTITION BY v.vec_id ORDER BY list_dot_product(v.qv, c.centroid) DESC, c.cid ASC) AS rk
        |  FROM v CROSS JOIN c) WHERE rk = 1)
        |SELECT cid, CAST(count(*) AS BIGINT) AS n_vectors,
        |  (count(*) * 1000000) // (SELECT count(*) FROM cells) AS share_ppm
        |FROM cells GROUP BY cid""".stripMargin,

    "q_sim_ivfpq_recall" ->
      s"""WITH vv AS (SELECT vec_id, list_transform(embedding::DOUBLE[], x -> CAST(round(x * 1000) AS BIGINT)) AS qv FROM embeddings),
         |ex AS (SELECT query_id, neighbor_id FROM (
         |    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |      CAST(list_dot_product(q.qv, c.qv) AS BIGINT) AS dot
         |    FROM vv q JOIN vv c ON q.vec_id < 50 AND c.vec_id <> q.vec_id)
         |  QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY dot DESC, neighbor_id) <= 5),
         |ap AS (SELECT query_id, neighbor_id FROM ($ivfPqTopKOracle))
         |SELECT ex.query_id, CAST(count(*) AS BIGINT) AS n_exact,
         |  CAST(count(ap.neighbor_id) AS BIGINT) AS n_hit,
         |  CAST((count(ap.neighbor_id) * 1000000) // count(*) AS BIGINT) AS recall_ppm
         |FROM ex LEFT JOIN ap USING (query_id, neighbor_id) GROUP BY 1""".stripMargin,

    "q_sim_pq_recall" ->
      s"""WITH v AS (SELECT vec_id, list_transform(embedding::DOUBLE[], x -> CAST(round(x * 1000) AS BIGINT)) AS qv FROM embeddings),
         |ex AS (SELECT query_id, neighbor_id FROM (
         |    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |      CAST(list_dot_product(q.qv, c.qv) AS BIGINT) AS dot
         |    FROM v q JOIN v c ON q.vec_id < 50 AND c.vec_id <> q.vec_id)
         |  QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY dot DESC, neighbor_id) <= 5),
         |ap AS (SELECT query_id, neighbor_id FROM ($pqTopKOracle))
         |SELECT ex.query_id, CAST(count(*) AS BIGINT) AS n_exact,
         |  CAST(count(ap.neighbor_id) AS BIGINT) AS n_hit,
         |  CAST((count(ap.neighbor_id) * 1000000) // count(*) AS BIGINT) AS recall_ppm
         |FROM ex LEFT JOIN ap USING (query_id, neighbor_id) GROUP BY 1""".stripMargin,

    // seed assignment, then ONE Lloyd round: cell = argmax dot (ties → low
    // cid), refined centroid = per-dim truncated integer mean of the cell
    // (trunc ≡ Spark's double-division → cast-to-long), then the same
    // probe/rank as q_sim_ivf_topk over the refined centroids
    "q_sim_ivf_lloyd" ->
      """WITH v AS (SELECT vec_id, list_transform(embedding::DOUBLE[], x -> CAST(round(x * 1000) AS BIGINT)) AS qv FROM embeddings),
        |c0 AS (SELECT vec_id AS cid, qv AS centroid FROM v ORDER BY vec_id LIMIT 16),
        |a0 AS (SELECT vec_id, qv, cid FROM (
        |  SELECT v.vec_id, v.qv, c0.cid,
        |         row_number() OVER (PARTITION BY v.vec_id ORDER BY list_dot_product(v.qv, c0.centroid) DESC, c0.cid ASC) AS rk
        |  FROM v CROSS JOIN c0) WHERE rk = 1),
        |ex AS (SELECT cid, generate_subscripts(qv, 1) AS dim, unnest(qv) AS x FROM a0),
        |md AS (SELECT cid, dim, CAST(trunc(sum(x) * 1.0 / count(*)) AS BIGINT) AS m FROM ex GROUP BY 1, 2),
        |c1 AS (SELECT cid, list(m ORDER BY dim) AS centroid FROM md GROUP BY cid),
        |cells AS (SELECT vec_id AS neighbor_id, qv AS cv, cid FROM (
        |  SELECT v.vec_id, v.qv, c1.cid,
        |         row_number() OVER (PARTITION BY v.vec_id ORDER BY list_dot_product(v.qv, c1.centroid) DESC, c1.cid ASC) AS rk
        |  FROM v CROSS JOIN c1) WHERE rk = 1),
        |probes AS (SELECT vec_id AS query_id, qv, cid FROM (
        |  SELECT v.vec_id, v.qv, c1.cid,
        |         row_number() OVER (PARTITION BY v.vec_id ORDER BY list_dot_product(v.qv, c1.centroid) DESC, c1.cid ASC) AS rk
        |  FROM v CROSS JOIN c1 WHERE v.vec_id < 50) WHERE rk <= 4)
        |SELECT query_id, neighbor_id, CAST(list_dot_product(p.qv, cells.cv) AS BIGINT) AS dot
        |FROM probes p JOIN cells USING (cid)
        |WHERE neighbor_id <> query_id
        |QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY dot DESC, neighbor_id) <= 5""".stripMargin,

    "q_pipeline_e2e" -> {
      val langs = Seq("de", "en", "es", "fr")
      val scoreDefs = langs.map(l => s"${duckStop(l)} AS s_$l").mkString(", ")
      val best = s"greatest(${langs.map("s_" + _).mkString(", ")})"
      val pick = langs.map(l => s"WHEN best > 0 AND s_$l = best THEN '$l'").mkString(" ")
      val quality =
        s"""round(least(len($toks) / 50.0, 1.0) * 0.4 +
           |  (CASE WHEN length(text)*1.0/len($toks) BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.5 END) * 0.4 +
           |  least(${duckStop("en")} * 10.0 / len($toks), 1.0) * 0.2, 6)""".stripMargin
      s"""WITH t AS (SELECT doc_id, text, $scoreDefs FROM documents),
         |b AS (SELECT *, $best AS best FROM t),
         |l AS (SELECT doc_id, text, CASE $pick ELSE 'und' END AS lang_pred,
         |        $quality AS quality FROM b),
         |f AS (SELECT *, md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS content_key
         |      FROM l WHERE lang_pred = 'en' AND quality >= 0.5)
         |SELECT doc_id, CAST(len($toks) AS BIGINT) AS tok_ws,
         |  CAST(len(regexp_extract_all(text, '\\w+|[^\\w\\s]')) AS BIGINT) AS tok_bpe,
         |  quality
         |FROM f
         |QUALIFY row_number() OVER (PARTITION BY content_key ORDER BY doc_id) = 1""".stripMargin
    },

    "q_multimodal_frames" ->
      """WITH m AS (SELECT doc_id AS media_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n FROM documents),
        |i AS (SELECT media_id, n, CAST(unnest(range(4)) AS BIGINT) AS frame_idx FROM m)
        |SELECT media_id, frame_idx,
        |  CAST(floor(frame_idx * n / 4) AS BIGINT) AS frame_offset,
        |  least(256, n - CAST(floor(frame_idx * n / 4) AS BIGINT)) AS frame_len
        |FROM i""".stripMargin,

    "q_multimodal_stats" ->
      """SELECT doc_id AS media_id, 'image' AS kind,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  round(list_sum(list_transform(string_split_regex(text, ''), c -> unicode(c))) * 1.0 / octet_length(encode(text)), 6) AS mean_byte,
        |  CAST(unicode(substr(text, 1, 1)) AS BIGINT) AS first_byte,
        |  CAST(unicode(substr(text, length(text), 1)) AS BIGINT) AS last_byte
        |FROM documents""".stripMargin
  )
}
