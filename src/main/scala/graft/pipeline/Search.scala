package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Term search over a document corpus: inverse-document-frequency weighted
  * term matching with a deterministic global top-k — the "find me training
  * examples about X" primitive of a curation pipeline (targeted data
  * selection), and the one retrieval mode the engine lacked next to the
  * embedding-space searches in [[Similarity]].
  *
  * Scoring is TF-IDF-shaped but integer-exact so an independent SQL engine
  * reproduces it bit-for-bit: no logarithm idf, no FP sums —
  *
  * {{{ score(doc) = Σ_term  tf(term, doc) * floor(1e6 / df(term)) }}}
  *
  * where df(term) = number of documents containing the term. Rare terms
  * dominate exactly as with log-idf; ties break on the smaller doc id.
  */
object Search {

  /** Top-k documents by inverse-df weighted term frequency.
    *
    * Returns {{{ id | score }}} — the k highest-scoring matching documents
    * (score > 0), ranked (score DESC, id ASC).
    *
    * 100 TB shape: the per-term df is ONE filtered partial+final aggregate
    * whose result is at most `terms.size` rows — collected and inlined as
    * literal weights (a driver collect of a handful of aggregate rows, not
    * of data). Scoring is then pure map-side expression work over the scan,
    * and the global top-k is orderBy+limit — Spark's TakeOrderedAndProject,
    * a per-partition bounded heap + driver merge of partitions×k rows,
    * never a full sort and never a single-reducer window.
    */
  def searchTopK(df: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k: Int): DataFrame = {
    require(terms.nonEmpty, "searchTopK needs at least one term")
    require(terms.size <= 64, s"searchTopK supports at most 64 terms, got ${terms.size}")
    require(k > 0, s"k must be > 0, got $k")
    val qTerms = terms.distinct
    val toks = TextAnalysis.tokens(col(textCol))

    val dfMap = df
      .select(explode(array_distinct(toks)).as("tok"))
      .filter(col("tok").isin(qTerms: _*))
      .groupBy("tok").agg(count(lit(1)).as("df"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    // a term absent from the corpus matches nothing: weight 0
    val score = qTerms.map { t =>
      val w = dfMap.get(t).map(1000000L / _).getOrElse(0L)
      size(filter(toks, x => x === lit(t))).cast("long") * lit(w)
    }.reduce(_ + _)

    df.select(col(idCol).as("id"), score.as("score"))
      .filter(col("score") > 0)
      .orderBy(col("score").desc, col("id").asc)
      .limit(k)
  }

  /** Okapi BM25 top-k with the two properties [[searchTopK]]'s linear tf
    * lacks — TERM-FREQUENCY SATURATION (the 50th occurrence of a term adds
    * almost nothing) and DOCUMENT-LENGTH NORMALIZATION (a match in a short
    * doc outranks the same match buried in a long one) — computed in exact
    * integer rational arithmetic so the oracle reproduces every score:
    *
    * {{{ score(doc) = Σ_t floor( idf_w(t) · sat(t, doc) / 1e6 )
    *     sat = floor( 22·tf·avgdl·1e6 / (10·tf·avgdl + 3·avgdl + 9·dl) ) }}}
    *
    * with k1 = 6/5, b = 3/4 (the classic 1.2/0.75 as exact rationals):
    * multiplying numerator and denominator by 10·avgdl turns
    * `tf·(k1+1) / (tf + k1·(1−b) + k1·b·dl/avgdl)` into
    * `22·tf·avgdl·1e6 / (10·tf·avgdl + 3·avgdl + 9·dl)` — pure i64 ops
    * (safe to ~400k-token documents). `idf_w(t) = floor(1e6/df)` keeps the
    * deterministic inverse-df weighting (vs log-idf, which would drag
    * libm into the contract); `avgdl = floor(Σdl / N) ≥ 1`.
    *
    * 100 TB shape: identical to [[searchTopK]] — df per term and the ONE
    * (Σdl, N) stats row are bounded collects; scoring is map-side codegen'd
    * expression work; ranking is TakeOrderedAndProject. */
  def bm25TopK(df: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k: Int): DataFrame = {
    require(terms.nonEmpty, "bm25TopK needs at least one term")
    require(terms.size <= 64, s"bm25TopK supports at most 64 terms, got ${terms.size}")
    require(k > 0, s"k must be > 0, got $k")
    val qTerms = terms.distinct
    val toks = TextAnalysis.tokens(col(textCol))

    val dfMap = df
      .select(explode(array_distinct(toks)).as("tok"))
      .filter(col("tok").isin(qTerms: _*))
      .groupBy("tok").agg(count(lit(1)).as("df"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val stats = df.agg(sum(size(toks)).cast("long"), count(lit(1))).head
    val avgdl = math.max(stats.getLong(0) / stats.getLong(1), 1L)

    val dl = size(toks).cast("long")
    val idiv = (a: Column, b: Column) => call_function("div", a, b)
    val score = qTerms.map { t =>
      val wIdf = dfMap.get(t).map(1000000L / _).getOrElse(0L)
      val tf = size(filter(toks, x => x === lit(t))).cast("long")
      val sat = idiv(tf * lit(22L * avgdl * 1000000L),
        tf * lit(10L * avgdl) + lit(3L * avgdl) + lit(9L) * dl)
      idiv(sat * lit(wIdf), lit(1000000L))
    }.reduce(_ + _)

    df.select(col(idCol).as("id"), score.as("score"))
      .filter(col("score") > 0)
      .orderBy(col("score").desc, col("id").asc)
      .limit(k)
  }

  /** Retrieval-quality evaluation (MRR@k) — the acceptance metric a search
    * stack reports before anyone trusts its rankings: for each labeled
    * query, the rank of its known-relevant document under a
    * distinct-term-overlap score (ties to the smaller doc id), and the
    * reciprocal rank in ppm (0 when the relevant doc misses the top k or
    * matches no term).
    *
    * Scale shape: candidates come from a TOKEN equi-join (exploded
    * distinct query terms ⋈ exploded distinct doc tokens — the posting-
    * list shape, cost ∝ real matches), and the relevant doc's rank is
    * computed WITHOUT sorting: `rank = 1 + #better` via one aggregation
    * against the relevant row's score — no per-query window, no top-k
    * materialization.
    *
    * Output: `(query_id, n_matched, rank, rr_ppm)`; `rank` is null when
    * the relevant doc matches nothing. */
  def mrrEval(docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, queryIdCol: String, termsCol: String,
      relevantCol: String, k: Int = 10): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val docToks = docs.select(col(idCol).as("_did"),
      explode(array_distinct(TextAnalysis.tokens(col(textCol)))).as("_tok"))
    val qToks = queries.select(col(queryIdCol).as("query_id"),
      col(relevantCol).as("_rel"),
      explode(array_distinct(col(termsCol))).as("_tok"))
    val matched = qToks.join(docToks, Seq("_tok"))
      .groupBy(col("query_id"), col("_rel"), col("_did"))
      .agg(count(lit(1)).as("_sc"))
    val rel = matched.filter(col("_did") === col("_rel"))
      .select(col("query_id"), col("_sc").as("_rsc"))
    val base = queries.select(col(queryIdCol).as("query_id"))
    base
      .join(matched.join(rel, Seq("query_id"))
        .groupBy("query_id")
        .agg(count(lit(1)).as("n_matched"),
          (lit(1L) + sum((col("_sc") > col("_rsc") ||
            (col("_sc") === col("_rsc") && col("_did") < col("_rel")))
            .cast("long"))).as("rank")), Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("n_matched"), lit(0L)).as("n_matched"), col("rank"),
        when(col("rank").isNotNull && col("rank") <= k,
          expr(s"1000000 div rank")).otherwise(lit(0L)).as("rr_ppm"))
  }

  /** Capped inverted index: per token, its document frequency, total term
    * frequency, and the first `cap` containing doc ids (ascending) —
    * {{{ token | df | tf | head_ids }}}.
    *
    * The posting HEAD is capped on purpose: a full posting list for a
    * stopword is corpus-sized and belongs in a posting-file layout, not a
    * DataFrame row. The capped head + exact df/tf is what index statistics,
    * vocabulary pruning, and seed-list retrieval actually consume.
    *
    * 100 TB shape: occurrences collapse map-side to (doc, token, tf); the
    * head ids go through the bounded [[graft.functions.TopKByDot]] aggregate
    * (ranked by dot = -id, i.e. smallest ids first) so per-token map-side
    * state is ≤ cap entries and the exchange carries ≤ partitions × cap
    * rows per token — a stopword costs a wide two-phase agg, never an
    * unbounded `collect_list`.
    */
  def buildPostings(df: DataFrame, idCol: String, textCol: String,
      cap: Int = 8): DataFrame = {
    require(cap > 0, s"cap must be > 0, got $cap")
    import org.apache.spark.sql.graft.bridge.{columnOf, expressionOf}
    val occ = df
      .select(col(idCol).cast("long").as("id"),
        explode(TextAnalysis.tokens(col(textCol))).as("tok"))
      .groupBy("id", "tok").agg(count(lit(1)).as("cnt"))
    val heads = columnOf(graft.functions.TopKByDot(
      expressionOf(-col("id")), expressionOf(col("id")),
      expressionOf(lit(0.0)), cap).toAggregateExpression())
    occ.groupBy("tok")
      .agg(count(lit(1)).as("df"), sum(col("cnt")).as("tf"), heads.as("tk"))
      .select(col("tok").as("token"), col("df"), col("tf"),
        expr("transform(tk, e -> e.id)").as("head_ids"))
  }

  /** Incremental (nightly) index refresh: fold a batch of NEW documents
    * into an existing [[buildPostings]] table without rescanning the
    * indexed corpus — the search-index sibling of
    * [[Dedup.updateDedupArtifacts]] and
    * [[EventAnalytics.assignSessionsIncremental]]. Batch ids must be
    * disjoint from already-indexed ids (the admission gate's insert-only
    * contract — re-indexing an id would double-count df/tf).
    *
    * Correctness contract (oracle-checked): `updatePostings(build(A), B)`
    * equals `build(A ∪ B)` exactly — df/tf are additive, and the merged
    * head is the smallest-`cap` of the two heads' union, which contains
    * the union corpus's true head (top-k-merge losslessness).
    *
    * Scale shape: the batch builds its own postings (batch-sized work),
    * then ONE token-keyed full-outer join against the index — the per-row
    * head merge is an O(cap) array op. */
  def updatePostings(postings: DataFrame, newDocs: DataFrame, idCol: String,
      textCol: String, cap: Int = 8): DataFrame = {
    val b = buildPostings(newDocs, idCol, textCol, cap)
    val emptyHeads = expr("cast(array() as array<bigint>)")
    postings
      .select(col("token"), col("df").as("_df_o"), col("tf").as("_tf_o"),
        col("head_ids").as("_h_o"))
      .join(b.select(col("token"), col("df").as("_df_b"), col("tf").as("_tf_b"),
        col("head_ids").as("_h_b")), Seq("token"), "full_outer")
      .select(col("token"),
        (coalesce(col("_df_o"), lit(0L)) + coalesce(col("_df_b"), lit(0L))).as("df"),
        (coalesce(col("_tf_o"), lit(0L)) + coalesce(col("_tf_b"), lit(0L))).as("tf"),
        slice(array_sort(concat(coalesce(col("_h_o"), emptyHeads),
          coalesce(col("_h_b"), emptyHeads))), 1, cap).as("head_ids"))
  }

  /** HYBRID retrieval: the inverse-df term score blended with exact vector
    * similarity against one query embedding — `score = term_score·wTerm +
    * dot·wVec`, all integer, ranked (score DESC, id ASC) top-k. The modern
    * retrieval default (lexical + dense) as one deterministic operator.
    *
    * Scale shape: the term score is the same map-side expression as
    * [[searchTopK]] (df lookups collected bounded, one row per query
    * term); the query vector is ONE collected row inlined as a literal, so
    * the dense side is a codegen'd dot per document — no join against the
    * query, no candidate shuffle; the embedding join is a plain id
    * equi-join; ranking is global bounded top-k (TakeOrdered). The query
    * document itself is excluded.
    *
    * Output: id, `score`, `term_score`, `dot` — k rows. */
  /** BATCHED hybrid retrieval: [[hybridTopK]] over a TABLE of queries —
    * `queries` rows are `(queryIdCol, termsCol: array<string>)`, each
    * query's vector joined from `embs` by id. Scores and ranking are
    * per-query identical to [[hybridTopK]] (integer-exact, self excluded).
    *
    * Scale shape — the driver collects are AMORTIZED across the batch, not
    * per query: ONE bounded collect of the query table (a row per query —
    * the batch analog of the single query-vector collect) and ONE df
    * aggregate over the UNION vocabulary. Per-term tfs are projected once
    * per document and shared by every query's score expression; each doc
    * then emits its (query, score) rows MAP-SIDE (an explode of a
    * per-query struct array), and the per-query top-k is the bounded
    * two-phase [[graft.functions.TopKByDot]] aggregate — one job, one
    * k-bounded exchange keyed by query, never a row_number window and
    * never a per-query driver loop.
    *
    * Output: query_id, id, `score`, `term_score`, `dot` — k rows per
    * query. `wVec` must divide every blended score exactly for the dot
    * back-out, which holds for any integer weights (dot is recovered as
    * `(score - term_score·wTerm) / wVec`). */
  def hybridTopKBatch(docs: DataFrame, embs: DataFrame, idCol: String,
      textCol: String, vecCol: String, queries: DataFrame,
      queryIdCol: String, termsCol: String, k: Int,
      wTerm: Long = 1L, wVec: Long = 1L): DataFrame = {
    require(k > 0, s"k must be > 0, got $k")
    require(wVec != 0L, "wVec must be non-zero")
    import org.apache.spark.sql.graft.bridge.{columnOf, expressionOf}
    // ONE bounded collect: a row per query (id, distinct terms, vector)
    val qRows = queries
      .join(embs.select(col(idCol).cast("long").as("__qid"),
        Similarity.quantize(col(vecCol)).as("__qv")),
        queries(queryIdCol).cast("long") === col("__qid"))
      .select(col("__qid"), col(termsCol), col("__qv"))
      .collect()
    require(qRows.nonEmpty, "hybridTopKBatch needs at least one query with an embedding")
    val qs = qRows.map(r => (r.getLong(0),
      r.getSeq[String](1).distinct, r.getSeq[Long](2)))
    val vocab = qs.flatMap(_._2).distinct
    require(vocab.nonEmpty, "hybridTopKBatch needs at least one query term")
    val toks = TextAnalysis.tokens(col(textCol))
    // ONE df aggregate over the union vocabulary (≤ vocab rows collected)
    val dfMap = docs
      .select(explode(array_distinct(toks)).as("tok"))
      .filter(col("tok").isin(vocab: _*))
      .groupBy("tok").agg(count(lit(1)).as("df"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val tfIdx = vocab.zipWithIndex.toMap
    val tfCols = vocab.zipWithIndex.map { case (t, i) =>
      size(filter(toks, x => x === lit(t))).cast("long").as(s"_tf_$i")
    }
    val scored = docs.select((col(idCol).cast("long").as("id") +: tfCols): _*)
      .join(embs.select(col(idCol).cast("long").as("id"),
        Similarity.quantize(col(vecCol)).as("cv")), Seq("id"))
    // per-doc map-side emission of every query's blended score
    val perQuery = qs.map { case (qid, terms, qv) =>
      val termScore = terms.map { t =>
        val w = dfMap.get(t).map(1000000L / _).getOrElse(0L)
        col(s"_tf_${tfIdx(t)}") * lit(w)
      }.reduceOption[org.apache.spark.sql.Column](_ + _).getOrElse(lit(0L))
      struct(lit(qid).as("qid"),
        (termScore * wTerm + Similarity.dotLong(col("cv"), typedLit(qv)) * wVec).as("score"),
        termScore.as("ts"))
    }
    val ex = scored
      .select(col("id"), explode(array(perQuery: _*)).as("q"))
      .filter(col("q.qid") =!= col("id"))
      .select(col("q.qid").as("query_id"), col("id"),
        col("q.score").as("score"), col("q.ts").as("ts"))
    val tk = columnOf(graft.functions.TopKByDot(
      expressionOf(col("score")), expressionOf(col("id")),
      expressionOf(col("ts").cast("double")), k).toAggregateExpression())
    ex.groupBy(col("query_id")).agg(tk.as("tk"))
      .select(col("query_id"), explode(col("tk")).as("e"))
      .select(col("query_id"), col("e.id").as("id"), col("e.dot").as("score"),
        col("e.payload").cast("long").as("term_score"),
        ((col("e.dot") - col("e.payload").cast("long") * wTerm) / wVec).cast("long").as("dot"))
  }

  def hybridTopK(docs: DataFrame, embs: DataFrame, idCol: String,
      textCol: String, vecCol: String, terms: Seq[String], queryId: Long,
      k: Int, wTerm: Long = 1L, wVec: Long = 1L): DataFrame = {
    require(terms.nonEmpty, "hybridTopK needs at least one term")
    require(k > 0, s"k must be > 0, got $k")
    val qTerms = terms.distinct
    val toks = TextAnalysis.tokens(col(textCol))
    val dfMap = docs
      .select(explode(array_distinct(toks)).as("tok"))
      .filter(col("tok").isin(qTerms: _*))
      .groupBy("tok").agg(count(lit(1)).as("df"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val termScore = qTerms.map { t =>
      val w = dfMap.get(t).map(1000000L / _).getOrElse(0L)
      size(filter(toks, x => x === lit(t))).cast("long") * lit(w)
    }.reduce(_ + _)
    val qv = embs.filter(col(idCol) === queryId)
      .select(Similarity.quantize(col(vecCol))).collect()
    require(qv.nonEmpty, s"query id $queryId has no embedding")
    val qvLit = typedLit(qv(0).getSeq[Long](0))
    docs.select(col(idCol).as("id"), termScore.as("term_score"))
      .join(embs.select(col(idCol).as("id"),
        Similarity.quantize(col(vecCol)).as("cv")), Seq("id"))
      .filter(col("id") =!= queryId)
      .withColumn("dot", Similarity.dotLong(col("cv"), qvLit))
      .select(col("id"),
        (col("term_score") * wTerm + col("dot") * wVec).as("score"),
        col("term_score"), col("dot"))
      .orderBy(col("score").desc, col("id").asc)
      .limit(k)
  }
}
