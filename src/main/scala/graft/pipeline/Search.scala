package graft.pipeline

import org.apache.spark.sql.DataFrame
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
