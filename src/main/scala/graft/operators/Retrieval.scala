package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Term-based retrieval over a document corpus — the scoring half of a
  * decontamination / relevance-filter pipeline (rank corpus documents
  * against a benchmark query or a quality probe, keep or drop the top
  * band). Reference analogue: phaser's filter steps select rows by
  * computed predicates; BM25 is the standard lexical relevance score
  * (Robertson et al., TREC-3) a curation pipeline adds on top.
  *
  * 100 TB shape — the whole point of this formulation:
  *  - NO inverted index is materialized and NO full-vocabulary shuffle
  *    runs. The only corpus-wide aggregates are one partial-agged stats
  *    scan (N, avgdl) and one document-frequency scan whose explode is
  *    pre-filtered to the query's own terms (`array_intersect` against a
  *    broadcast literal — at most |query| rows survive per document).
  *  - Driver traffic is BOUNDED BY THE QUERY, not the corpus: one stats
  *    row plus at most |query| (term, df) rows. Both collects are
  *    O(|query|) — the same bounded-collect contract as
  *    [[CorpusOps.scrubBoilerplate]]'s threshold set.
  *  - Scoring is a single NARROW pass: per-term tf via `filter(tokens)`
  *    higher-order functions with idf folded in as literals, summed in
  *    canonical (sorted-term) order so the double result is reproducible
  *    across engines and partitionings. No shuffle at all until the final
  *    global top-k, which Spark executes as TakeOrderedAndProject (per-
  *    partition heaps + driver merge of k rows), never a full sort.
  */
object Retrieval {

  /** BM25 top-k: score every document against `query` terms, return the
    * k best as (id, score) with score rounded to 6 decimals (cross-engine
    * double reproducibility; see SparkEntry's x8 precedent). Documents
    * matching no query term are filtered before the top-k (score 0 rows
    * never reach the heap). Ties break on ascending id. */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      query: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(query.nonEmpty, "query must have at least one term")
    val terms = query.distinct.sorted
    val toks = docs.select(col(idCol).as("id"),
      TextFunctions.tokens(col(textCol)).as("ts"))

    // one partial-agged scan: corpus size + average document length
    val st = toks.agg(count(lit(1)).as("n"),
      avg(size(col("ts")).cast("double")).as("avgdl")).head()
    val n = st.getLong(0)
    val avgdl = st.getDouble(1)

    // per-term document frequency: array_intersect dedups within the doc
    // BEFORE the explode, so the shuffle carries <= |query| rows per doc
    val dfMap = toks
      .select(explode(array_intersect(col("ts"),
        lit(terms.toArray))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    // Robertson idf with the +1 floor (never negative): computed on the
    // driver over the bounded df map, folded into the scan as literals
    def idf(t: String): Double = {
      val df = dfMap.getOrElse(t, 0L).toDouble
      math.log((n - df + 0.5) / (df + 0.5) + 1.0)
    }

    val dl = size(col("ts")).cast("double")
    // canonical left-fold over sorted terms: ((0 + t1) + t2) + ... — the
    // oracle SQL repeats the same association so the doubles agree
    val score = terms.foldLeft(lit(0.0)) { (acc, term) =>
      val tf = size(filter(col("ts"), x => x === lit(term))).cast("double")
      acc + lit(idf(term)) * (tf * (k1 + 1.0)) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * dl / avgdl))
    }

    toks.select(col("id").as(idCol), round(score, 6).as("score"))
      .filter(col("score") > 0.0)
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
  }

  /** Per-document top-k TF-IDF keywords — the corpus-wide dual of
    * [[bm25TopK]]: instead of ranking documents against one query, rank
    * every document's OWN terms by distinctiveness (keyword extraction /
    * topic labeling / index-term selection for every document at once).
    *
    * Scoring uses the raw-ratio idf variant score = tf * N / df rather
    * than a logarithm: log is monotone, so per-document term RANKINGS are
    * identical to log-idf, and the ratio is one correctly-rounded IEEE
    * division of two exact integers — bit-reproducible across engines,
    * where `ln` implementations may differ in the last ulp and flip
    * near-tied ranks.
    *
    * 100 TB shape: tf is one partial-agged shuffle on (doc, term); df
    * re-aggregates the tf frame (term cardinality, not corpus size); the
    * tf⋈df join shuffles on term with no broadcast of the growing
    * vocabulary; the final top-k per document is a keyed window over the
    * doc's own terms (shuffle by doc), never a global sort. The corpus
    * count N is ONE broadcast scalar row.
    */
  def tfidfTopTerms(docs: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1, "k must be >= 1")
    val tf = docs
      .select(col(idCol), explode(TextFunctions.tokens(col(textCol))).as("term"))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val perDoc = Window.partitionBy(col(idCol))
      .orderBy(col("score").desc, col("term").asc)
    tf.join(dfreq, Seq("term"))
      .crossJoin(broadcast(n))
      .withColumn("score",
        (col("tf") * col("n_docs")).cast("double") / col("df").cast("double"))
      .withColumn("rk", row_number().over(perDoc).cast("long"))
      .filter(col("rk") <= k)
      .select(col(idCol), col("rk"), col("term"), col("tf"), col("df"),
        col("score"))
  }

  /** Reciprocal-rank fusion (Cormack et al., SIGIR 2009) of a lexical and
    * a semantic candidate list — the standard hybrid-retrieval merge
    * (BM25 ∪ ANN) for RAG / decontamination lookup: score-scale-free, so
    * BM25 log-scores and cosine similarities need no calibration, only
    * their RANKS: rrf(d) = Σ_lists 1/(k0 + rank_list(d)).
    *
    * Inputs are the two candidate frames (id, score); ranks are assigned
    * here by (score desc, id asc) — each frame is top-k-bounded (tens of
    * rows) by construction, so the rank windows and the full-outer id
    * join are candidate-sized, never corpus-sized: at 100 TB the heavy
    * lifting stays in the upstream retrievers (bm25TopK's TakeOrdered,
    * ADC/IVF's pruned scan) and fusion is a driver-scale merge. The two
    * reciprocal terms are added in a FIXED order (lexical + semantic) and
    * rounded to 6, so the double reproduces on any engine. Output:
    * (id, rrf long-rank 1..k, rrf_score, lex_rank, sem_rank) with absent
    * ranks null. */
  def rrfFuse(lexical: DataFrame, semantic: DataFrame, idCol: String,
      k: Int, k0: Int = 60): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1 && k0 >= 0, "need k >= 1, k0 >= 0")
    def ranked(df: DataFrame, rankName: String): DataFrame = {
      // candidate-list-sized window (the retriever already cut to top-k)
      val w = Window.orderBy(col("score").desc, col(idCol).asc)
      df.select(col(idCol), col("score"))
        .withColumn(rankName, row_number().over(w).cast("long"))
        .select(col(idCol), col(rankName))
    }
    val term: String => Column = r =>
      coalesce(lit(1.0) / (lit(k0.toDouble) + col(r).cast("double")), lit(0.0))
    val fused = ranked(lexical, "lex_rank")
      .join(ranked(semantic, "sem_rank"), Seq(idCol), "full_outer")
      .select(col(idCol), col("lex_rank"), col("sem_rank"),
        round(term("lex_rank") + term("sem_rank"), 6).as("rrf_score"))
    val w = Window.orderBy(col("rrf_score").desc, col(idCol).asc)
    fused.withColumn("rrf_rank", row_number().over(w).cast("long"))
      .filter(col("rrf_rank") <= k)
      .select(col(idCol), col("rrf_rank"), col("rrf_score"),
        col("lex_rank"), col("sem_rank"))
  }
}
