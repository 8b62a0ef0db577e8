package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.functions.TextFunctions

/** Rule-based document quality filtering — the Gopher-style gate (Rae et
  * al. 2021, app. A1: token-count window, mean-word-length window,
  * duplicate-n-gram ceiling, function-word floor) every large-scale
  * pretraining corpus applies before the expensive dedup stages.
  *
  * 100 TB shape: every rule is a pure per-row codegen'd scalar over the
  * token array — the whole filter is ONE narrow projection (no shuffle,
  * no UDF, no driver traffic), so it composes with the scan and costs a
  * single pass regardless of corpus size. Rules are emitted as separate
  * boolean columns (audit-friendly: a curation run reports WHICH rule
  * dropped how many docs) plus the combined `keep`.
  */
object QualityFilters {

  /** Per-document rule verdicts: (id, r_len, r_wordlen, r_rep, r_stop,
    * keep). `r_len` = token count within [minTokens, maxTokens];
    * `r_wordlen` = mean token length within [minMeanLen, maxMeanLen];
    * `r_rep` = duplicate-5-gram fraction <= maxDup5gram; `r_stop` = at
    * least minStopHits function-word tokens (union of the language
    * stop lists). keep = all four. */
  def gopherFilter(df: DataFrame, idCol: String, textCol: String,
      minTokens: Int = 50, maxTokens: Int = 100000,
      minMeanLen: Double = 3.0, maxMeanLen: Double = 10.0,
      maxDup5gram: Double = 0.3, minStopHits: Int = 2): DataFrame = {
    val t = col(textCol)
    val nTok = TextFunctions.tokenCount(t)
    val rLen = nTok >= minTokens && nTok <= maxTokens
    val mLen = TextFunctions.meanTokenLen(t)
    val rWordlen = mLen >= minMeanLen && mLen <= maxMeanLen
    val rRep = TextFunctions.dupNgramFraction(t, 5) <= maxDup5gram
    val stopAll = TextFunctions.stopwords.values.flatten.toSeq.distinct
    val hits = size(filter(TextFunctions.tokens(lower(t)),
      w => w.isin(stopAll: _*)))
    val rStop = hits >= minStopHits
    df.select(col(idCol), rLen.as("r_len"), rWordlen.as("r_wordlen"),
      rRep.as("r_rep"), rStop.as("r_stop"),
      (rLen && rWordlen && rRep && rStop).as("keep"))
  }

  /** Code-switch (mixed-language) detection: language-ID the FIRST and
    * SECOND half of each document's token stream independently and flag
    * documents whose halves disagree (both halves determinate). A
    * document-level language ID (x7) averages the mixture away — a page
    * that is half English half German IDs as whichever half is longer,
    * and then poisons whichever monolingual bucket it lands in; the
    * split-half test is the cheap first-order mixture detector (the
    * windowed generalization follows the same shape with more slices).
    *
    * ONE narrow codegen'd projection (two langId folds over array
    * slices), no shuffle; docs need >= 4 tokens so each half has >= 2.
    * Output: (id, lang_head, lang_tail, code_switch boolean). */
  def codeSwitchFlags(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val ws = TextFunctions.tokens(col(textCol))
    val n = size(ws)
    val half = floor(n / lit(2)).cast("int")
    val head = array_join(slice(ws, lit(1), half), " ")
    val tail = array_join(slice(ws, half + lit(1), n - half), " ")
    df.filter(n >= 4)
      .select(col(idCol),
        TextFunctions.langId(head).as("lang_head"),
        TextFunctions.langId(tail).as("lang_tail"))
      .withColumn("code_switch",
        col("lang_head") =!= col("lang_tail") &&
          col("lang_head") =!= "und" && col("lang_tail") =!= "und")
  }

  /** Per-document token-distribution stats — the gibberish/degenerate-text
    * detector that length and stopword rules miss: Shannon entropy of the
    * token histogram (a 60-token doc repeating one word has entropy 0; one
    * with 60 distinct tokens has ln 60), type-token ratio, and the top
    * token's share of the stream. Low entropy + high top-share = keyboard
    * mash, tag soup, or a template loop; flagged via `low_diversity`.
    *
    * Engine-portability: H = ln(n) − Σ c·ln(c) / n is computed with the
    * Σ term QUANTIZED — each per-token term contributes c·round(ln(c)·1e6)
    * to an exact integer sum (one double→long rounding per (doc, token)
    * GROUP, not per occurrence), so the cross-engine result is one
    * identical double expression over exact longs, not an
    * order-dependent float sum. ln(c)=0 at c=1, so singleton tokens —
    * the bulk — contribute exactly 0.
    *
    * 100 TB shape: explode → two groupBys co-keyed on the doc id (the
    * second rides the first's shuffle partitioning) — per-doc cost is
    * linear in the token count, no corpus-sized join, no window. The
    * low_diversity test is on the ROUNDED values (integer-grid exact
    * across engines). Output: (id, n_tokens, n_types, entropy, ttr,
    * top_share, low_diversity). */
  def tokenEntropyStats(df: DataFrame, idCol: String, textCol: String,
      minEntropy: Double = 2.0, maxTopShare: Double = 0.2): DataFrame = {
    val counts = df
      .select(col(idCol).as("id"),
        explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .groupBy(col("id"), col("tok"))
      .agg(count(lit(1)).as("c"))
    counts
      .groupBy(col("id"))
      .agg(
        sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        max(col("c")).as("max_c"),
        sum(col("c") * round(log(col("c").cast(DoubleType)) * lit(1e6))
          .cast("long")).as("ent_micro"))
      .select(col("id"), col("n_tokens"), col("n_types"),
        round(log(col("n_tokens").cast(DoubleType)) -
          col("ent_micro").cast(DoubleType) /
            (lit(1e6) * col("n_tokens").cast(DoubleType)), 6).as("entropy"),
        round(col("n_types").cast(DoubleType) /
          col("n_tokens").cast(DoubleType), 6).as("ttr"),
        round(col("max_c").cast(DoubleType) /
          col("n_tokens").cast(DoubleType), 6).as("top_share"))
      .withColumn("low_diversity",
        col("entropy") < minEntropy || col("top_share") > maxTopShare)
  }

  /** Flesch reading-ease score per document (Flesch 1948:
    * 206.835 - 1.015 * words/sentences - 84.6 * syllables/word) with the
    * standard corpus-scale proxies — syllables as vowel-group runs
    * ([aeiouy]+ on the lowercased text), sentences as terminal-punctuation
    * count (floored at 1). Readability joins length/entropy/stopword
    * signals in the quality-score family: very high scores flag
    * listy/fragmentary text, very low ones flag run-on boilerplate.
    *
    * One narrow projection, no shuffle, no UDF — the same
    * regexp-count shape as [[CorpusOps.piiScrub]]'s counters. Integer
    * counts into one double expression, exact cross-engine.
    */
  /** Token burstiness: the index of dispersion (variance-to-mean ratio,
    * Church & Gale 1995's burstiness observable) of each token's
    * per-document count across the WHOLE corpus (zero-count documents
    * included via the closed form). Content words are bursty — they
    * pile into the few documents about their topic (VMR >> 1) — while
    * function words spread evenly (VMR near 1); at corpus-QA time the
    * EXTREME tail is template/spam vocabulary: a token that appears
    * 400 times across 3 documents is boilerplate the df alone hides.
    * The per-token companion to [[tokenEntropyStats]]'s per-document
    * diversity.
    *
    * Exactness: df, total = Σc, s2 = Σc² are exact longs;
    * VMR = (N·s2 − total²) / ((N−1)·total) is ONE double expression
    * over them (kept in doubles — the long product N·s2 would overflow
    * at corpus scale), rounded once. Deterministic order
    * (vmr desc, token asc) makes the top-k unique.
    *
    * 100 TB shape: explode → (doc, token) partial-agged count →
    * token-frame reduce, with the 1-row corpus count broadcast in; the
    * top-k is a TakeOrdered over the vocab frame. */
  def tokenBurstiness(df: DataFrame, idCol: String, textCol: String,
      minDf: Long = 5, k: Int = 30): DataFrame = {
    require(k >= 1 && minDf >= 2, s"need k >= 1, minDf >= 2")
    val d = (c: Column) => c.cast(DoubleType)
    val perDoc = df.select(col(idCol).as("id"),
        explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .groupBy(col("id"), col("tok")).agg(count(lit(1)).as("c"))
    val tot = df.agg(count(lit(1)).as("n_docs"))
    perDoc.groupBy(col("tok"))
      .agg(count(lit(1)).as("doc_freq"), sum(col("c")).as("total"),
        sum(col("c") * col("c")).as("s2"))
      .filter(col("doc_freq") >= minDf)
      .crossJoin(broadcast(tot))
      .select(col("tok"), col("doc_freq"), col("total"),
        round((d(col("n_docs")) * d(col("s2")) -
            d(col("total")) * d(col("total"))) /
          (d(col("n_docs") - lit(1L)) * d(col("total"))), 6).as("vmr"))
      .orderBy(col("vmr").desc, col("tok").asc)
      .limit(k)
  }

  def readability(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val words = size(TextFunctions.tokens(col(textCol))).cast("long")
    val syllables = size(regexp_extract_all(lower(col(textCol)),
      lit("[aeiouy]+"), lit(0))).cast("long")
    val sentences = greatest(size(regexp_extract_all(col(textCol),
      lit("[.!?]"), lit(0))).cast("long"), lit(1L))
    df.select(col(idCol), words.as("n_words"),
        syllables.as("n_syllables"), sentences.as("n_sentences"))
      .filter(col("n_words") >= 1)
      .withColumn("flesch", round(lit(206.835) -
        lit(1.015) * (col("n_words").cast(DoubleType) /
          col("n_sentences").cast(DoubleType)) -
        lit(84.6) * (col("n_syllables").cast(DoubleType) /
          col("n_words").cast(DoubleType)), 6))
  }
}
