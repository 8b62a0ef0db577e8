package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Text/hash primitives for the training-data pipeline operators (dedup,
  * fingerprinting, language-ID, quality scoring). All pure built-in
  * expressions — codegen'd, no UDFs — and all deterministic across engines
  * (hashing goes through md5, which any oracle can replicate, rather than
  * engine-private hash functions).
  */
object TextFunctions {

  /** 60-bit deterministic hash: first 15 hex chars of md5 as a long.
    * DuckDB equivalent: `('0x' || substr(md5(x),1,15))::BIGINT`. */
  def md5Long(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast(LongType)

  /** Seeded variant for minhash families. */
  def md5LongSeeded(c: Column, seed: Int): Column =
    md5Long(concat(lit(s"$seed|"), c.cast("string")))

  /** Whitespace tokens. */
  def tokens(text: Column): Column = split(text, " ")

  /** Word n-gram shingles (distinct), as space-joined strings.
    * DuckDB equivalent: array_to_string(words[i:i+n-1], ' ') over
    * range(1, len-n+2). */
  def shingles(text: Column, n: Int): Column =
    array_distinct(ngrams(text, n))

  /** Word n-grams WITH duplicates (positional), as space-joined strings —
    * the repetition-measure base ([[shingles]] is the distinct set form).
    * Backed by the one-pass codegen'd [[NgramShingles]] expression
    * (string-identical to the former transform/slice/array_join HOF
    * chain, which ran interpreted and allocated per gram — the x116
    * hazard class; this is the hot scan under every shingle-keyed
    * operator). */
  def ngrams(text: Column, n: Int): Column = {
    require(n >= 1, "n must be >= 1")
    // columns are built on the driver, where an active session always
    // exists — the same self-registration pattern as MinhashExpression,
    // without threading a session through every TextFunctions caller
    val spark = org.apache.spark.sql.SparkSession.active
    NgramExpression.register(spark)
    org.apache.spark.sql.functions.call_function(
      NgramExpression.Name, tokens(text), org.apache.spark.sql.functions.lit(n))
  }

  /** Fraction of n-gram occurrences that are repeats of an earlier one:
    * 1 - distinct/total (0 for texts shorter than n tokens). The Gopher-
    * style "duplicate n-gram fraction" repetition signal, as a pure
    * scalar expression. */
  def dupNgramFraction(text: Column, n: Int): Column = {
    val g = ngrams(text, n)
    when(size(g) === 0, lit(0.0)).otherwise(
      lit(1.0) - size(array_distinct(g)).cast(DoubleType) / size(g).cast(DoubleType))
  }

  /** Token count (whitespace). */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** Exact-dedup fingerprint: md5 of whitespace-normalized lowercase text. */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** 60-bit rolling-style document fingerprint (numeric form). */
  def fingerprintLong(text: Column): Column =
    md5Long(regexp_replace(lower(trim(text)), "\\s+", " "))

  // ---- language-ID heuristic: stopword-hit scoring ----
  // (tiny per-language function-word lists; argmax with fixed tie order)
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it", "for", "on"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "zu", "mit", "auf", "nicht"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "dans", "pour", "que"))

  def stopwordHits(text: Column, lang: String): Column =
    size(filter(tokens(lower(text)), w => w.isin(stopwords(lang): _*)))

  /** Language-ID confidence margin: best stopword-hit count minus the
    * runner-up's — the ACCEPT/REVIEW signal next to [[langId]]'s hard
    * label (margin 0 = a coin flip between two languages; the x110
    * code-switch test and this margin together cover "mixed" and
    * "ambiguous", which a bare label conflates). Integer-exact:
    * max − second = 2·max + min − sum over the three hit counts. */
  def langIdMargin(text: Column): Column = {
    val en = stopwordHits(text, "en")
    val de = stopwordHits(text, "de")
    val fr = stopwordHits(text, "fr")
    lit(2) * greatest(en, de, fr) + least(en, de, fr) - (en + de + fr)
  }

  /** Predicted language: highest stopword-hit count, ties broken by
    * alphabetical language code, 'und' (undetermined) when no hits.
    * Fold runs over languages in reverse-alphabetical order taking >= so
    * the alphabetically-first language wins ties. */
  def langId(text: Column): Column = {
    val best = stopwords.keys.toSeq.sorted.reverse.map(l =>
      struct(stopwordHits(text, l).as("hits"), lit(l).as("lang")))
      .reduceLeft((a, b) => when(b("hits") >= a("hits"), b).otherwise(a))
    when(best("hits") > 0, best("lang")).otherwise(lit("und"))
  }

  // ---- quality scoring (length / punctuation / stopword ratios) ----

  def punctRatio(text: Column): Column = {
    val n = length(text)
    when(n === 0, lit(0.0)).otherwise(
      length(regexp_replace(text, "[^.,;:!?]", "")).cast(DoubleType) / n.cast(DoubleType))
  }

  def stopwordRatio(text: Column): Column = {
    val all = stopwords.values.flatten.toSeq.distinct
    val ws = tokens(lower(text))
    when(size(ws) === 0, lit(0.0)).otherwise(
      size(filter(ws, w => w.isin(all: _*))).cast(DoubleType) / size(ws).cast(DoubleType))
  }

  def meanTokenLen(text: Column): Column = {
    val ws = tokens(text)
    when(size(ws) === 0, lit(0.0)).otherwise(
      aggregate(ws, lit(0L), (acc, w) => acc + length(w)).cast(DoubleType)
        / size(ws).cast(DoubleType))
  }

  /** Composite quality score in [0,1]: rewards reasonable length and
    * stopword presence, penalizes punctuation soup. The formula is simple
    * arithmetic so an oracle can reproduce it exactly. */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text).cast(DoubleType)
    val lengthScore = least(nTok / lit(100.0), lit(1.0))
    val swScore = least(stopwordRatio(text) * lit(5.0), lit(1.0))
    val punctPenalty = least(punctRatio(text) * lit(5.0), lit(1.0))
    round((lengthScore * lit(0.5) + swScore * lit(0.3)) * (lit(1.0) - punctPenalty * lit(0.5)), 6)
  }
}
