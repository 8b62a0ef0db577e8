package graft

import org.apache.spark.sql.functions._

import graft.operators.{LanguageModel, Retrieval, Similarity}

/** BM25 retrieval, bigram-LM quality scoring, and the k-means Lloyd step
  * — hand-computed closed-form values on tiny corpora. */
class RetrievalLmSpec extends SparkSpec {
  import spark.implicits._

  // ---- BM25 ----

  test("bm25TopK: tf ranking, zero-match exclusion, hand-computed score") {
    val docs = Seq(
      (1L, "cat dog"), (2L, "cat cat"), (3L, "bird")
    ).toDF("doc_id", "text")
    val out = Retrieval.bm25TopK(docs, "doc_id", "text",
      query = Seq("cat"), k = 10).collect()
    // doc 3 matches nothing -> excluded; doc 2 (tf=2) beats doc 1 (tf=1)
    assert(out.map(_.getLong(0)).toSeq == Seq(2L, 1L))
    // N=3, df=2, avgdl=5/3; idf=ln(1.6); d2: idf*2*2.2/(2+1.2*(0.25+0.75*2/(5/3)))
    val idf = math.log((3 - 2 + 0.5) / (2 + 0.5) + 1.0)
    val d2 = idf * (2.0 * 2.2) / (2.0 + 1.2 * (0.25 + 0.75 * 2.0 / (5.0 / 3.0)))
    assert(math.abs(out.head.getDouble(1) - d2) < 1e-6)
  }

  test("bm25TopK: k bounds the result; rarer term outscores common term") {
    // 'rare' in 1 of 4 docs, 'common' in all 4 — equal tf and length
    val docs = Seq(
      (1L, "rare pad"), (2L, "common pad"), (3L, "common pad"), (4L, "common pad")
    ).toDF("doc_id", "text")
    val out = Retrieval.bm25TopK(docs, "doc_id", "text",
      query = Seq("rare", "common"), k = 1).collect()
    assert(out.length == 1 && out.head.getLong(0) == 1L)
  }

  // ---- bigram LM ----

  test("bigramNll: hand-computed add-one-smoothed values") {
    // d1 'a b a b': bigrams ab,ba,ab; d2 'a b': ab
    // c2(ab)=3, c2(ba)=1, c1(a)=3, c1(b)=1, V=2
    val docs = Seq((1L, "a b a b"), (2L, "a b"), (3L, "solo"))
      .toDF("doc_id", "text")
    val out = LanguageModel.bigramNll(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    // doc 3 has < 2 tokens -> excluded
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    val lpAb = math.log(4.0 / 5.0); val lpBa = math.log(2.0 / 3.0)
    val want1 = BigDecimal(-(2 * lpAb + lpBa) / 3)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val want2 = BigDecimal(-lpAb)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(0).getLong(1) == 3L && out(0).getDouble(2) == want1)
    assert(out(1).getLong(1) == 1L && out(1).getDouble(2) == want2)
  }

  test("bigramNll: corpus-typical text scores lower nll than rare text") {
    val common = (1L to 8L).map(i => (i, "the cat sat on the mat"))
    val docs = (common :+ (9L -> "zyx qwv jkl pqr")).toDF("doc_id", "text")
    val nll = LanguageModel.bigramNll(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(nll(1L) < nll(9L))
  }

  test("bigramNll topV: pruned vocabulary maps tail tokens to <unk>") {
    // 'a b' dominates; with topV=2 every other token becomes <unk>, so
    // the two rare docs share identical <unk>-bigrams and identical nll
    val docs = (1L to 6L).map(i => (i, "a b a b"))
      .++(Seq(7L -> "qq ww", 8L -> "ee rr")).toDF("doc_id", "text")
    val nll = LanguageModel.bigramNll(docs, "doc_id", "text", topV = 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(nll(7L) == nll(8L))
  }

  // ---- k-means ----

  private val corpus = Seq(
    (10L, Array(2f, 0f)), (11L, Array(0f, 3f)), (12L, Array(1f, 1f))
  ).toDF("vec_id", "embedding")
  private val cents = Seq(
    (0, Array(1f, 0f)), (1, Array(0f, 1f))
  ).toDF("label", "embedding")

  test("lloydStep: cosine assignment + per-dim means, ties to lowest label") {
    // (2,0)->c0; (0,3)->c1; (1,1) ties (cos .7071 both) -> label 0
    val got = Similarity.lloydStep(corpus, cents,
      "vec_id", "embedding", "label", dims = 2)
      .orderBy("cluster", "dim")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq(
      (0, 1L, 1.5), (0, 2L, 0.5), (1, 1L, 0.0), (1, 2L, 3.0)))
  }

  // ---- quality bands / rule filter ----

  test("qualityBands: typical docs band head, rare docs band tail") {
    val docs = ((1L to 6L).map(i => (i, "the cat sat on the mat"))
      ++ Seq(7L -> "the cat sat on a rug", 8L -> "zz qq jj kk ww vv"))
      .toDF("doc_id", "text")
    val bands = graft.operators.LanguageModel
      .qualityBands(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(bands(1L) == "head")
    assert(bands(8L) == "tail")
    assert(bands.size == 8)
  }

  test("gopherFilter: each rule trips independently; clean doc keeps") {
    val good = "the cat sat on the mat with a dog and a bird nearby today"
    val docs = Seq(
      (1L, good),                                    // keeps
      (2L, "too short"),                             // r_len
      (3L, good + (" extraordinarily" * 3).trim),    // long words pull mean len
      (4L, ("the cat sat on mat " * 12).trim),       // dup 5-grams
      (5L, ("zz qq jj kk ww vv " * 3).trim)          // no stopwords
    ).toDF("doc_id", "text")
    val out = graft.operators.QualityFilters.gopherFilter(
      docs, "doc_id", "text",
      minTokens = 10, maxTokens = 100, minMeanLen = 2.0, maxMeanLen = 4.5,
      maxDup5gram = 0.3, minStopHits = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(1), r.getBoolean(2), r.getBoolean(3), r.getBoolean(4),
          r.getBoolean(5))).toMap
    assert(out(1L) == ((true, true, true, true, true)))
    assert(!out(2L)._1 && !out(2L)._5)               // too few tokens
    assert(!out(3L)._2 && !out(3L)._5)               // mean word length high
    assert(!out(4L)._3 && !out(4L)._5)               // repeated 5-grams
    assert(!out(5L)._4 && !out(5L)._5)               // no function words
  }

  test("kmeansFit: stable fixed point after the first iteration") {
    val fit = Similarity.kmeansFit(corpus, cents,
      "vec_id", "embedding", "label", dims = 2, iters = 2)
      .orderBy("label")
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1).toList).toMap
    assert(fit(0) == List(1.5, 0.5) && fit(1) == List(0.0, 3.0))
  }

  // ---- PMI collocations ----

  test("pmiCollocations: hand-computed PMI, minCount prunes, unigrams count all positions") {
    // one doc "x y x y x y": bigrams (x,y)x3 (y,x)x2 -> N_bi=5;
    // unigrams c_x=3 c_y=3, N_tok=6 (ALL positions, incl. the last token
    // that never starts a bigram)
    val docs = Seq((1L, "x y x y x y")).toDF("doc_id", "text")
    val out = LanguageModel.pmiCollocations(docs, "doc_id", "text", minCount = 3L)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    // (y,x) has c_ab=2 < 3 -> pruned
    assert(out.keySet == Set(("x", "y")))
    val expected = BigDecimal(math.log((3.0 * 6 * 6) / (5.0 * 3 * 3)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(("x", "y")) == ((3L, expected)))
  }

  test("pmiCollocations: single-token docs contribute nothing") {
    val docs = Seq((1L, "a b"), (2L, "a"), (3L, "b")).toDF("doc_id", "text")
    val out = LanguageModel.pmiCollocations(docs, "doc_id", "text", minCount = 1L)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    // docs 2,3 are <2 tokens: excluded from bigrams AND unigram totals,
    // so c_a=c_b=1, N_tok=2, N_bi=1 -> pmi = ln(1*2*2/(1*1*1)) = ln 4
    assert(out.keySet == Set(("a", "b")))
    val expected = BigDecimal(math.log(4.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(("a", "b")) == expected)
  }

  test("tfidfTopTerms: rare terms outrank common ones; k bounds per doc") {
    val docs = Seq(
      (1L, "the the the cat cat zebra"), // tf: the=3 cat=2 zebra=1
      (2L, "the dog"),
      (3L, "the cat dog")
    ).toDF("doc_id", "text")
    // N=3; df: the=3, cat=2, dog=2, zebra=1
    val out = Retrieval.tfidfTopTerms(docs, "doc_id", "text", k = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getString(2), r.getLong(3), r.getLong(4), r.getDouble(5)))
      .toMap
    // doc1 scores: zebra 1*3/1=3, cat 2*3/2=3, the 3*3/3=3 — all tie at 3;
    // ties break term-ascending: cat, the, zebra -> top2 = cat, the
    assert(out((1L, 1L))._1 == "cat" && out((1L, 1L))._4 == 3.0)
    assert(out((1L, 2L))._1 == "the")
    // doc2: dog 1*3/2=1.5 beats the 1*3/3=1
    assert(out((2L, 1L)) == (("dog", 1L, 2L, 1.5)))
    assert(out((2L, 2L)) == (("the", 1L, 3L, 1.0)))
    // k=2 bounds every doc (doc3 has 3 distinct terms)
    assert(out.keySet.map(_._2).max == 2L)
  }

  test("tokenMovers: side-heavy tokens lead their direction; balanced tokens don't") {
    val a = (1 to 10).map(i => (i.toLong, "alpha common")).toDF("id", "text")
    val b = (1 to 10).map(i => (i.toLong, "beta common")).toDF("id", "text")
    val out = graft.operators.LanguageModel.tokenMovers(a, b, "text", k = 1)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getString(2)))
      .toMap
    assert(out("up") == ((1L, "alpha")))   // only in A
    assert(out("down") == ((1L, "beta")))  // only in B
  }

  test("skipgramTopK: window pairs with interveners, short docs safe") {
    val docs = Seq(
      (1L, "turn the lights off"), // window 3: (turn,off) IS a pair
      (2L, "turn it off"),
      (3L, "x")                    // 1 token: no pairs, no crash
    ).toDF("doc_id", "text")
    val out = graft.operators.LanguageModel
      .skipgramTopK(docs, "text", window = 3, k = 50)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    // "turn ... off" co-occurs in BOTH docs despite different interveners
    // — the collocation adjacency (x56) cannot see
    assert(out(("turn", "off")) == 2L)
    assert(out(("turn", "the")) == 1L && out(("the", "lights")) == 1L)
    // pairs are ordered and window-bounded: no (off, turn); doc1's
    // distance-3 (turn, off) sits exactly at the window edge
    assert(!out.contains(("off", "turn")))
    // doc1: 6 pairs, doc2: 3 pairs, one key shared -> 8 distinct
    assert(out.size == 8)
  }

  test("trigramNllInterp: closed-form interpolated probabilities; rare docs score higher") {
    val docs = Seq((1L, "a b c"), (2L, "a b c"), (3L, "a b d"))
      .toDF("doc_id", "text")
    // counts: c3(a,b,c)=2 c3(a,b,d)=1; c2(a,b)=3 c2(b,c)=2 c2(b,d)=1;
    // c1: a=3 b=3 c=2 d=1; T=9 V=4
    def p(c3: Long, c2pref: Long, c2: Long, c1mid: Long, c1last: Long) =
      0.1 * (c1last + 1.0) / (9.0 + 1.0 * 4.0) +
        0.3 * (c2 + 1.0) / (c1mid + 1.0 * 4.0) +
        0.6 * (c3 + 1.0) / (c2pref + 1.0 * 4.0)
    val out = graft.operators.LanguageModel
      .trigramNllInterp(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    def r6(x: Double) = BigDecimal(x).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    // doc1/doc2: one trigram (a,b,c): p3 uses c2(a,b), p2 uses c2(b,c)
    // and c1(b), p1 uses c1(c)
    assert(out(1L) == ((1L, r6(-math.log(p(2L, 3L, 2L, 3L, 2L))))))
    assert(out(2L) == out(1L))
    // doc3's (a,b,d) is rarer at every level -> strictly higher nll
    assert(out(3L) == ((1L, r6(-math.log(p(1L, 3L, 1L, 3L, 1L))))))
    assert(out(3L)._2 > out(1L)._2)
  }

  test("rrfFuse: hand-computed fusion, absent ranks contribute zero") {
    val lex = Seq((1L, 5.0), (2L, 4.0), (3L, 3.0)).toDF("id", "score")
    val sem = Seq((2L, 0.9), (4L, 0.8)).toDF("id", "score")
    val out = Retrieval.rrfFuse(lex, sem, "id", k = 4, k0 = 10)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2),
          Option(r.get(3)).map(_.asInstanceOf[Long]),
          Option(r.get(4)).map(_.asInstanceOf[Long]))).toMap
    // ranks: lex 1->1, 2->2, 3->3; sem 2->1, 4->2 (k0 = 10):
    //   id2 = 1/12 + 1/11 ≈ .174242  (in both lists)
    //   id1 = 1/11 ≈ .090909, id4 = 1/12 ≈ .083333, id3 = 1/13 ≈ .076923
    assert(out(2L)._1 == 1L && out(1L)._1 == 2L &&
      out(4L)._1 == 3L && out(3L)._1 == 4L)
    assert(math.abs(out(2L)._2 - (1.0 / 12 + 1.0 / 11)) < 1e-6)
    assert(math.abs(out(4L)._2 - 1.0 / 12) < 1e-6)
    // a doc absent from one list carries a null rank there
    assert(out(4L)._3.isEmpty && out(4L)._4.contains(2L))
    assert(out(3L)._3.contains(3L) && out(3L)._4.isEmpty)
  }

  test("rrfFuse: k cuts the fused list, both-lists docs beat single-list ties") {
    // same scores => ranks follow id asc; doc in BOTH lists at rank 2
    // beats a doc at rank 1 of only one list iff 2/(k0+2) > 1/(k0+1)
    // (true for every k0 >= 0): membership in both lists dominates
    val lex = Seq((10L, 1.0), (20L, 0.9)).toDF("id", "score")
    val sem = Seq((30L, 1.0), (20L, 0.9)).toDF("id", "score")
    val out = Retrieval.rrfFuse(lex, sem, "id", k = 2, k0 = 60)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.length == 2)
    assert(out.head == ((20L, 1L))) // 2/62 > 1/61
  }
}
