package graft

import org.apache.spark.sql.functions._

import graft.operators.{GraphRank, Quantization, Selection}

/** DSIR importance weights, the hashed-BoW logistic classifier,
  * temperature mixing, TextRank, and product quantization — hand-computed
  * closed-form values on tiny inputs. */
class SelectionGraphPqSpec extends SparkSpec {
  import spark.implicits._

  // ---- DSIR ----

  test("dsirWeights: disjoint vocabularies give the closed-form log-ratio") {
    // target docs say only 'tok', raw-only docs say only 'row'; md5
    // buckets of the two tokens differ (deterministic fixed strings)
    val docs = Seq(
      (1L, "tok tok", "en"), (2L, "tok", "en"),
      (3L, "row row row", "de")
    ).toDF("doc_id", "text", "lang")
    val out = Selection.dsirWeights(docs, "doc_id", "text",
      target = col("lang") === "en", buckets = 64)
      .orderBy("doc_id").collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(2L, 1L, 3L)) // n_tok
    // corpus: tok x3 (all target), row x3 (none target); tr=6, tt=3
    val lrTok = math.log((3 + 1.0) / (3 + 64.0)) - math.log((3 + 1.0) / (6 + 64.0))
    val lrRow = math.log((0 + 1.0) / (3 + 64.0)) - math.log((3 + 1.0) / (6 + 64.0))
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(0).getDouble(2) == r6(2 * lrTok))
    assert(out(1).getDouble(2) == r6(lrTok))
    assert(out(2).getDouble(2) == r6(3 * lrRow))
    // the target-typical doc outranks the raw-only doc
    assert(out(0).getDouble(2) > out(2).getDouble(2))
  }

  test("weightDiagnostics: uniform weights give ESS = n / deff = 1; one dominating weight collapses ESS") {
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // logw = 0 for everyone -> w = 1e6 each -> ESS = n exactly
    val flat = (1L to 8L).map(i => (i, 0.0)).toDF("id", "lw")
    val f = Selection.weightDiagnostics(flat, "lw").collect()(0)
    assert(f.getLong(0) == 8L && f.getDouble(1) == 8.0)
    assert(f.getDouble(2) == 1.0 && f.getDouble(3) == 1.0)
    // one weight at the cap (w=1000), seven at w~0.001: naive Kish parity
    val skew = (Seq((1L, math.log(1000.0))) ++
      (2L to 8L).map(i => (i, math.log(0.001)))).toDF("id", "lw")
    val s = Selection.weightDiagnostics(skew, "lw").collect()(0)
    val ws = Seq(1000.0 * 1e6) ++ Seq.fill(7)(0.001 * 1e6)
    val wr = ws.map(w => math.round(w).toDouble)
    val ess = wr.sum * wr.sum / wr.map(w => w * w).sum
    assert(s.getDouble(1) == r6(ess))
    assert(s.getDouble(1) < 1.1) // the tilt is effectively ONE document
    assert(s.getDouble(3) == r6(8.0 / ess))
    // cap: a log-weight above ln(1000) clamps to the same grid point
    val capped = Seq((1L, 50.0), (2L, math.log(1000.0)))
      .toDF("id", "lw")
    val c = Selection.weightDiagnostics(capped, "lw").collect()(0)
    assert(c.getDouble(1) == 2.0 && c.getDouble(3) == 1.0)
  }

  test("intrinsicDimTwoNN: 1-D points give the exact micro-fold MLE; duplicate vectors are excluded") {
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // 1-D manifold embedded as single-element vectors at 0,1,3,7:
    // (d1,d2) squared: p0 (1,9), p1 (1,4), p2 (4,9), p3 (16,36)
    val vecs = Seq((0L, Seq(0.0f)), (1L, Seq(1.0f)), (2L, Seq(3.0f)),
      (3L, Seq(7.0f))).toDF("vec_id", "embedding")
    val out = graft.operators.Similarity.intrinsicDimTwoNN(
      vecs, "vec_id", "embedding", probeMod = 1L, probeCap = 100L)
      .collect().head
    val lnm = Seq(9.0 / 1, 4.0 / 1, 9.0 / 4, 36.0 / 16)
      .map(r => math.round(math.log(r) * 500000.0)).sum
    val r1m = Seq(1.0, 1.0, 4.0, 16.0)
      .map(d => math.round(math.sqrt(d) * 1e6)).sum
    assert(out.getLong(0) == 4L && out.getLong(1) == 4L)
    assert(out.getDouble(2) == r6(4.0 * 1e6 / lnm))
    assert(out.getDouble(3) == r6(r1m / 4.0 / 1e6))
    // an exact duplicate pair: both probes have r1 = 0 -> excluded
    val dup = Seq((0L, Seq(0.0f)), (1L, Seq(0.0f)), (2L, Seq(3.0f)))
      .toDF("vec_id", "embedding")
    val o2 = graft.operators.Similarity.intrinsicDimTwoNN(
      dup, "vec_id", "embedding", probeMod = 1L, probeCap = 100L)
      .collect().head
    assert(o2.getLong(0) == 3L && o2.getLong(1) == 1L)
  }

  test("mmdLinear: identical-mean halves score 0; shifted halves score the exact squared mean gap") {
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // find ids on each md5 arm so the construction controls the halves
    val ids = (1L to 20L)
    val arms = ids.map(Tuple1(_)).toDF("id")
      .withColumn("h", graft.functions.TextFunctions.md5Long(col("id")))
      .collect().map(r => r.getLong(0) -> r.getLong(1) % 2).toMap
    val a = ids.filter(arms(_) == 0L).take(2)
    val b = ids.filter(arms(_) == 1L).take(2)
    assume(a.length == 2 && b.length == 2)
    // same per-arm means -> mmd2 exactly 0
    val same = (a.map(i => (i, Seq(1.0f, 2.0f))) ++
      b.map(i => (i, Seq(1.0f, 2.0f)))).toDF("vec_id", "embedding")
    val s = graft.operators.Similarity.mmdLinear(same, "vec_id",
      "embedding").collect()(0)
    assert(s.getLong(0) == 2L && s.getLong(1) == 2L &&
      s.getDouble(2) == 0.0)
    // arm-1 mean shifted by (0.5, -0.25): mmd2 = 0.25 + 0.0625
    val shifted = (a.map(i => (i, Seq(1.0f, 2.0f))) ++
      b.map(i => (i, Seq(1.5f, 1.75f)))).toDF("vec_id", "embedding")
    val t = graft.operators.Similarity.mmdLinear(shifted, "vec_id",
      "embedding").collect()(0)
    assert(t.getDouble(2) == r6(0.25 + 0.0625))
    // ragged vector lengths: the closed form's global denominator would
    // silently mix per-dim counts — the round-10 guard raises in-plan
    val ragged = (a.map(i => (i, Seq(1.0f, 2.0f))) ++
      b.take(1).map(i => (i, Seq(1.5f))) ++
      b.drop(1).map(i => (i, Seq(1.5f, 1.75f))))
      .toDF("vec_id", "embedding")
    val ex = intercept[Exception] {
      graft.operators.Similarity.mmdLinear(ragged, "vec_id",
        "embedding").collect()
    }
    def rootMsg(e: Throwable): String =
      Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
        .map(t => Option(t.getMessage).getOrElse("")).mkString(" ")
    assert(rootMsg(ex).contains("ragged embedding dimensions"))
  }

  test("dimStats: microgrid mean/var per coordinate; a dead dim reports var 0") {
    val vecs = Seq((1L, Seq(1.0f, -1.0f, 0.5f)),
      (2L, Seq(3.0f, 1.0f, 0.5f))).toDF("vec_id", "embedding")
    val out = graft.operators.Similarity.dimStats(vecs, "embedding")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3)))
    // dim0: mean 2, E[x^2]=5 -> var 1; dim1: mean 0, var 1;
    // dim2 is dead: var exactly 0
    assert(out.toSeq == Seq((0L, 2L, 2.0, 1.0), (1L, 2L, 0.0, 1.0),
      (2L, 2L, 0.5, 0.0)))
  }

  test("budgetKnapsack: ratio order, exact integer budget, fractional boundary source") {
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // utilities (all shingles exclusive): A=1, B=2, C=3;
    // costs 5/7/9 bytes; budget = (21*2)//5 = 8 -> C fractional 8/9,
    // B and A priced out
    val docs = Seq(("A", "a b c"), ("B", "d e f g"),
      ("C", "h i j k l")).toDF("src", "text")
    val out = graft.operators.Selection.budgetKnapsack(
        docs, "src", "text")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getLong(5)))
    assert(out.toSeq == Seq(
      ("C", 3.0, 9L, r6(3.0 / 9.0), r6(8.0 / 9.0), 9L),
      ("B", 2.0, 7L, r6(2.0 / 7.0), 0.0, 16L),
      ("A", 1.0, 5L, r6(1.0 / 5.0), 0.0, 21L)))
  }

  test("greedyCoverSources: marginal-gain order, name tie-break, and zero-gain early stop") {
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // A: {abc,bcd,cde,def}; B: {abc,bcd,cdx,dxy}; C: {pqr,qrs}
    // total distinct = 8. Round 1: A and B tie at 4 -> A by name.
    // Round 2: B adds 2, C adds 2 -> B by name. Round 3: C adds 2.
    // Round 4: nothing uncovered -> early stop at 3 rows.
    val docs = Seq(
      ("A", "a b c d e f"), ("B", "a b c d x y"), ("C", "p q r s"))
      .toDF("src", "text")
    val out = Selection.greedyCoverSources(docs, "src", "text",
        k = 4, n = 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    assert(out.toSeq == Seq(
      (1L, "A", 4L, 4L, r6(4.0 / 8.0)),
      (2L, "B", 2L, 6L, r6(6.0 / 8.0)),
      (3L, "C", 2L, 8L, 1.0)))
  }

  // ---- hashed-BoW logistic classifier ----

  test("bowLogisticScore: one-step weights separate disjoint classes (hand case)") {
    // N=2; doc1 (y=1) is all 'aa', doc2 (y=0) all 'bb' -> x=1.0 in each
    // doc's own bucket. g_a=(0.5-1)/2=-0.25 -> w_a=+1 at lr=4; g_b=+0.25
    // -> w_b=-1; bias g=0 -> w0=0. p1=sigma(1), p2=sigma(-1).
    val docs = Seq((1L, "aa aa", "en"), (2L, "bb bb", "de"))
      .toDF("doc_id", "text", "lang")
    val out = Selection.bowLogisticScore(docs, "doc_id", "text",
      label = col("lang") === "en", buckets = 64, learningRate = 4.0)
      .orderBy("doc_id").collect()
    assert(out.map(_.getDouble(1)).toSeq == Seq(1.0, 0.0)) // labels
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(0).getDouble(2) == r6(1.0 / (1.0 + math.exp(-1.0))))
    assert(out(1).getDouble(2) == r6(1.0 / (1.0 + math.exp(1.0))))
  }

  test("bowLogisticScore: empty-text docs are excluded, mixed doc scores between the classes") {
    val docs = Seq(
      (1L, "aa aa aa aa", "en"), (2L, "bb bb bb bb", "de"),
      (3L, "aa bb aa bb", "de"), (4L, "", "en")
    ).toDF("doc_id", "text", "lang")
    val out = Selection.bowLogisticScore(docs, "doc_id", "text",
      label = col("lang") === "en").orderBy("doc_id").collect()
    // "" splits to one empty token (size 1) — still scored; only truly
    // tokenless frames would drop. Mixed doc sits strictly between.
    val p = out.map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(p(3L) < p(1L) && p(3L) > p(2L))
  }

  // ---- temperature mixing ----

  test("temperatureMixWeights: T=2 takes square roots, weights normalize") {
    val df = ((1 to 4).map(i => (i.toLong, "big")) :+ (5L, "small"))
      .toDF("doc_id", "source")
    val out = Selection.temperatureMixWeights(df, "source", temperature = 2.0)
      .orderBy("source").collect()
    // counts 4 and 1 -> sw 2 and 1 -> weights 2/3, 1/3
    assert(out.map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq ==
      Seq(("big", 4L, 0.666667), ("small", 1L, 0.333333)))
  }

  test("temperatureMixWeights: T=1 reduces to proportional mixing") {
    val df = ((1 to 3).map(i => (i.toLong, "a")) :+ (4L, "b"))
      .toDF("doc_id", "source")
    val out = Selection.temperatureMixWeights(df, "source", temperature = 1.0)
      .orderBy("source").collect()
    assert(out.map(_.getDouble(2)).toSeq == Seq(0.75, 0.25))
  }

  // ---- PageRank / TextRank ----

  test("pageRank: hand-computed two-node chain") {
    // a -> b: teleport 0.075; pr(a) stays teleport-only, pr(b) converges
    // to 0.075 + 0.85 * 0.075 = 0.13875 from iteration 2 on
    val edges = Seq(("a", "b", 1L)).toDF("src", "dst", "wt")
    val out = GraphRank.pageRank(edges, "src", "dst", "wt",
      damping = 0.85, iters = 3).orderBy("node").collect()
    assert(out.map(r => (r.getString(0), r.getDouble(1))).toSeq ==
      Seq(("a", 0.075), ("b", 0.13875)))
  }

  test("textRank: hub token collects rank; mass stays bounded") {
    // star: every doc is "x hub" -> edges x->hub from 3 distinct x
    val docs = Seq((1L, "a hub"), (2L, "b hub"), (3L, "c hub"))
      .toDF("doc_id", "text")
    val out = GraphRank.textRank(docs, "doc_id", "text").collect()
    val pr = out.map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(pr("hub") > pr("a") && pr("a") == pr("b") && pr("b") == pr("c"))
    assert(pr.values.sum <= 1.0 + 1e-6)
    assert(pr.values.forall(_ > 0.0))
  }

  test("textRank: single-token documents contribute no nodes") {
    val docs = Seq((1L, "a b"), (2L, "solo")).toDF("doc_id", "text")
    val nodes = GraphRank.textRank(docs, "doc_id", "text")
      .collect().map(_.getString(0)).toSet
    assert(nodes == Set("a", "b"))
  }

  // ---- product quantization ----

  test("pqCodes: vectors identical to a seed get that seed's code; ties go low") {
    // 4-dim vectors, m=2 subspaces of 2 dims, k=2 seeds (ids 0, 1)
    val vecs = Seq(
      (0L, Array(0f, 0f, 0f, 0f)), (1L, Array(1f, 1f, 1f, 1f)),
      (2L, Array(1f, 1f, 0f, 0f)), (3L, Array(9f, 9f, 9f, 9f))
    ).toDF("vec_id", "embedding")
    val out = Quantization.pqCodes(vecs, "vec_id", "embedding",
      m = 2, dsub = 2, k = 2)
      .orderBy("vec_id", "sub").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(
      (0L, 0L, 0L), (0L, 1L, 0L),  // equals seed 0
      (1L, 0L, 1L), (1L, 1L, 1L),  // equals seed 1
      (2L, 0L, 1L), (2L, 1L, 0L),  // split: first half near seed 1
      (3L, 0L, 1L), (3L, 1L, 1L))) // far, but seed 1 is nearer
  }

  test("adcTopK: distances are the table sums; quantization collapses cells") {
    val vecs = Seq(
      (0L, Array(0f, 0f, 0f, 0f)), (1L, Array(1f, 1f, 1f, 1f)),
      (2L, Array(1f, 1f, 1f, 1f)), (3L, Array(10f, 10f, 10f, 10f))
    ).toDF("vec_id", "embedding")
    val out = Quantization.adcTopK(vecs, "vec_id", "embedding",
      queryId = 0L, topK = 3, m = 2, dsub = 2, k = 2).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    // every non-query vector codes to seed 1 in both subspaces -> ADC
    // distance 2+2=4 for all three; ids break the tie
    assert(out.toSeq == Seq((1L, 4.0), (2L, 4.0), (3L, 4.0)))
  }

  test("adcTopK on real embeddings: self-consistent with exact distance on codebook cells") {
    val dir = "/root/testdata/sf0.001"
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val out = Quantization.adcTopK(e, "vec_id", "embedding",
      queryId = 0L, topK = 10)
    assert(out.count() == 10)
    val ds = out.collect().map(_.getDouble(1))
    assert(ds.toSeq == ds.sorted.toSeq && ds.forall(_ >= 0.0))
  }

  // ---- IVF-ADC composition ----

  test("ivfAdcTopK with nprobe = numCentroids degrades exactly to adcTopK") {
    val embs = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val full = Quantization.adcTopK(embs, "vec_id", "embedding",
      queryId = 0L, topK = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val ivf = Quantization.ivfAdcTopK(embs, "vec_id", "embedding",
      queryId = 0L, topK = 10, numCentroids = 8, nprobe = 8)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(ivf == full)
  }

  test("ivfAdcTopK partial probing returns true ADC distances for its candidates") {
    val embs = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val n = embs.count().toInt
    val all = Quantization.adcTopK(embs, "vec_id", "embedding",
      queryId = 0L, topK = n)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val ivf = Quantization.ivfAdcTopK(embs, "vec_id", "embedding",
      queryId = 0L, topK = 10, numCentroids = 8, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(ivf.nonEmpty && ivf.length <= 10)
    // pruning changes WHICH ids are scored, never their score
    ivf.foreach { case (id, d) => assert(all(id) == d, s"id=$id") }
    assert(ivf.map(_._2).toSeq == ivf.map(_._2).sorted.toSeq)
  }

  test("ivfAdcTopKWithIndex serves the identical result set to ivfAdcTopK") {
    val embs = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val direct = Quantization.ivfAdcTopK(embs, "vec_id", "embedding",
      queryId = 0L, topK = 20, numCentroids = 16, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val cb = Quantization.pqCodebook(embs, "vec_id", "embedding")
    val idx = Quantization.pqIndex(embs, "vec_id", "embedding", cb)
    val served = Quantization.ivfAdcTopKWithIndex(embs, idx, cb,
      "vec_id", "embedding", queryId = 0L, topK = 20,
      numCentroids = 16, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(served == direct)
    // ... and survives an index round-trip through parquet (the offline
    // build/serve split: the index is a persisted artifact, not a plan)
    val dir = java.nio.file.Files.createTempDirectory("graft_pq_idx").toString
    idx.write.mode("overwrite").parquet(s"$dir/index")
    cb.write.mode("overwrite").parquet(s"$dir/codebook")
    val served2 = Quantization.ivfAdcTopKWithIndex(embs,
      spark.read.parquet(s"$dir/index"), spark.read.parquet(s"$dir/codebook"),
      "vec_id", "embedding", queryId = 0L, topK = 20,
      numCentroids = 16, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(served2 == direct)
  }

  test("triangleCounts: one triangle + tail; 4-clique gives 3 per node; orientation-insensitive") {
    // triangle {1,2,3} plus the tail edge (3,4): nodes 1-3 get one
    // triangle each, node 4 is in none and absent
    val e1 = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L)).toDF("id_a", "id_b")
    val out1 = GraphRank.triangleCounts(e1, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out1 == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    // a 4-clique has C(3,2)=3 triangles through every node; reversed and
    // duplicated edges must not change the counts
    val clique = (for (a <- 1L to 4L; b <- 1L to 4L if a != b) yield (a, b))
      .toDF("id_a", "id_b") // both orientations + self-dedup exercised
    val out2 = GraphRank.triangleCounts(clique, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out2 == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  // ---- weighted sampling without replacement ----

  test("weightedSample: race keys match a JVM replay of the md5 formula") {
    val docs = Seq((1L, "g", 2.0), (7L, "g", 5.0), (13L, "g", 1.0),
      (2L, "h", 3.0), (8L, "h", 3.0)).toDF("id", "grp", "wt")
    val out = Selection.weightedSample(docs, "grp", "id", col("wt"), k = 10)
      .collect().map(r => r.getLong(1) -> (r.getDouble(2), r.getDouble(3))).toMap

    def expectedKey(id: Long, w: Double): Double = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 15)
      val u = (java.lang.Long.parseLong(hex, 16) % 1000000L + 1) / 1000001.0
      BigDecimal(-math.log(u) / w)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    for ((id, w) <- Seq((1L, 2.0), (7L, 5.0), (13L, 1.0), (2L, 3.0), (8L, 3.0)))
      assert(out(id) == ((w, expectedKey(id, w))), s"id=$id")
  }

  test("weightedSample: k bounds each group; ranks are 1..k; deterministic") {
    val docs = (1L to 40L).map(i => (i, if (i % 2 == 0) "even" else "odd"))
      .toDF("id", "grp")
    val run1 = Selection.weightedSample(docs, "grp", "id", lit(1.0), k = 5)
    val got = run1.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(4)))
    assert(got.length == 10)
    assert(got.groupBy(_._1).forall { case (_, rs) =>
      rs.map(_._3).sorted.toSeq == (1L to 5L) })
    val run2 = Selection.weightedSample(docs, "grp", "id", lit(1.0), k = 5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(4)))
    assert(got.toSet == run2.toSet)
  }

  test("weightedSample: presalted two-stage top-k is result-identical") {
    val docs = (1L to 200L).map(i => (i, if (i % 3 == 0) "a" else "b", 1.0 + i % 7))
      .toDF("id", "grp", "wt")
    val plain = Selection.weightedSample(docs, "grp", "id", col("wt"), k = 9)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(3), r.getLong(4)))
    val salted = Selection.weightedSample(docs, "grp", "id", col("wt"), k = 9,
        presaltBuckets = 8)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(3), r.getLong(4)))
    assert(plain.toSet == salted.toSet && salted.length == plain.length)
  }

  test("weightedSample: higher weight wins the race under equal uniforms") {
    // same id string -> same uniform is impossible (ids are the hash key),
    // so probe monotonicity directly: for one id, raising w lowers e
    val one = Seq((5L, "g")).toDF("id", "grp")
    val e1 = Selection.weightedSample(one, "grp", "id", lit(1.0), 1)
      .head().getDouble(3)
    val e4 = Selection.weightedSample(one, "grp", "id", lit(4.0), 1)
      .head().getDouble(3)
    assert(e4 < e1)
  }

  test("personalizedPageRank: closed-form chain from the seed; unreachable nodes exactly 0") {
    val edges = Seq(("a", "b", 1.0), ("b", "c", 1.0), ("d", "a", 1.0))
      .toDF("s", "d", "w")
    val seeds = Seq("a").toDF("w")
    val out = graft.operators.GraphRank
      .personalizedPageRank(edges, "s", "d", "w", seeds, "w")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // rv(a)=.15; r0(a)=1. Walk: r3(a)=.15 (d holds no mass to pass),
    // r3(b)=.85*.15, r3(c)=.85*.85*.15 -> wait: c receives b's PREVIOUS
    // mass each round; closed form below is the 3-iteration unroll:
    //   r1 = (a .15, b .85, c 0, d 0)
    //   r2 = (a .15, b .1275, c .7225, d 0)
    //   r3 = (a .15, b .1275, c .108375, d 0)
    assert(out("a") == 0.15)
    assert(out("b") == 0.1275)
    assert(out("c") == 0.108375)
    assert(out("d") == 0.0) // teleport never reaches a non-seed source
  }

  test("hardNegatives: most-similar-below-threshold wins; dups and self excluded") {
    val q = Seq((0L, Seq(1.0f, 0.0f))).toDF("id", "vec")
    val c = Seq(
      (0L, Seq(1.0f, 0.0f)),   // self: excluded
      (1L, Seq(2.0f, 0.0f)),   // cos 1.0 >= 0.9: a disguised dup, excluded
      (2L, Seq(1.0f, 1.0f)),   // cos ~.7071: the informative hard negative
      (3L, Seq(0.0f, 1.0f)),   // cos 0
      (4L, Seq(1.0f, 1.0f))    // same cos as 2 -> tie to LOWER id
    ).toDF("id", "vec")
    val out = graft.operators.Selection
      .hardNegatives(q, c, "id", "vec", dupThreshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.length == 1)
    assert(out.head._1 == 0L && out.head._2 == 2L)
    assert(math.abs(out.head._3 - math.sqrt(0.5)) < 1e-6)
  }

  test("reconstructionErrorProfile: seed vectors reconstruct exactly; off-seed error is hand-exact") {
    val vecs = Seq(
      (0L, Seq(0.0f, 0.0f)),
      (1L, Seq(1.0f, 1.0f)),
      (2L, Seq(0.4f, 0.4f))) // nearest seed (0,0): err = 2 * 0.4^2 = 0.32
    val out = graft.operators.Quantization.reconstructionErrorProfile(
      vecs.toDF("vec_id", "embedding"), "vec_id", "embedding",
      m = 1, dsub = 2, k = 2).head()
    assert(out.getLong(0) == 3L)
    val f = 0.4f.toDouble // the float literal's exact double value
    val err = 2 * f * f
    assert(math.abs(out.getDouble(1) - err / 3) < 1e-6) // mean
    assert(out.getDouble(2) == 0.0)                     // p50
    // p90: position 1.8 between sorted 0 and err
    assert(math.abs(out.getDouble(3) - 0.8 * err) < 1e-6)
    assert(math.abs(out.getDouble(4) - err) < 1e-6)     // max
  }

  test("powerIterationTop recovers a known principal direction and eigenvalue") {
    // rank-1 data along (0.6, 0.8) with weights (-2,-1,1,2) + a mean
    // offset: covariance = 2.5·uuᵀ, so one step is already exact and
    // three pinned steps must report eigenvalue 2.5, components (0.6,
    // 0.8) with the sign fixed at component 0
    val u = (0.6, 0.8)
    val data = Seq(-2.0, -1.0, 1.0, 2.0).zipWithIndex.map { case (t, i) =>
      (i.toLong, Seq((10.0 + t * u._1).toFloat, (5.0 + t * u._2).toFloat))
    }
    val out = graft.operators.Similarity.powerIterationTop(
      data.toDF("id", "vec"), "vec", iters = 3, dims = 2).head()
    assert(out.getLong(0) == 4L)
    assert(math.abs(out.getDouble(1) - 2.5) < 1e-5)
    assert(math.abs(out.getDouble(2) - 0.6) < 1e-5)
    assert(math.abs(out.getDouble(3) - 0.8) < 1e-5)
  }

  test("kCenterGreedy: farthest-first order and coverage radii are hand-exact") {
    val vecs = Seq(
      (0L, Seq(0.0f, 0.0f)),   // first (lowest id)
      (1L, Seq(10.0f, 0.0f)),  // farthest from 0 -> second, d=100
      (2L, Seq(0.0f, 1.0f)),   // stays near 0 -> last, d=1
      (3L, Seq(5.0f, 5.0f)))   // min(50 to v0, 50 to v1)=50 -> third
      .toDF("vec_id", "embedding")
    val out = graft.operators.Selection
      .kCenterGreedy(vecs, "vec_id", "embedding", k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      .sortBy(_._1)
    assert(out == Seq((1L, 0L, 0.0), (2L, 1L, 100.0), (3L, 3L, 50.0),
      (4L, 2L, 1.0)))
  }

  test("hardNegativesIvf: nprobe=numCentroids degenerates to the brute result exactly") {
    // with every bucket probed the candidate set IS the corpus, so the
    // scale path must reproduce hardNegatives bit-for-bit (same dot
    // order, same argmax tie-break) — the x156 cross-engine gate's
    // in-process twin
    val ids = (0L until 40L)
    val c = ids.map(i => (i, Seq.tabulate(8)(d =>
      (math.sin(i * 7.0 + d * 3.0) * 5.0).toFloat))).toDF("id", "vec")
    val q = c.filter(col("id") < 4)
    val brute = graft.operators.Selection
      .hardNegatives(q, c, "id", "vec", dupThreshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val ivfAll = graft.operators.Selection
      .hardNegativesIvf(q, c, "id", "vec", dupThreshold = 0.5,
        numCentroids = 8, nprobe = 8, dims = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(ivfAll == brute)
    // pruned probing returns a subset of queries, each with a candidate
    // drawn from its probed buckets and below the dup threshold
    val pruned = graft.operators.Selection
      .hardNegativesIvf(q, c, "id", "vec", dupThreshold = 0.5,
        numCentroids = 8, nprobe = 2, dims = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pruned.map(_._1).distinct.length == pruned.length)
    assert(pruned.forall(_._3 < 0.5))
    assert(pruned.forall(p => p._1 != p._2))
  }

  test("weightedQuantilesByKey: per-key thresholds match the global op per key") {
    val df = Seq(
      ("a", 1.0, 1L), ("a", 2.0, 1L), ("a", 3.0, 6L), ("a", 4.0, 2L),
      ("b", 10.0, 5L), ("b", 20.0, 5L)
    ).toDF("k", "v", "w")
    val out = graft.operators.Percentiles
      .weightedQuantilesByKey(df, "k", "v", "w", Seq(50, 90))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2))).toMap
    assert(out("a") == ((3.0, 4.0))) // the x104 fixture, keyed
    assert(out("b") == ((10.0, 20.0))) // cw: 5,10 -> p50 at 10, p90 at 20
    // agreement with the global operator restricted to one key
    val solo = graft.operators.Percentiles.weightedQuantiles(
      df.filter(col("k") === "a"), "v", "w", Seq(50, 90)).head()
    assert((solo.getDouble(0), solo.getDouble(1)) == out("a"))
  }

  test("weightedQuantiles: inverse-CDF thresholds, partition-invariant") {
    val df = Seq((1.0, 1L), (2.0, 1L), (3.0, 6L), (4.0, 2L))
      .toDF("v", "w")
    def run(d: org.apache.spark.sql.DataFrame) = graft.operators.Percentiles
      .weightedQuantiles(d, "v", "w", Seq(10, 50, 80, 90, 100))
      .head()
    val r = run(df)
    // W=10, cum = 1,2,8,10: p10 -> cw>=1 -> 1; p50 -> cw>=5 -> 3 (the
    // token-mass median, NOT the row median 2.x); p80 -> cw>=8 -> 3;
    // p90 -> cw>=9 -> 4; p100 -> 4
    assert((r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3),
      r.getDouble(4)) == ((1.0, 3.0, 3.0, 4.0, 4.0)))
    // the range-partitioned offsets make the answer partitioning-proof
    assert(run(df.repartition(7)) == r)
    // all weights equal degrades to the unweighted inverse-CDF quantile
    val eq = graft.operators.Percentiles.weightedQuantiles(
      Seq((1.0, 1L), (2.0, 1L), (3.0, 1L), (4.0, 1L)).toDF("v", "w"),
      "v", "w", Seq(25, 50, 75, 100)).head()
    assert((eq.getDouble(0), eq.getDouble(1), eq.getDouble(2),
      eq.getDouble(3)) == ((1.0, 2.0, 3.0, 4.0)))
  }

  // ---- SQ8 scalar quantization ----

  test("sq8: integer-grid corpus quantizes losslessly -> recall 1") {
    // values span exactly [0, 255] so scale = 1.0 and every code is the
    // value itself: reconstruction is bit-exact, rankings identical
    val e = Seq(
      (0L, Seq(0f, 10f, 20f, 255f)), (1L, Seq(1f, 11f, 21f, 254f)),
      (2L, Seq(100f, 90f, 80f, 70f)), (3L, Seq(0f, 0f, 0f, 1f))
    ).toDF("vec_id", "embedding")
    val (vmin, vmax, scale) = Quantization.sq8Params(e, "embedding")
    assert((vmin, vmax, scale) == ((0.0, 255.0, 1.0)))
    val codes = Quantization.sq8Index(e, "vec_id", "embedding", vmin, scale)
      .orderBy("vec_id").collect().map(_.getSeq[Int](1))
    assert(codes(0) == Seq(0, 10, 20, 255) && codes(3) == Seq(0, 0, 0, 1))
    val r = Quantization.sq8Recall(e, "vec_id", "embedding", 0L, k = 3)
      .head()
    assert(r.getLong(1) == 3L && r.getDouble(2) == 1.0)
  }

  test("sq8: reconstruction error bounded by scale/2 (half-up rounding)") {
    val e = Seq((0L, Seq(0f, 510f)), (1L, Seq(1f, 3f)), (2L, Seq(509f, 2f)))
      .toDF("vec_id", "embedding")
    val (vmin, _, scale) = Quantization.sq8Params(e, "embedding")
    assert(scale == 2.0)
    val idx = Quantization.sq8Index(e, "vec_id", "embedding", vmin, scale)
      .orderBy("vec_id").collect().map(_.getSeq[Int](1))
    // 1 -> floor(0.5+0.5)=1 -> recon 2 (err 1 = scale/2); 509 -> code 255
    assert(idx(1) == Seq(1, 2) && idx(2) == Seq(255, 1))
    assert(idx.flatten.forall(c => c >= 0 && c <= 255))
  }

  test("sq8RerankTopK: an all-corpus cut degrades to exact search; recall >= single-stage") {
    val e = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val n = e.count().toInt
    val exact = graft.operators.Similarity.bruteForceTopK(
      e.filter(col("vec_id") === 0), e, "vec_id", "embedding", 10)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toSeq
    val full = Quantization.sq8RerankTopK(
      e, "vec_id", "embedding", 0L, 10, candidates = n)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toSeq
    assert(full == exact) // cut covers the corpus -> re-rank IS exact
    val single = Quantization.sq8Recall(e, "vec_id", "embedding", 0L, 10)
      .head().getDouble(2)
    val rerank = Quantization.sq8RerankRecall(
      e, "vec_id", "embedding", 0L, 10, candidates = 50)
      .head().getDouble(2)
    assert(rerank >= single) // re-rank can only fix mistakes inside the cut
  }

  // ---- Matryoshka truncation recall ----

  test("matryoshkaRecall: full width is recall 1; a misleading prefix is not") {
    // full cosine: id2 (0.9, 0) is the true top-1 of q=(1,0); on the
    // 1-dim prefix both candidates tie at cos=1 and the id tie-break
    // picks id1 -> recall@1 = 0 at width 1, 1 at width 2
    val e = Seq(
      (0L, Seq(1f, 0f)), (1L, Seq(1f, 10f)), (2L, Seq(0.9f, 0f))
    ).toDF("vec_id", "embedding")
    val out = graft.operators.Similarity.matryoshkaRecall(
      e, "vec_id", "embedding", 0L, k = 1, widths = Seq(1, 2))
      .collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq ==
      Seq((1L, 0L, 0.0), (2L, 1L, 1.0)))
  }

  // ---- Johnson–Lindenstrauss projection audit ----

  test("jlDistortion: deterministic, excludes exact query copies, ratios near 1") {
    val vecs = (0L until 24L).map { id =>
      id -> Seq.tabulate(64)(i => (math.sin(id * 13.0 + i) * 3.0).toFloat)
    }
    // id 23 duplicates the query vector exactly -> d2_orig = 0, excluded
    val e = (vecs.dropRight(1) :+ (23L -> vecs.head._2))
      .toDF("vec_id", "embedding")
    val run1 = graft.operators.Similarity.jlDistortion(
      e, "vec_id", "embedding", 0L, kOut = 16, dims = 64).head()
    val run2 = graft.operators.Similarity.jlDistortion(
      e, "vec_id", "embedding", 0L, kOut = 16, dims = 64).head()
    assert(run1 == run2) // literal sign matrix: no RNG anywhere
    assert(run1.getLong(0) == 22L) // 24 - query - exact copy
    assert(run1.getDouble(1) > 0.5 && run1.getDouble(1) < 1.5) // mean ~1
    assert(run1.getDouble(3) > 0.0) // min ratio positive
    assert(run1.getDouble(4) < 3.0) // max ratio bounded
  }

  test("tokenBudgetSweep: deepest fitting cutoff per fraction, overflow at tiny budgets yields a zero row") {
    import spark.implicits._
    // values desc: q=3 (2 docs, 15 tok, cum 15), q=2 (1 doc, 20 tok,
    // cum 35), q=1 (2 docs, 10 tok, cum 45); total 45 tokens
    val rows = Seq((3L, 10L), (3L, 5L), (2L, 20L), (1L, 5L), (1L, 5L))
      .toDF("quality", "n_tok")
    val out = graft.operators.Selection.tokenBudgetSweep(rows,
        "quality", "n_tok", Seq((1, 45), (1, 3), (1, 2), (1, 1)))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2),
        Option(r.get(3)), r.getLong(4), r.getLong(5), Option(r.get(6))))
    assert(out.length == 4)
    // budget 1: nothing fits — null cutoff, zero volume, fill 0
    assert(out(0) == ((1, 45, 1L, None, 0L, 0L, Some(0.0))))
    // budget 15: exactly the q=3 group
    assert(out(1) == ((1, 3, 15L, Some(3L), 2L, 15L, Some(1.0))))
    // budget 22: q=2 would overflow (cum 35) — cutoff stays 3
    assert(out(2) == ((1, 2, 22L, Some(3L), 2L, 15L, Some(0.681818))))
    // budget 45: everything
    assert(out(3) == ((1, 1, 45L, Some(1L), 5L, 45L, Some(1.0))))
  }
}
