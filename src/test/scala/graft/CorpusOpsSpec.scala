package graft

import org.apache.spark.sql.functions._
import graft.operators.CorpusOps

/** Specs for the corpus-curation operators (splits, quotas, packing,
  * decontamination, PII scrubbing). The oracle-gated twins are
  * x17..x21 in SparkEntry. */
class CorpusOpsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "alpha beta gamma delta epsilon", "a"),
    (2L, "alpha beta gamma delta epsilon", "a"),
    (3L, "zeta eta theta iota kappa", "a"),
    (4L, "lambda mu nu xi omicron", "b"),
    (5L, "pi rho sigma tau upsilon", "b"),
    (6L, "phi chi psi omega alpha", "b")
  ).toDF("id", "text", "src")

  test("hashSplit is deterministic, exhaustive, and stable under corpus growth") {
    val s1 = CorpusOps.hashSplit(docs, "id").select("id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(s1.keySet == Set(1L, 2L, 3L, 4L, 5L, 6L))
    assert(s1.values.forall(Set("train", "val", "test")))
    // adding rows must not flip existing assignments (hash of own key only)
    val grown = docs.union(Seq((7L, "new doc", "c")).toDF("id", "text", "src"))
    val s2 = CorpusOps.hashSplit(grown, "id").select("id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    s1.foreach { case (k, v) => assert(s2(k) == v) }
    // rerun is byte-identical (no RNG)
    val s3 = CorpusOps.hashSplit(docs, "id").select("id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(s3 == s1)
  }

  test("hashSplit rejects shares that do not cover the bucket space") {
    intercept[IllegalArgumentException] {
      CorpusOps.hashSplit(docs, "id", shares = Seq("train" -> 50, "val" -> 20))
    }
  }

  test("hashSample keeps a stable subset, monotone in fraction") {
    val k40 = CorpusOps.hashSample(docs, "id", 0.4).select("id").as[Long].collect().toSet
    val k80 = CorpusOps.hashSample(docs, "id", 0.8).select("id").as[Long].collect().toSet
    assert(k40.subsetOf(k80))
    assert(CorpusOps.hashSample(docs, "id", 1.0).count() == 6)
    assert(CorpusOps.hashSample(docs, "id", 0.0).count() == 0)
  }

  test("quotaPerKey caps each key; pre-salted variant is result-identical") {
    val plain = CorpusOps.quotaPerKey(docs, "src", "id", cap = 2)
      .select("id").as[Long].collect().sorted
    assert(plain.toSeq == Seq(1L, 2L, 4L, 5L)) // first 2 ids of each src
    val salted = CorpusOps.quotaPerKey(docs, "src", "id", cap = 2, presaltBuckets = 3)
      .select("id").as[Long].collect().sorted
    assert(salted.toSeq == plain.toSeq)
  }

  test("packSequences computes exclusive offsets and chunk ids in order") {
    val d = Seq((1L, 300L), (2L, 300L), (3L, 100L), (4L, 500L))
      .toDF("id", "n_tokens")
    val packed = CorpusOps.packSequences(d, "id", "n_tokens", capacity = 512)
      .orderBy("id")
      .select("id", "start_offset", "chunk_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(packed.toSeq == Seq((1L, 0L, 0L), (2L, 300L, 0L), (3L, 600L, 1L), (4L, 700L, 1L)))
    // total offset+tokens of last doc = corpus token count
    assert(packed.last._2 + 500L == 1200L)
  }

  test("packSequences survives repartitioned input (offsets follow sort order)") {
    val d = Seq.tabulate(100)(i => (i.toLong, (i % 7 + 1).toLong))
      .toDF("id", "n_tokens").repartition(8)
    val packed = CorpusOps.packSequences(d, "id", "n_tokens", capacity = 10)
      .orderBy("id").select("id", "start_offset").as[(Long, Long)].collect()
    var expect = 0L
    packed.foreach { case (id, off) =>
      assert(off == expect, s"doc $id")
      expect += (id % 7 + 1)
    }
  }

  test("hashSplit/hashSample tolerate null keys (hash as empty string, never null split)") {
    val withNull = Seq((Some(1L), "x"), (None, "y")).toDF("id", "text")
    val split = CorpusOps.hashSplit(withNull, "id").select("split").collect()
    assert(split.forall(r => !r.isNullAt(0)))
    assert(CorpusOps.hashSample(withNull, "id", 1.0).count() == 2)
  }

  test("stratifiedSample: per-stratum rates, subset of hashSample, deterministic") {
    val many = (1L to 2000L).map(i =>
      (i, "txt", if (i % 2 == 0) "keep" else if (i % 3 == 0) "half" else "rest"))
      .toDF("id", "text", "src")
    val out = CorpusOps.stratifiedSample(many, "src", "id",
      fractions = Map("keep" -> 1.0, "half" -> 0.5), default = 0.0)
    val kept = out.select("id", "src").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // rate 1.0 keeps every row of its stratum; rate 0.0 keeps none
    assert(kept.count(_._2 == "keep") == 1000)
    assert(!kept.exists(_._2 == "rest"))
    // the 0.5 stratum keeps the SAME rows hashSample(0.5) would (one
    // shared md5-bucket rule, so strata compose with global sampling)
    val half = CorpusOps.hashSample(many.filter(col("src") === "half"), "id", 0.5)
      .select("id").as[Long].collect().toSet
    assert(kept.filter(_._2 == "half").map(_._1).toSet == half)
    // deterministic rerun
    val again = CorpusOps.stratifiedSample(many, "src", "id",
      fractions = Map("keep" -> 1.0, "half" -> 0.5), default = 0.0)
      .select("id").as[Long].collect().toSet
    assert(again == kept.map(_._1).toSet)
    assertThrows[IllegalArgumentException](
      CorpusOps.stratifiedSample(many, "src", "id", Map("keep" -> 1.5)))
  }

  test("topNgramsPerGroup ranks positional n-grams with lexicographic ties") {
    val df = Seq(
      (1L, "a b a b a b", "g1"),   // bigrams: "a b" x3, "b a" x2
      (2L, "c d", "g1"),           // "c d" x1
      (3L, "z z z", "g2"),         // "z z" x2
      (4L, "one", "g2")            // shorter than n: contributes nothing
    ).toDF("id", "text", "grp")
    val out = CorpusOps.topNgramsPerGroup(df, "grp", "text", n = 2, k = 2)
      .orderBy(col("grp"), col("rk"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      ("g1", 1L, "a b", 3L), ("g1", 2L, "b a", 2L),
      ("g2", 1L, "z z", 2L)))
  }

  test("mixToWeights hits the integer target ratio exactly, stable subset") {
    // 12/6/6 docs of three sources; weights 2:1:1 -> N=min(12*4/2,6*4,6*4)=24,
    // quotas = (12, 6, 6): all kept. Weights 1:1:2 -> N=min(48,24,12)=12,
    // quotas = (3, 3, 6): src c is the binding constraint
    val rows = (1 to 12).map(i => (i.toLong, "a")) ++
      (13 to 18).map(i => (i.toLong, "b")) ++ (19 to 24).map(i => (i.toLong, "c"))
    val df = rows.toDF("id", "src")
    val all = CorpusOps.mixToWeights(df, "src", "id", Map("a" -> 2, "b" -> 1, "c" -> 1))
    assert(all.count() == 24)
    val mixed = CorpusOps.mixToWeights(df, "src", "id", Map("a" -> 1, "b" -> 1, "c" -> 2))
    val bySrc = mixed.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc == Map("a" -> 3L, "b" -> 3L, "c" -> 6L))
    // deterministic: rerun selects the same ids
    val ids1 = mixed.select("id").as[Long].collect().sorted.toSeq
    val ids2 = CorpusOps.mixToWeights(df, "src", "id", Map("a" -> 1, "b" -> 1, "c" -> 2))
      .select("id").as[Long].collect().sorted.toSeq
    assert(ids1 == ids2)
    // sources outside the weight map are excluded entirely
    assert(!mixed.select("src").as[String].collect().contains("d"))
  }

  test("mixToWeights fails fast on a weighted source absent from the corpus") {
    // a missing source would force n=0 (empty mix) here, while a SQL
    // replay inner-joining quotas to present sources would keep mixing —
    // the engines must not silently diverge on a config typo
    val df = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("id", "src")
    val e = intercept[IllegalArgumentException](
      CorpusOps.mixToWeights(df, "src", "id", Map("a" -> 1, "b" -> 1, "nope" -> 2)))
    assert(e.getMessage.contains("nope"))
  }

  test("decontaminate flags exactly the docs sharing shingles with the benchmark") {
    val corpus = Seq(
      (10L, "alpha beta gamma delta epsilon"), // near-copy of bench doc 1
      (11L, "totally different words here now"),
      (12L, "zeta eta theta iota kappa")       // copy of bench doc 3
    ).toDF("doc_id", "text")
    val bench = docs.filter($"id" <= 3).select($"text")
    val hits = CorpusOps.decontaminate(corpus, bench, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hits.keySet == Set(10L, 12L))
    assert(hits(12L) == 3) // 5 words -> 3 trigrams, all shared
  }

  test("repetitionScores: dup-5gram fraction and top-bigram coverage") {
    val d = Seq(
      (1L, "a b c d e a b c d e"),     // 6 5-grams, 5 distinct -> 1/6; bigrams: 9 occurrences, "a b" x2 ... top = 2/9
      (2L, "x y z w v u t s r q"),     // all unique -> 0.0; every bigram once -> 1/9
      (3L, "short")                    // no 5-grams, no bigrams -> 0.0 / 0.0
    ).toDF("doc_id", "text")
    val out = CorpusOps.repetitionScores(d, "doc_id", "text")
      .orderBy("id")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(out(0)._2 === 1.0 - 5.0 / 6.0)
    assert(out(0)._3 === 2.0 / 9.0)
    assert(out(1)._2 === 0.0)
    assert(out(1)._3 === 1.0 / 9.0)
    assert(out(2) == ((3L, 0.0, 0.0)))
  }

  test("dedupAgainstHistory drops history matches and in-batch copies; accepts a precomputed fp index") {
    import graft.operators.Dedup
    val history = Seq((1L, "old doc one"), (2L, "old doc two")).toDF("id", "text")
    val batch = Seq(
      (10L, "old doc one"),   // exact history dup -> dropped
      (11L, "brand new doc"),
      (12L, "brand new doc"), // in-batch dup of 11 -> dropped (lowest id wins)
      (13L, "another new one")
    ).toDF("id", "text")
    val kept = Dedup.dedupAgainstHistory(batch, history, "id", "text")
      .select("id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(11L, 13L))
    // precomputed fingerprint index short-circuits re-hashing history
    val fpIndex = history.select(
      graft.functions.TextFunctions.fingerprint($"text").as("fp"))
    val kept2 = Dedup.dedupAgainstHistory(batch, fpIndex, "id", "text")
      .select("id").as[Long].collect().sorted.toSeq
    assert(kept2 == kept)
  }

  test("freshAgainstHistoryBloom == plain anti-join; Bloom probe has no false negatives") {
    import graft.operators.Dedup
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select($"doc_id", $"text")
    val history = docs.filter($"doc_id" < 100)
    val copies = docs.filter($"doc_id" < 5)
      .withColumn("doc_id", $"doc_id" + 10000)
    val batch = docs.filter($"doc_id" >= 100).unionByName(copies)
    val bloomed = Dedup.freshAgainstHistoryBloom(
      batch, history, "doc_id", "text", expectedItems = 500)
      .select("doc_id").as[Long].collect().sorted.toSeq
    // oracle: the plain exact anti-join (no Bloom), in-batch dups kept
    val fp = graft.functions.TextFunctions.fingerprint($"text")
    val exact = batch.withColumn("__fp", fp)
      .join(history.select(fp.as("__fp")).distinct(), Seq("__fp"), "left_anti")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(bloomed == exact)
    assert(bloomed.intersect(Seq(10000L, 10001L, 10002L)).isEmpty,
      "history copies must be dropped")
    // no false negatives: every inserted fingerprint must probe true
    val bytes = Dedup.buildFpBloom(
      history.select(fp.as("fp")).distinct(), "fp", expectedItems = 500)
    val probed = history.select(fp.as("fp")).distinct()
      .withColumn("hit",
        graft.functions.BloomExpression.mightContain(spark, $"fp", bytes))
      .filter(!$"hit").count()
    assert(probed == 0, "a Bloom filter must never miss an inserted key")
  }

  test("bloom expression: tiny-fpp filter rejects almost all absent keys") {
    import graft.operators.Dedup
    val present = (0 until 200).map(i => s"key_$i").toDF("fp")
    val bytes = Dedup.buildFpBloom(present, "fp", expectedItems = 200, fpp = 0.001)
    val absent = (0 until 2000).map(i => s"other_$i").toDF("fp")
      .withColumn("hit",
        graft.functions.BloomExpression.mightContain(spark, $"fp", bytes))
      .filter($"hit").count()
    // 2000 absent keys at fpp 1e-3: expect ~2 hits; 40 would mean broken sizing
    assert(absent < 40, s"false-positive count $absent is far above the fpp bound")
  }

  test("edge cases: empty inputs and degenerate quotas do not throw") {
    val empty = Seq.empty[(Long, Long)].toDF("id", "n_tokens")
    assert(CorpusOps.packSequences(empty, "id", "n_tokens", 512).count() == 0)
    val emptyDocs = Seq.empty[(Long, String, String)].toDF("id", "text", "src")
    assert(CorpusOps.hashSplit(emptyDocs, "id").count() == 0)
    assert(CorpusOps.quotaPerKey(emptyDocs, "src", "id", cap = 5).count() == 0)
    // a weighted source with zero rows is a config error, not an empty mix
    val oneSided = Seq((1L, "t", "a")).toDF("id", "text", "src")
    assertThrows[IllegalArgumentException](CorpusOps.mixToWeights(
      oneSided, "src", "id", Map("a" -> 1, "missing" -> 1)))
    // cap larger than any group is the identity
    val docs6 = docs
    assert(CorpusOps.quotaPerKey(docs6, "src", "id", cap = 100).count() == docs6.count())
  }

  test("piiScrub redacts emails and phones and counts them") {
    val d = Seq(
      (1L, "mail me at jo.doe+x@ex-ample.org or call 415-555-1234 ok"),
      (2L, "no pii here"),
      (3L, "two mails a@b.com c@d.org and 000-111-2222 333-444-5555")
    ).toDF("id", "text")
    val out = CorpusOps.piiScrub(d, "text")
      .select("id", "n_emails", "n_phones", "text_scrubbed")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toList
    assert(out(0) == ((1L, 1L, 1L, "mail me at <EMAIL> or call <PHONE> ok")))
    assert(out(1) == ((2L, 0L, 0L, "no pii here")))
    assert(out(2)._2 == 2L && out(2)._3 == 2L)
    assert(!out(2)._4.contains("@") && out(2)._4.contains("<PHONE>"))
  }

  test("scrubBoilerplate drops >num/den-docfreq units, preserves order, '' when all drop") {
    val d = Seq(
      (1L, "COOKIE NOTICE\nreal content one\nFOOTER"),
      (2L, "COOKIE NOTICE\nreal content two\nFOOTER"),
      (3L, "COOKIE NOTICE\nunique paragraph\nanother unique"),
      (4L, "COOKIE NOTICE\nFOOTER")
    ).toDF("id", "text")
    // threshold 1/2 of 4 docs = 2: COOKIE NOTICE (4 docs) and FOOTER (3) go
    val out = CorpusOps.scrubBoilerplate(d, "id", "text", delim = "\n")
      .orderBy("id").as[(Long, String)].collect().toSeq
    assert(out == Seq(
      (1L, "real content one"),
      (2L, "real content two"),
      (3L, "unique paragraph\nanother unique"),
      (4L, "")))
  }

  test("scrubBoilerplate repeated unit within ONE doc is not boilerplate (docfreq, not termfreq)") {
    val d = Seq(
      (1L, "x\nx\nx\nx\nx"), // 5 occurrences but only 1 document
      (2L, "y\nz")
    ).toDF("id", "text")
    val out = CorpusOps.scrubBoilerplate(d, "id", "text", delim = "\n")
      .orderBy("id").as[(Long, String)].collect().toSeq
    assert(out == Seq((1L, "x\nx\nx\nx\nx"), (2L, "y\nz")))
  }

  test("scrubBoilerplate scrub plan is narrow: no exchange, no re-explode") {
    val d = Seq((1L, "a\nb"), (2L, "a\nc")).toDF("id", "text")
    val plan = CorpusOps.scrubBoilerplate(d, "id", "text", delim = "\n")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"scrub output plan shuffles:\n$plan")
    assert(!plan.toLowerCase.contains("generate"), s"scrub output plan explodes:\n$plan")
  }

  test("scrubBoilerplate rejects a degenerate threshold") {
    assertThrows[IllegalArgumentException](
      CorpusOps.scrubBoilerplate(docs, "id", "text", num = 2, den = 2))
  }

  test("chunkDocuments: overlap, short remainder, and exact-window edges") {
    val d = Seq(
      (1L, "a b c d e"),      // n=5, w=3, s=2 -> [a b c][c d e]
      (2L, "a b c d e f"),    // n=6 -> [a b c][c d e][e f]
      (3L, "a b"),            // n<w -> one chunk of itself
      (4L, "a b c")           // n==w -> exactly one chunk
    ).toDF("id", "text")
    val out = CorpusOps.chunkDocuments(d, "id", "text", window = 3, stride = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getString(3))).toMap
    assert(out == Map(
      (1L, 0L) -> ((3L, "a b c")), (1L, 1L) -> ((3L, "c d e")),
      (2L, 0L) -> ((3L, "a b c")), (2L, 1L) -> ((3L, "c d e")),
      (2L, 2L) -> ((2L, "e f")),
      (3L, 0L) -> ((2L, "a b")),
      (4L, 0L) -> ((3L, "a b c"))))
  }

  test("chunkDocuments: chunking is one narrow Generate — no shuffle, no join") {
    val d = Seq((1L, "a b c d e")).toDF("id", "text")
    val plan = CorpusOps.chunkDocuments(d, "id", "text", 3, 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join"),
      s"chunking must stay narrow:\n$plan")
  }

  test("chunkDocuments rejects stride > window") {
    assertThrows[IllegalArgumentException](
      CorpusOps.chunkDocuments(docs, "id", "text", window = 3, stride = 4))
  }

  test("leakageSafeSplit: near-dup chains share a split, singletons split on their own id") {
    import spark.implicits._
    val corpus = (1L to 5L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    // chain 1~2, 2~3: all three must group together even though 1 and 3
    // never paired directly
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val out = CorpusOps.leakageSafeSplit(corpus, "doc_id", pairs)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(Seq(1L, 2L, 3L).map(out(_)._1).distinct == Seq(1L))
    assert(Seq(1L, 2L, 3L).map(out(_)._2).distinct.size == 1)
    assert(out(4L)._1 == 4L && out(5L)._1 == 5L)
    // the group split IS hashSplit of the group key: replay on doc 4
    val expected = CorpusOps.hashSplit(Seq(Tuple1(4L)).toDF("k"), "k")
      .collect().head.getString(1)
    assert(out(4L)._2 == expected)
  }

  test("balancedShards: snake deal, near-equal weights, partition-invariant") {
    // 32 docs with weights 32..1: snake over 4 shards must land every
    // consecutive weight-sorted block of 8 as one full snake period
    val df = (1L to 32L).map(i => (i, 33L - i)).toDF("doc_id", "w")
    val out = CorpusOps.balancedShards(df, "doc_id", "w", nShards = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // rank 1 (w=32) -> shard 0; rank 4 -> shard 3; rank 5 -> shard 3
    // (snake back); rank 8 -> shard 0
    assert(out(1L) == 0L && out(4L) == 3L && out(5L) == 3L && out(8L) == 0L)
    val sums = CorpusOps.balancedShards(df, "doc_id", "w", 4)
      .groupBy("shard").sum("w").collect().map(_.getLong(1))
    assert(sums.max - sums.min <= 4L, s"unbalanced: ${sums.toSeq}")
    val re = CorpusOps.balancedShards(df.repartition(7), "doc_id", "w", 4)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(re == out)
  }

  test("epochMix: full epochs + exact fractional threshold; zero budget drops the source") {
    val df = (1L to 10L).map(i => (i, if (i <= 5) "a" else "b", 10L))
      .toDF("doc_id", "source", "w") // T_a = T_b = 50
    // a: budget 120 -> 2 full epochs + 40% extra; b: 0 -> dropped
    val out = CorpusOps.epochMix(df, "doc_id", "source", "w",
      Map("a" -> 120L, "b" -> 0L))
    val rows = out.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(3)))
    assert(rows.forall(_._2 == "a"))
    val perDoc = rows.groupBy(_._1).view.mapValues(_.map(_._3).sorted.toSeq).toMap
    // every source-a doc appears 2 or 3 times with 1-based copy indexes
    assert(perDoc.keySet == (1L to 5L).toSet)
    assert(perDoc.values.forall(cs => cs == Seq(1L, 2L) || cs == Seq(1L, 2L, 3L)))
    // the extra-copy set replays the md5 per-million threshold exactly
    val extra = perDoc.filter(_._2.size == 3).keySet
    val thr = (120L % 50L) * 1000000L / 50L
    val replay = (1L to 5L).filter { id =>
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(h, 16) % 1000000L < thr
    }.toSet
    assert(extra == replay)
  }

  test("sourceOverlapMatrix: mirrors surface, disjoint sources absent") {
    val docs = Seq(
      ("A", "one two three four"),        // trigrams {1 2 3, 2 3 4}
      ("B", "one two three five"),        // shares {one two three} with A
      ("C", "p q r s")                    // disjoint
    ).toDF("source", "text")
    val out = CorpusOps.sourceOverlapMatrix(docs, "source", "text", n = 3)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(out(("A", "B")) == ((1L, 0.5))) // 1 shared / min(2, 2)
    assert(!out.contains(("A", "C")) && !out.contains(("B", "C")))
  }

  test("vocabGrowthCurve: dense quartiles, first-occurrence attribution, exact doc counts") {
    val docs = Seq((10L, "a b"), (20L, "a c"), (30L, "a b"), (40L, "d"))
      .toDF("doc_id", "text")
    val out = CorpusOps.vocabGrowthCurve(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      .sortBy(_._1)
    // first-seen ranks: a,b -> 1; c -> 2; d -> 4. Quartile 3 introduces
    // NOTHING and must still appear (the saturation signal)
    assert(out == Seq((1L, 1L, 2L), (2L, 2L, 3L), (3L, 3L, 3L),
      (4L, 4L, 4L)))
  }

  test("benchmarkOverlapReport: full/partial/zero coverage per eval item") {
    val corpus = Seq((100L, "x y q"), (101L, "p q r s")).toDF("doc_id", "text")
    // corpus bigrams: {x y, y q, p q, q r, r s}
    val bench = Seq(
      (1L, "x y q"),     // bigrams {x y, y q}: both present -> 1.0
      (2L, "x y z"),     // {x y, y z}: one present -> 0.5
      (3L, "m n o")      // {m n, n o}: none -> 0.0, row still emitted
    ).toDF("doc_id", "text")
    val out = CorpusOps.benchmarkOverlapReport(corpus, bench,
      "doc_id", "text", n = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out(1L) == ((2L, 2L, 1.0)))
    assert(out(2L) == ((2L, 1L, 0.5)))
    assert(out(3L) == ((2L, 0L, 0.0)))
  }

  test("vocabRichness: hand-counted f1/f2 and the bias-corrected Chao1; saturated vocab adds nothing") {
    // group "a": tokens alpha x3, beta x2, gamma x1, delta x1
    //   -> s_obs 4, f1 2, f2 1, chao1 = 4 + 2*1/(2*2) = 4.5
    val df = Seq(
      (1L, "alpha beta gamma", "a"),
      (2L, "alpha alpha beta delta", "a"),
      // group "b": every type repeated -> f1 0 -> chao1 = s_obs exactly
      (3L, "x y x y", "b")
    ).toDF("id", "text", "grp")
    val out = CorpusOps.vocabRichness(df, "grp", "text")
      .orderBy("grp").collect()
    assert(out(0).getLong(1) == 7L && out(0).getLong(2) == 4L)
    assert(out(0).getLong(3) == 2L && out(0).getLong(4) == 1L)
    assert(out(0).getDouble(5) == 4.5)
    assert(out(1).getLong(3) == 0L && out(1).getDouble(5) == 2.0)
  }

  test("giniConcentration: flat source scores 0, one dominating doc scores high; exact naive parity") {
    val flat = (1L to 4L).map(i => (i, "a b c", "flat"))
    val skew = Seq((10L, Seq.fill(97)("w").mkString(" "), "skew"),
      (11L, "w", "skew"), (12L, "w", "skew"), (13L, "w", "skew"))
    val out = CorpusOps.giniConcentration(
        (flat ++ skew).toDF("id", "text", "src"), "src", "text")
      .orderBy("src").collect()
    def naive(vs: Seq[Long]): Double = {
      val s = vs.sorted
      val n = s.size
      val num = s.zipWithIndex.map { case (x, i) => (i + 1).toLong * x }.sum
      val g = 2.0 * num / (n.toDouble * s.sum) - (n + 1.0) / n
      BigDecimal(g).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(out(0).getString(0) == "flat" && out(0).getDouble(3) == 0.0)
    assert(out(1).getLong(1) == 4L && out(1).getLong(2) == 100L)
    assert(out(1).getDouble(3) == naive(Seq(97L, 1L, 1L, 1L)))
    assert(out(1).getDouble(3) > 0.7) // one doc owns 97% of the mass
  }

  test("zipfSlope recovers an exact power law") {
    // freq(rank) = 2^(10-rank) for ranks 1..4 -> ln f = 10 ln 2 - rank ln 2;
    // over x = ln(rank) the OLS slope is NOT -ln2 (x is ln rank, not rank),
    // so build the fixture the other way: freq = round(1000 / rank) chosen
    // so f * rank is exact -> ln f = ln 1000 - ln rank, slope exactly -1
    val words = (1 to 4).flatMap { r =>
      val f = 1200 / r // 1200, 600, 400, 300 — exact integer ratios
      Seq.fill(f)(s"w$r")
    }
    val df = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
    val out = graft.operators.CorpusOps.zipfSlope(df, "text", topRanks = 4).head()
    assert(out.getLong(0) == 4L)
    assert(out.getDouble(1) == -1.0) // ln f = ln 1200 - 1 * ln r, exactly
    assert(math.abs(out.getDouble(2) - math.log(1200.0)) < 1e-5)
  }

  test("tokenizationStability counts exactly the docs that round-trip split/join") {
    val d = Seq(
      (1L, "a b c"),        // stable
      (2L, " a b c"),       // leading space
      (3L, "a  b c"),       // double space
      (4L, "a b c "),       // trailing space
      (5L, "a\tb c"),       // tab separator renormalizes to single space
      (6L, "single")        // stable
    ).toDF("doc_id", "text")
    val out = CorpusOps.tokenizationStability(d, "text")
      .collect().map(r => r.getBoolean(0) -> r.getLong(1)).toMap
    assert(out == Map(true -> 2L, false -> 4L))
  }

  test("heapsLaw: linear vocab growth fits beta=1, k=1 exactly; saturated vocab fits beta=0") {
    // every doc mints exactly one new token -> V(N) = N: the log-log
    // points sit on y = x, so the fold recovers slope 1 / intercept 0
    // with NO floating-point slack (x and y sums are identical doubles)
    val linear = (0L until 32L).map(i => (i, s"tok$i")).toDF("id", "text")
    val lin = CorpusOps.heapsLaw(linear, "id", "text",
      checkpoints = 16).collect()(0)
    assert(lin.getLong(0) == 16L)
    assert(lin.getDouble(1) == 1.0 && lin.getDouble(2) == 1.0, s"$lin")
    // constant text: V saturates at 3 from the first prefix -> beta 0,
    // k = the vocab size
    val flat = (0L until 32L).map(i => (i, "a b c")).toDF("id", "text")
    val fl = CorpusOps.heapsLaw(flat, "id", "text",
      checkpoints = 16).collect()(0)
    assert(fl.getDouble(1) == 0.0, s"$fl")
    // k = exp(round6(ln 3)) = 2.999999 — the 1e-6 intercept grid, not
    // a numeric wobble
    assert(math.abs(fl.getDouble(2) - 3.0) < 1e-5, s"$fl")
    // n-gram unit: 4 tokens -> 2 trigrams per doc, each doc's trigrams
    // unique -> V(N) = 2N and tokens(N) = 2N -> beta 1 again
    val tri = (0L until 32L).map(i =>
      (i, s"a$i b$i c$i d$i")).toDF("id", "text")
    val tr = CorpusOps.heapsLaw(tri, "id", "text",
      checkpoints = 16, n = 3).collect()(0)
    assert(tr.getDouble(1) == 1.0, s"$tr")
  }

  test("waterFillBudget: proportional below caps, saturation redistributes, flooring dust stays unallocated") {
    def mk(rows: (String, Long)*) =
      rows.toDF("src", "toks")
    // no cap binds: pure proportional split
    val a = CorpusOps.waterFillBudget(mk("a" -> 1000L, "b" -> 1000L),
        "src", "toks", Map("a" -> 1L, "b" -> 1L), budget = 100L)
      .orderBy("src").collect()
    assert(a.map(_.getLong(4)).toSeq == Seq(50L, 50L))
    assert(a.forall(!_.getBoolean(6)))
    // a 9x-weighted tiny source saturates at 1 epoch; its shortfall
    // water-fills into the big source over the later rounds
    val b = CorpusOps.waterFillBudget(mk("tiny" -> 10L, "big" -> 1000L),
        "src", "toks", Map("tiny" -> 9L, "big" -> 1L), budget = 100L)
      .orderBy("src").collect()
    val byK = b.map(r => r.getString(0) -> r).toMap
    assert(byK("tiny").getLong(4) == 10L && byK("tiny").getBoolean(6))
    assert(byK("tiny").getDouble(5) == 1.0) // exactly one epoch
    assert(byK("big").getLong(4) == 90L && !byK("big").getBoolean(6))
    // integer flooring: the odd token cannot split 1:1 and stays
    // unallocated (deterministic, documented)
    val c = CorpusOps.waterFillBudget(mk("a" -> 1000L, "b" -> 1000L),
        "src", "toks", Map("a" -> 1L, "b" -> 1L), budget = 101L)
      .orderBy("src").collect()
    assert(c.map(_.getLong(4)).sum == 100L)
    // zero-weight and zero-mass sources: no allocation; epochs NULL
    // only when the source has no mass at all
    val z = CorpusOps.waterFillBudget(
        mk("a" -> 100L, "w0" -> 100L, "m0" -> 0L),
        "src", "toks", Map("a" -> 1L, "m0" -> 1L), budget = 50L)
      .orderBy("src").collect()
    val zk = z.map(r => r.getString(0) -> r).toMap
    assert(zk("a").getLong(4) == 50L)
    assert(zk("w0").getLong(4) == 0L && !zk("w0").isNullAt(5))
    assert(zk("m0").getLong(4) == 0L && zk("m0").isNullAt(5))
  }

  test("selectionParity: exact type-1 median threshold, rate ratios vs the best group, 80%-rule flag") {
    // values: group g1 mostly above the median, g2 mostly below; the
    // pooled sorted values are 1..10 -> type-1 median = 5
    val rows = Seq(
      ("g1", 5L), ("g1", 7L), ("g1", 8L), ("g1", 9L), ("g1", 10L),
      ("g2", 1L), ("g2", 2L), ("g2", 3L), ("g2", 4L), ("g2", 6L)
    ).toDF("g", "v")
    val out = CorpusOps.selectionParity(rows, "g", "v")
      .orderBy("g").collect()
    val g1 = out(0); val g2 = out(1)
    // median 5: g1 selects all 5 (rate 1.0), g2 selects only the 6
    assert(g1.getLong(1) == 5L && g1.getLong(2) == 5L)
    assert(g1.getDouble(3) == 1.0 && g1.getDouble(4) == 1.0)
    assert(!g1.getBoolean(5))
    assert(g2.getLong(2) == 1L && g2.getDouble(3) == 0.2)
    assert(g2.getDouble(4) == 0.2 && g2.getBoolean(5),
      s"g2 must trip the four-fifths rule: $g2")
    // even split with ties at the boundary: median of 1,2,2,3 is 2
    // (cum(2)=3 >= ceil(4/2)); both groups select their 2s and 3s
    val tie = Seq(("a", 1L), ("a", 2L), ("b", 2L), ("b", 3L))
      .toDF("g", "v")
    val t = CorpusOps.selectionParity(tie, "g", "v")
      .orderBy("g").collect()
    assert(t(0).getLong(2) == 1L && t(1).getLong(2) == 2L)
  }

  test("shuffleRunAudit: run starts match a local replay; iid ratio near 1; single-group pins NULL") {
    val rows = (0L until 200L).map(i => (i, s"s${i % 4}")).toDF("id", "g")
    val out = CorpusOps.shuffleRunAudit(rows, "id", "g",
      seed = 3, nShards = 4).collect()(0)
    assert(out.getLong(0) == 200L && out.getLong(1) == 4L)
    // local replay: collect the shuffle order and count run starts
    val sh = CorpusOps.epochShuffle(rows, "id", seed = 3, nShards = 4)
      .orderBy("shard", "shard_pos")
      .collect().map(r => (r.getLong(2), r.getString(1)))
    val runs = sh.zipWithIndex.count { case ((shard, g), i) =>
      i == 0 || sh(i - 1)._1 != shard || sh(i - 1)._2 != g
    }
    assert(out.getLong(2) == runs.toLong, s"runs $runs vs $out")
    // 4 equal groups: E[run] = 1/(1-0.25) = 4/3 exactly
    assert(out.getDouble(4) == math.rint(4.0 / 3.0 * 1e6) / 1e6)
    assert(out.getDouble(5) > 0.5 && out.getDouble(5) < 2.0,
      s"a seeded hash order must interleave like iid: $out")
    // every row one group: the iid expectation diverges -> NULL pin
    val one = (0L until 40L).map(i => (i, "only")).toDF("id", "g")
    val o = CorpusOps.shuffleRunAudit(one, "id", "g",
      seed = 3, nShards = 4).collect()(0)
    assert(o.isNullAt(4) && o.isNullAt(5))
    assert(o.getLong(2) == 4L, "one run per shard")
  }

  test("paddingWaste: hand case — length sorting removes the mixed-batch padding") {
    import spark.implicits._
    // arrival (id order): lengths 1,10,1,10 at B=2 -> batches (1,10)
    // and (1,10): padded 40, total 22; sorted -> (1,1),(10,10):
    // padded 22, waste 0
    val df = Seq((1L, 1L), (2L, 10L), (3L, 1L), (4L, 10L))
      .toDF("doc_id", "len")
    val out = graft.operators.CorpusOps.paddingWaste(
        df, "doc_id", "len", batchSize = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    assert(out.toSeq == Seq(("arrival", 2L, 22L, 40L, 0.45),
      ("length_sorted", 2L, 22L, 22L, 0.0)))
    // a final partial batch still pads to its own max only
    val odd = Seq((1L, 4L), (2L, 4L), (3L, 9L)).toDF("doc_id", "len")
    val o2 = graft.operators.CorpusOps.paddingWaste(
        odd, "doc_id", "len", batchSize = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
    // both orders: (4,4)+(9): padded 8 + 9 = 17
    assert(o2.forall(t => t._2 == 2L && t._3 == 17L))
  }

  test("jackknifeVariance: delete-one-group pseudo-means match the hand fold; k<2 pins NULL") {
    import spark.implicits._
    // A: (1,2), B: (4) -> th_A = 4, th_B = 1.5, se = 1.25
    val df = Seq(("A", 1L), ("A", 2L), ("B", 4L)).toDF("src", "v")
    val out = graft.operators.CorpusOps.jackknifeVariance(df, "src", "v")
      .collect()(0)
    assert(out.getLong(0) == 2L && out.getLong(1) == 3L)
    assert(out.getDouble(2) == 2.333333)
    assert(out.getDouble(3) == 1.25)
    val one = graft.operators.CorpusOps.jackknifeVariance(
      Seq(("A", 1L), ("A", 3L)).toDF("src", "v"), "src", "v")
      .collect()(0)
    assert(one.isNullAt(3))
  }

  test("paretoFront: strict-domination semantics; equal points both stay on the front") {
    import spark.implicits._
    // A (3 docs, q=5), B (2, 9), C (1, 4), D (3, 5): C dominated by
    // A and B; A == D (no strict edge) -> both on front
    val df = Seq.fill(3)(("A", 5L)) ++ Seq(("B", 9L), ("B", 9L)) ++
      Seq(("C", 4L)) ++ Seq.fill(3)(("D", 5L))
    val out = graft.operators.CorpusOps.paretoFront(
        df.toDF("src", "v"), "src", "v")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getBoolean(3)))
    assert(out.toSeq == Seq(("A", 3L, 5.0, true), ("B", 2L, 9.0, true),
      ("C", 1L, 4.0, false), ("D", 3L, 5.0, true)))
  }

  test("looInfluence: closed form and the single-source NULL pin") {
    import spark.implicits._
    def r6(x: Double) = java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    val df = Seq(("A", 1L), ("A", 2L), ("B", 4L)).toDF("src", "v")
    val out = graft.operators.CorpusOps.looInfluence(df, "src", "v")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3)))
    assert(out(0) == (("A", 2L, 1.5, r6(4.0 - 7.0 / 3.0))))
    assert(out(1) == (("B", 1L, 4.0, r6(1.5 - 7.0 / 3.0))))
    val one = graft.operators.CorpusOps.looInfluence(
      Seq(("A", 1L), ("A", 3L)).toDF("src", "v"), "src", "v").collect()
    assert(one.length == 1 && one(0).isNullAt(3))
  }

  test("shapleyCoverage: closed-form 1/cvr credits match the hand game; efficiency holds on the microgrid") {
    import spark.implicits._
    // A: {a b c, b c d}; B: {a b c, b c x}; C: {p q r, q r s}
    // cvr: "a b c"=2, the other four are exclusive
    // shapley: A = 1/2 + 1 = 1.5, B = 1.5, C = 2
    val docs = Seq(
      ("A", "a b c d"), ("B", "a b c x"), ("C", "p q r s"))
      .toDF("src", "text")
    val out = graft.operators.CorpusOps.shapleyCoverage(
        docs, "src", "text", n = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(out.toSeq == Seq(("A", 2L, 1L, 1.5), ("B", 2L, 1L, 1.5),
      ("C", 2L, 2L, 2.0)))
    // efficiency: credits sum to the distinct-shingle count (5)
    assert(math.abs(out.map(_._4).sum - 5.0) < 1e-6)
  }

  test("tailOwnership: integer-exact thresholds, strictly-above tails, empty-tail NULL shares") {
    import spark.implicits._
    // values 1..10 one each: p90 = min v with cum*10 >= 90 -> 9;
    // p99 -> 10. Above-p90 tail = {10} (owned by B); above-p99 empty.
    val docs = ((1L to 5L).map(v => ("A", v)) ++
      (6L to 10L).map(v => ("B", v))).toDF("src", "v")
    val out = graft.operators.CorpusOps.tailOwnership(docs, "src", "v")
      .collect()
    assert(out.map(r => (r.getString(0), r.getLong(1), r.getLong(2),
      r.getLong(3))).toSeq == Seq(("A", 5L, 0L, 0L), ("B", 5L, 1L, 0L)))
    assert(out(0).getDouble(4) == 0.0 && out(1).getDouble(4) == 1.0)
    assert(out(0).isNullAt(5) && out(1).isNullAt(5))
  }

  test("prefixCacheAudit: corpus-wide prefix groups, per-source hit mass, short docs still group") {
    import spark.implicits._
    // prefix = first 2 tokens: "x y" shared by three docs ACROSS
    // sources; B's "z z" is unique (and shorter than most)
    val docs = Seq(("A", "x y 1"), ("A", "x y 2"), ("B", "x y 3"),
      ("B", "z z")).toDF("src", "text")
    val out = graft.operators.CorpusOps.prefixCacheAudit(
        docs, "src", "text", prefixTokens = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    assert(out.toSeq == Seq(("A", 2L, 1L, 2L, 1.0),
      ("B", 2L, 2L, 1L, 0.5)))
  }

  test("e11 flagship: the four valuation stages compose into the hand scorecard, ranked by Shapley") {
    import spark.implicits._
    // A x5 (len 10), B x4 (20), C x1 (100), D x2 (15); D's text equals
    // A's, so D is both Shapley-diluted and Pareto-dominated by B
    val docs = (Seq.fill(5)(("A", "a b c d", 10L)) ++
      Seq.fill(4)(("B", "a b c x", 20L)) ++
      Seq(("C", "p q r s", 100L)) ++
      Seq.fill(2)(("D", "a b c d", 15L)))
      .toDF("src", "text", "v")
    val out = graft.examples.SourceValuation.run(docs, "src", "text", "v")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getLong(5), r.getDouble(6),
        r.getBoolean(7), r.getLong(8)))
    // cvr("a b c")=3 (A,B,D), cvr("b c d")=2 (A,D), "b c x"/"p q r"/
    // "q r s" exclusive; micro terms 333333/500000/1000000
    assert(out.toSeq == Seq(
      ("C", 1L, 100.0, -7.121212, 2.0, 2L, 1.0, true, 1L),
      ("B", 4L, 20.0, 0.833333, 1.333333, 1L, 0.0, true, 2L),
      ("A", 5L, 10.0, 8.333333, 0.833333, 0L, 0.0, true, 3L),
      ("D", 2L, 15.0, 1.333333, 0.833333, 0L, 0.0, false, 4L)))
  }
}
