package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Multimodal, Similarity}
import graft.streaming.EventStreams

/** Specs for the training-data pipeline extensions (dedup, similarity,
  * multimodal, streaming) beyond the DuckDB-oracle checks. */
class ExtensionOpsSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"
  private lazy val docs = Tables.load(spark, sfDir, "documents")
  private lazy val embs = Tables.load(spark, sfDir, "embeddings")

  test("exactDedup keeps lowest id per fingerprint") {
    val df = Seq((1L, "hello  world"), (2L, "Hello world"), (3L, "HELLO WORLD"), (4L, "other"))
      .toDF("id", "text")
    val out = Dedup.exactDedup(df, "id", "text")
    // normalization lowercases + collapses whitespace: ids 1,2,3 collapse
    assert(out.select("id").collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 4L))
  }

  test("canonicalPerCluster keeps argmax score per component, ties to lowest id, singletons kept") {
    val df = Seq(
      (1L, 10L), (2L, 30L), (3L, 30L), // cluster {1,2,3}: 2 and 3 tie at 30 -> keep 2
      (4L, 5L), (5L, 9L),              // cluster {4,5}: keep 5
      (6L, 7L)                         // singleton: keeps itself
    ).toDF("id", "len")
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("id_a", "id_b")
    val out = Dedup.canonicalPerCluster(df, pairs, "id", col("len"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(out == Set((1L, 2L, 3L, 30L), (4L, 5L, 2L, 9L), (6L, 6L, 1L, 7L)))
  }

  test("minhash LSH finds the same pairs as exact ngram jaccard (recall check)") {
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashLshPairs(docs, "doc_id", "text", 3, 0.8)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh == exact)
    assert(exact.nonEmpty) // the synthetic docs contain planted near-dups
  }

  test("minhash vs HISTORY == self-join pairs restricted to the cross split") {
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    val history = docs.filter(col("doc_id") % 10 === 0)
    val cross = Dedup.minhashLshPairsAgainst(corpus, history, "doc_id", "text")
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // ground truth: all near-dup pairs of the union, keeping only
    // (corpus, history) pairs — in either orientation of the self-join
    val all = Dedup.minhashLshPairs(docs, "doc_id", "text")
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = all.collect {
      case (a, b) if a % 10 != 0 && b % 10 == 0 => (a, b)
      case (a, b) if b % 10 != 0 && a % 10 == 0 => (b, a)
    }
    assert(cross == expected)
    assert(cross.nonEmpty)
  }

  test("sharedWindowPairs flags a copied passage that document-level jaccard dilutes") {
    val passage = "the quick brown fox jumps over the lazy dog tonight"
    val d = Seq(
      (1L, s"alpha beta gamma delta $passage epsilon zeta eta theta iota kappa " +
        "lam mu nu xi omicron pi rho sigma tau upsilon phi chi psi omega"),
      (2L, s"one two three four $passage five six seven eight nine ten eleven " +
        "twelve thirteen fourteen fifteen sixteen seventeen eighteen nineteen"),
      (3L, "entirely different content with no overlap at all whatsoever here")
    ).toDF("doc_id", "text")
    val pairs = Dedup.sharedWindowPairs(d, "doc_id", "text", k = 10)
      .as[(Long, Long, Long)].collect().toSet
    // the 10-word passage contributes exactly one shared 10-token window
    assert(pairs == Set((1L, 2L, 1L)))
    // document-level jaccard at the dedup threshold misses it entirely
    assert(Dedup.ngramJaccardPairs(d, "doc_id", "text", 3, 0.8).count() == 0)
  }

  test("sharedWindowPairs counts distinct shared windows; docFreq cap drops hot windows") {
    val d = Seq(
      (1L, "a b c d e f"), // windows of 3: "a b c","b c d","c d e","d e f"
      (2L, "a b c d x y"), // shares "a b c","b c d"
      (3L, "a b c z z z")  // shares "a b c" with 1 and 2
    ).toDF("doc_id", "text")
    val pairs = Dedup.sharedWindowPairs(d, "doc_id", "text", k = 3)
      .as[(Long, Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L, 2L), (1L, 3L, 1L), (2L, 3L, 1L)))
    // cap=2 kills "a b c" (docfreq 3); only the (1,2) "b c d" window survives
    val capped = Dedup.sharedWindowPairs(d, "doc_id", "text", k = 3,
      maxDocFreq = Some(2)).as[(Long, Long, Long)].collect().toSet
    assert(capped == Set((1L, 2L, 1L)))
  }

  test("graft_minhash expression signatures are bit-identical to the explode+agg plan") {
    val a = Dedup.minhashSignatures(docs, "doc_id", "text", n = 3, numHashes = 64)
    val b = Dedup.minhashSignaturesAgg(docs, "doc_id", "text", n = 3, numHashes = 64)
    assert(a.count() == b.count())
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    // empty-shingle docs drop from both plans
    val empty = Seq((1L, "only two"), (2L, "")).toDF("doc_id", "text")
    assert(Dedup.minhashSignatures(empty, "doc_id", "text", 3, 8).count() == 0)
    // ... and the narrow plan has NO exchange before the signature project
    val plan = a.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"signature stage still shuffles:\n$plan")
  }

  test("capped ngram jaccard (candidate + full-set verify) is pair- and value-identical to uncapped") {
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val exact = asMap(Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8))
    val capped = asMap(Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8,
      maxDocFreq = Some(20)))
    assert(capped == exact)
  }

  test("graft_simhash expression fingerprints are bit-identical to the explode+agg plan") {
    val a = Dedup.simhash(docs, "doc_id", "text")
    val b = Dedup.simhashAgg(docs, "doc_id", "text")
    assert(a.count() == b.count())
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    val plan = a.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"fingerprint stage still shuffles:\n$plan")
    // repeated tokens weight the sign-sums: "x x y" differs from "x y"
    // only by the count of x, and both plans agree on each
    val rep = Seq((1L, "x x y"), (2L, "x y")).toDF("doc_id", "text")
    assert(Dedup.simhash(rep, "doc_id", "text").exceptAll(
      Dedup.simhashAgg(rep, "doc_id", "text")).isEmpty)
  }

  test("simhash near-dup pairs are high word-set-jaccard pairs") {
    val sim = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 3)
    assert(sim.count() > 0)
    // simhash is bag-of-words: hamming<=3 pairs must share most of their
    // VOCABULARY (unigram jaccard), though word ORDER (3-grams) may differ
    val simPairs = sim.select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val vocabDups = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 1, 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(simPairs.subsetOf(vocabDups))
  }

  test("IVF top-k returns valid (possibly partial) neighbor lists; exact top-1 recall is decent") {
    val q = embs.filter(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(q, embs, "vec_id", "embedding", 5)
    val ivf = Similarity.ivfTopK(q, embs, "vec_id", "embedding", 5,
      numCentroids = 8, nprobe = 4)
    val exactTop1 = exact.filter(col("rank") === 1)
      .select("query_id", "neighbor_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ivfTop1 = ivf.filter(col("rank") === 1)
      .select("query_id", "neighbor_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ivfTop1.nonEmpty)
    val agree = exactTop1.count { case (k, v) => ivfTop1.get(k).contains(v) }
    // nprobe=4 of 8 centroids: expect at least ~half the top-1s found
    assert(agree >= exactTop1.size / 2,
      s"IVF top-1 recall too low: $agree/${exactTop1.size}")
  }

  test("nearestCentroid assigns max-cosine centroid, ties to lowest label") {
    val corpus = Seq(
      (1L, Array(1f, 0f)),    // exactly centroid 0's direction
      (2L, Array(0f, 2f)),    // exactly centroid 1's direction (norm-invariant)
      (3L, Array(1f, 1f)),    // equidistant: cos tie -> lowest label wins
      (4L, Array(-1f, -0.1f)) // both cosines negative; centroid 1 is least negative
    ).toDF("vec_id", "embedding")
    val centroids = Seq(
      (0, Array(2f, 0f)),
      (1, Array(0f, 1f))
    ).toDF("label", "embedding")
    val got = Similarity.nearestCentroid(corpus, centroids, "vec_id", "embedding", "label")
      .orderBy(col("vec_id"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    assert(got.map(g => g._1 -> g._2).toSeq ==
      Seq(1L -> 0, 2L -> 1, 3L -> 0, 4L -> 1))
    // (-1,-0.1): cos to (2,0) = -1/1.005 ~ -0.995; to (0,1) = -0.1/1.005 ~ -0.0995 -> centroid 1
    assert(math.abs(got(0)._3 - 1.0) < 1e-12) // exact-direction match has cos 1
    // every corpus vector gets exactly one row
    assert(got.length == 4)
  }

  test("nearestCentroid: string labels order lexically; zero-norm centroids lose") {
    // the tie-break is struct ordering, not numeric negation — any
    // orderable label type works; and a zero-norm centroid (NaN cosine)
    // must never beat a real one (NaN sorts above doubles in a bare max)
    val corpus = Seq((1L, Array(1f, 0f)), (2L, Array(0f, 1f)))
      .toDF("vec_id", "embedding")
    val centroids = Seq(
      ("east", Array(1f, 0f)),
      ("north", Array(0f, 1f)),
      ("degenerate", Array(0f, 0f)) // zero norm -> NaN cosine vs everything
    ).toDF("label", "embedding")
    val got = Similarity.nearestCentroid(corpus, centroids, "vec_id", "embedding", "label")
      .orderBy(col("vec_id"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq == Seq(1L -> "east", 2L -> "north"))
    // all-degenerate centroid set: the NaN guard still yields one row per
    // vector (lowest label), with the NaN cosine visible to the caller
    val onlyZero = Similarity.nearestCentroid(corpus,
      centroids.filter(col("label") === "degenerate"),
      "vec_id", "embedding", "label")
      .collect().map(r => (r.getString(1), r.getDouble(2)))
    assert(onlyZero.length == 2 &&
      onlyZero.forall { case (l, c) => l == "degenerate" && c.isNaN })
  }

  test("multimodal plumbing: binary payload + meta + stubbed per-partition decode") {
    val mm = Multimodal.asMultimodal(docs.limit(20), "text", "image", "source")
    val out = Multimodal.decodeStub(mm)
    val row = out.select("meta.byte_len", "features").head
    assert(row.getInt(0) > 0)
    val feats = row.getSeq[Float](1)
    assert(feats.length == 4)
    assert(feats.forall(f => f >= 0.0f && f < 1.0f))
    // determinism: same input bytes -> same features
    val out2 = Multimodal.decodeStub(mm)
    assert(out.select("features").collect().toSeq == out2.select("features").collect().toSeq)
  }

  test("multimodal resize/frame-sample stubs: byte shapes and meta stay consistent") {
    val mm = Multimodal.asMultimodal(docs.limit(10), "text", "video", "source")
    val resized = Multimodal.resizeStub(mm, targetBytes = 16)
    resized.select(octet_length(col("content")), col("meta.byte_len")).collect()
      .foreach { r =>
        assert(r.getInt(0) <= 16)
        assert(r.getInt(0) == r.getInt(1)) // meta tracks the new payload
      }
    val framed = Multimodal.frameSampleStub(mm, frames = 4)
    // 4 frames per source row, indexed 0..3, frames concatenate back into
    // a prefix of the original payload
    assert(framed.count() == 40)
    val byDoc = framed.select(col("doc_id"), col("frame_idx"), col("frame"))
      .collect().groupBy(_.getLong(0))
    byDoc.values.foreach { rows =>
      assert(rows.map(_.getInt(1)).sorted.toSeq == Seq(0, 1, 2, 3))
      val whole = rows.sortBy(_.getInt(1)).flatMap(_.getAs[Array[Byte]](2))
      assert(whole.nonEmpty)
    }
  }

  test("streaming windowed counts equal the batch window aggregation") {
    // stage the events parquet as a stream source directory
    val dir = java.nio.file.Files.createTempDirectory("graft_stream").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      java.nio.file.Paths.get(s"$dir/events.parquet"))

    val stream = EventStreams.readEvents(spark, dir)
    val sq = EventStreams.runToMemory(
      EventStreams.windowedCounts(stream, watermarkDelay = "0 seconds"),
      "win_counts", outputMode = "complete")
    try {
      val streamed = spark.table("win_counts")
        .select("hour_start", "event_type", "n", "sum_value")
      val batch = SparkEntry.queries("st1_window_agg")(spark, sfDir)
      assert(streamed.count() == batch.count())
      assert(streamed.exceptAll(batch.select("hour_start", "event_type", "n", "sum_value")).isEmpty)
    } finally sq.stop()
  }

  test("streaming freshness deltas are a lossless projection: replay through decayedVolume equals batch") {
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_fresh").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    val sq = EventStreams.runToMemory(
      EventStreams.freshnessStream(EventStreams.readEvents(spark, dir)),
      "fresh_stream", outputMode = "append")
    try {
      // the dashboard's bounded (key x day) frame
      val rolled = spark.table("fresh_stream")
        .groupBy(col("key"), col("dday")).agg(sum(col("delta")).as("n"))
      // lossless projection: replaying the rolled counts through the
      // batch operator reproduces its output exactly
      val rebuilt = rolled
        .withColumn("i", explode(sequence(lit(1L), col("n"))))
        .select(col("key"), col("dday").cast("timestamp").as("ts"))
      val fromStream = graft.operators.Temporal
        .decayedVolume(rebuilt, "ts", "key", halfLifeDays = 7)
        .collect().map(r => (r.getString(0), r.getLong(1),
          r.getDouble(2), r.getDouble(3))).toSeq
      val batch = graft.operators.Temporal.decayedVolume(
          Tables.load(spark, sfDir, "events"), "ts", "event_type",
          halfLifeDays = 7)
        .collect().map(r => (r.getString(0), r.getLong(1),
          r.getDouble(2), r.getDouble(3))).toSeq
      assert(fromStream == batch)
    } finally sq.stop()
  }

  test("streaming HLL distinct equals the batch sketch; state is register-bounded") {
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_hll").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    val stream = EventStreams.readEvents(spark, dir)
    @volatile var last: Array[(String, Long, Double)] = Array.empty
    val sq = EventStreams.hllDistinctStream(stream, "event_type", "user_id") {
      (est, _) =>
        last = est.collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    }
    try {
      val batch = graft.operators.Profile
        .hllDistinct(Tables.load(spark, sfDir, "events"), "event_type", "user_id")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      // commutative register max + deterministic hash => stream == batch
      assert(last.sortBy(_._1).toSeq == batch.sortBy(_._1).toSeq)
      // the streaming state is register cells, never values: <= 256/group
      assert(last.forall(_._2 <= 256L))
    } finally sq.stop()
  }

  test("session windows produce bounded per-user sessions") {
    val dir = java.nio.file.Files.createTempDirectory("graft_stream2").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    val stream = EventStreams.readEvents(spark, dir)
    val sq = EventStreams.runToMemory(
      EventStreams.sessionCounts(stream, gap = "30 minutes", watermarkDelay = "0 seconds"),
      "sess_counts", outputMode = "complete")
    try {
      val sess = spark.table("sess_counts")
      assert(sess.count() > 0)
      assert(sess.filter(col("session_end") < col("session_start")).isEmpty)
    } finally sq.stop()
  }

  test("stream-stream attribution join matches the batch twin (same code, batch mode)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_ss").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    val stream = EventStreams.readEvents(spark, dir)
    // stream-stream self-join: both sides are filters of one file stream;
    // inner joins emit in append mode as soon as both rows arrive
    val joined = EventStreams.attributionJoinStream(
      stream.filter(col("event_type") === "click"),
      stream.filter(col("event_type") === "view"),
      maxDelay = "2 hours", watermarkDelay = "0 seconds")
    val sq = EventStreams.runToMemory(joined, "attrib", outputMode = "append")
    try {
      val streamed = spark.table("attrib")
      val batch = SparkEntry.queries("st4_attribution_join")(spark, sfDir)
      assert(streamed.count() == batch.count() && batch.count() == 5)
      assert(streamed.exceptAll(
        batch.select(streamed.columns.map(col): _*)).isEmpty)
    } finally sq.stop()
  }

  test("stream-static enrichment join matches the batch lookup join (stateless, broadcast dim)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_stream3").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    val dim = Tables.load(spark, sfDir, "customer")
      .select(col("c_custkey"), col("c_mktsegment"))
    val stream = EventStreams.readEvents(spark, dir)
    val sq = EventStreams.runToMemory(
      EventStreams.enrichStream(stream, dim, "user_id", "c_custkey")
        .select(col("event_id"), col("c_mktsegment")),
      "enriched", outputMode = "append")
    try {
      val streamed = spark.table("enriched")
      val batch = Tables.load(spark, sfDir, "events")
        .join(dim, col("user_id") === col("c_custkey"), "left")
        .select(col("event_id"), col("c_mktsegment"))
      assert(streamed.count() == batch.count())
      assert(streamed.exceptAll(batch).isEmpty)
    } finally sq.stop()
  }

  test("foreachBatch incremental dedup: streamed batches drop history and in-batch duplicates") {
    import graft.streaming.CorpusStreams
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_docs").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/documents.parquet"),
      java.nio.file.Paths.get(s"$dir/documents.parquet"))
    val docs = Tables.load(spark, sfDir, "documents")
    // history = first half of the corpus; streamed file contains ALL docs,
    // so the history half must be dropped by the fingerprint anti-join
    val history = docs.filter(col("doc_id") < 250)
    val collected = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = CorpusStreams.incrementalDedupStream(
      CorpusStreams.readDocs(spark, dir), history) { (kept, _) =>
      collected.synchronized {
        collected ++= kept.select(col("doc_id")).collect().map(_.getLong(0))
      }
    }
    try {
      val expected = docs.filter(col("doc_id") >= 250)
        .select(col("doc_id")).collect().map(_.getLong(0)).sorted.toSeq
      assert(collected.sorted.toSeq == expected)
    } finally q.stop()
  }

  test("embedding near-dup: zero vectors pair with nothing instead of failing the job") {
    val df = Seq((1L, Array(0f, 0f)), (2L, Array(1f, 0f)), (3L, Array(1f, 0f)))
      .toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingCosinePairs(df, "vec_id", "embedding", 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((2L, 3L)))
  }

  test("semDedup equals brute-force pairs restricted to the same cluster") {
    val minIds = embs.groupBy(col("label").as("cl")).agg(min(col("vec_id")).as("cvid"))
    val centroids = embs.join(minIds,
        embs("label") === minIds("cl") && embs("vec_id") === minIds("cvid"))
      .select(col("label"), col("embedding"))
    val out = Dedup.semDedup(embs, centroids, "vec_id", "embedding", "label", 0.35)
      .select("vec_id").as[Long].collect().sorted.toSeq
    // naive replay: assign every vector, take ALL cosine pairs (brute
    // force), keep only same-cluster ones, drop the higher id of each
    val assigned = Similarity.nearestCentroid(embs, centroids, "vec_id", "embedding", "label")
      .select(col("vec_id"), col("label").as("cl"))
    val losers = Dedup.embeddingCosinePairs(embs, "vec_id", "embedding", 0.35)
      .join(assigned.toDF("id_a", "cl_a"), Seq("id_a"))
      .join(assigned.toDF("id_b", "cl_b"), Seq("id_b"))
      .filter(col("cl_a") === col("cl_b"))
      .select("id_b").as[Long].collect().toSet
    assert(losers.nonEmpty, "vacuous case: no within-cluster near-dups in the test data")
    val want = embs.select("vec_id").as[Long].collect()
      .filterNot(losers).sorted.toSeq
    assert(out == want)
  }

  test("nightly ingest with precomputed history indexes equals the recompute path") {
    // the production shape: the snapshot's fingerprint index (exactGroups
    // output) and band buckets are persisted artifacts, not recomputed —
    // result must be identical to the derive-everything entry point
    val batch = docs.filter(col("doc_id") % 10 =!= 0)
    val history = docs.filter(col("doc_id") % 10 === 0)
    val viaRun = graft.examples.IncrementalIngest.run(batch, history)
      .select("doc_id").as[Long].collect().sorted.toSeq
    val fpIndex = Dedup.exactGroups(history, "doc_id", "text").select(col("fp"))
    val bucketIndex = Dedup.minhashBandBuckets(
      history.select(col("doc_id"), col("text")), "doc_id", "text",
      numHashes = 32, bands = 8)
    val viaIndexes = graft.examples.IncrementalIngest.runWithIndexes(
        batch, history, fpIndex, bucketIndex)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(viaRun.nonEmpty && viaIndexes == viaRun)
  }

  test("foreachBatch nightly ingest matches the batch e2 pipeline on the same data") {
    import graft.streaming.CorpusStreams
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_ingest").toString
    val docs = Tables.load(spark, sfDir, "documents")
    val batch = docs.filter(col("doc_id") % 10 =!= 0)
    val history = docs.filter(col("doc_id") % 10 === 0)
    // the stream carries only the new batch (history predates the stream)
    batch.write.mode("overwrite").parquet(dir)
    val collected = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = CorpusStreams.nightlyIngestStream(
      CorpusStreams.readDocs(spark, dir), history) { (kept, _) =>
      collected.synchronized {
        collected ++= kept.select(col("doc_id")).collect().map(_.getLong(0))
      }
    }
    try {
      val expected = graft.examples.IncrementalIngest.run(batch, history)
        .select(col("doc_id")).collect().map(_.getLong(0)).sorted.toSeq
      assert(expected.nonEmpty && collected.sorted.toSeq == expected)
    } finally q.stop()
  }

  test("flatMapGroupsWithState running totals converge to the batch per-user aggregate") {
    val dir = java.nio.file.Files.createTempDirectory("graft_state").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    val stream = EventStreams.readEvents(spark, dir)
    val sq = EventStreams.runToMemory(
      EventStreams.runningUserTotals(stream).toDF(),
      "run_totals", outputMode = "update")
    try {
      // last emitted update per user = the final running state
      val finalRows = spark.table("run_totals")
        .groupBy(col("user_id"))
        .agg(max(col("n_events")).as("n_events"))
      val batch = Tables.load(spark, sfDir, "events")
        .groupBy(col("user_id")).agg(count(lit(1)).as("n_events"))
      assert(finalRows.join(batch, Seq("user_id"))
        .filter(finalRows("n_events") =!= batch("n_events")).isEmpty)
      assert(finalRows.count() == batch.count())
    } finally sq.stop()
  }

  test("streaming funnel state converges to the batch funnel walk") {
    val dir = java.nio.file.Files.createTempDirectory("graft_funnel").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    val steps = Seq("view", "click", "purchase")
    val sq = EventStreams.runToMemory(
      EventStreams.funnelStream(EventStreams.readEvents(spark, dir), steps)
        .toDF(), "funnel_stream", outputMode = "update")
    try {
      // depth is monotone, so the deepest emitted update = the final state
      val streamed = spark.table("funnel_stream")
        .groupBy(col("user_id"))
        .agg(max(col("steps_completed")).as("steps_completed"))
      val batch = graft.operators.EventAnalytics.funnel(
        Tables.load(spark, sfDir, "events"), "user_id", "event_type", "ts",
        steps).select(col("user_id"), col("steps_completed"))
      assert(streamed.count() == batch.count() && batch.count() > 0)
      assert(streamed.join(batch, Seq("user_id"))
        .filter(streamed("steps_completed") =!= batch("steps_completed"))
        .isEmpty)
    } finally sq.stop()
  }

  test("streaming debounce emits exactly the batch survivors") {
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_db").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    val sq = EventStreams.runToMemory(
      EventStreams.debounceStream(
        EventStreams.readEvents(spark, dir), withinSeconds = 600)
        .toDF("user_id", "event_type", "event_id", "ts_us"),
      "debounce_stream", outputMode = "append")
    try {
      val streamed = spark.table("debounce_stream")
        .select("event_id").collect().map(_.getLong(0)).toSet
      val batch = graft.operators.Temporal.debounce(
        Tables.load(spark, sfDir, "events"), "user_id", "event_type",
        "ts", "event_id", withinSeconds = 600)
        .select("event_id").collect().map(_.getLong(0)).toSet
      assert(batch.nonEmpty && streamed == batch)
      // O(1) state per key means survivors < raw events (bursts collapsed)
      assert(streamed.size < Tables.load(spark, sfDir, "events").count())
    } finally sq.stop()
  }

  test("percentile scale paths: exactSorted matches percentile(); approx is close") {
    val orders = Tables.load(spark, sfDir, "orders")
    val ps = Seq(0.5, 0.9, 0.99)
    val exact = graft.operators.Percentiles.exact(orders, "o_totalprice", ps).head()
    val sorted = graft.operators.Percentiles.exactSorted(orders, "o_totalprice", ps).head()
    val approx = graft.operators.Percentiles.approx(orders, "o_totalprice", ps).head()
    ps.indices.foreach { i =>
      // identical bracket + interpolation arithmetic -> bit-equal
      assert(exact.getDouble(i) == sorted.getDouble(i), s"p$i exactSorted")
      // GK sketch lands on a real value inside the bracket neighborhood
      assert(math.abs(exact.getDouble(i) - approx.getDouble(i))
        <= 0.05 * math.abs(exact.getDouble(i)), s"p$i approx")
    }
  }

  test("groupedSorted matches percentile() per group bit for bit, incl. tiny groups") {
    import spark.implicits._
    val orders = Tables.load(spark, sfDir, "orders")
    val ps = Seq(0.25, 0.5, 0.9)
    val names = Seq("a", "b", "c")
    val byWindow = graft.operators.Percentiles
      .groupedSorted(orders, "o_orderpriority", "o_totalprice", ps, names)
      .collect().map(r => r.getString(0) -> Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val byBuffer = orders.groupBy(col("o_orderpriority"))
      .agg(expr("percentile(o_totalprice, 0.25)"),
        expr("percentile(o_totalprice, 0.5)"),
        expr("percentile(o_totalprice, 0.9)"))
      .collect().map(r => r.getString(0) -> Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(byWindow.keySet == byBuffer.keySet)
    byBuffer.foreach { case (g, vs) => assert(byWindow(g) == vs, g) }
    // 1- and 2-element groups exercise the lo==hi and interpolation edges
    val tiny = Seq(("a", 10.0), ("b", 1.0), ("b", 2.0)).toDF("g", "v")
    val got = graft.operators.Percentiles.groupedSorted(tiny, "g", "v", Seq(0.5), Seq("p"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got == Map("a" -> 10.0, "b" -> 1.5))
  }

  test("histogram: exact-width bins, edge values, clamping, nulls dropped") {
    val vals = Seq(Some(0.0), Some(31.9), Some(32.0), Some(95.0), Some(-5.0),
      Some(1000.0), None).map(Tuple1(_)).toDF("v")
    // lo=0, hi=128, bins=4 -> width 32: [0,32) [32,64) [64,96) [96,128)
    val out = graft.operators.Profile.histogram(vals, "v", 0.0, 128.0, 4)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(out == Map(
      0L -> ((0.0, 3L)),   // 0.0, 31.9, and -5.0 clamped up
      1L -> ((32.0, 1L)),  // 32.0 lands exactly on its lower edge
      2L -> ((64.0, 1L)),  // 95.0
      3L -> ((96.0, 1L)))) // 1000.0 clamped down; null dropped
    // bins-bounded agg: one partial-agged groupBy, no window, no join
    val plan = graft.operators.Profile.histogram(vals, "v", 0.0, 128.0, 4)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_count") || plan.contains("HashAggregate"))
    assert(!plan.contains("Join") && !plan.contains("Window"))
  }

  test("profileApprox: exact counts/min/max, HLL distinct within tolerance, no Expand") {
    val cust = Tables.load(spark, sfDir, "customer")
      .select(col("c_custkey"), col("c_mktsegment"))
    def byCol(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(0) -> r).toMap
    val e = byCol(graft.operators.Profile.profile(cust))
    val a = byCol(graft.operators.Profile.profileApprox(cust))
    e.foreach { case (k, er) =>
      val ar = a(k)
      assert(er.getLong(1) == ar.getLong(1)) // n_rows
      assert(er.getLong(2) == ar.getLong(2)) // n_nulls
      assert(er.getString(4) == ar.getString(4) && er.getString(5) == ar.getString(5))
      val (ed, ad) = (er.getLong(3), ar.getLong(3))
      assert(math.abs(ed - ad).toDouble / math.max(ed, 1L) < 0.1, s"$k distinct")
    }
    // the approx aggregate plan must not contain the multi-distinct Expand
    // operator (HLL sketches aggregate in one pass)
    val aggPlan = cust.agg(
      count(lit(1)),
      approx_count_distinct(col("c_custkey")),
      approx_count_distinct(col("c_mktsegment")))
      .queryExecution.executedPlan.toString
    assert(!aggPlan.contains("Expand"))
  }

  test("hllDistinct: both regimes accurate, partitioning-invariant, no Expand") {
    // raw-harmonic regime: 3000 distincts >> m=256 -> within ~4 sigma
    // (sigma = 1.04/sqrt(256) = 6.5%); LC regime: 40 << 2.5m -> within 10%
    val big = spark.range(3000).selectExpr("'g' AS g", "CAST(id AS STRING) AS v")
    val small = spark.range(40).selectExpr("'h' AS g", "CAST(id + 90000 AS STRING) AS v")
    val df = big.union(small)
    def run(d: org.apache.spark.sql.DataFrame) =
      graft.operators.Profile.hllDistinct(d, "g", "v")
        .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    val out = run(df)
    assert(math.abs(out("g") - 3000.0) / 3000.0 < 0.26, s"raw est ${out("g")}")
    assert(math.abs(out("h") - 40.0) / 40.0 < 0.10, s"LC est ${out("h")}")
    // determinism: the estimate is a pure function of the value SET, not
    // of partitioning or row order (register max is commutative)
    assert(run(df.repartition(7)) == out)
    // sketch shape: max-rho cells then a bounded fold — no Expand, no Join
    val plan = graft.operators.Profile.hllDistinct(df, "g", "v")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Expand") && !plan.contains("Join"), plan)
  }

  test("codeSwitchFlags: mixed halves flag, monolingual and und halves don't") {
    val d = Seq(
      (1L, "the is of it der die das und"),       // en head, de tail -> flag
      (2L, "the a of and is it in for"),          // en both -> no flag
      (3L, "zz qq ww rr the a of and"),           // und head -> no flag
      (4L, "the a of")                            // 3 tokens: excluded
    ).toDF("doc_id", "text")
    val out = graft.operators.QualityFilters
      .codeSwitchFlags(d, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getString(2), r.getBoolean(3))).toMap
    assert(out(1L) == (("en", "de", true)))
    assert(out(2L) == (("en", "en", false)))
    assert(out(3L)._1 == "und" && !out(3L)._3)
    assert(!out.contains(4L))
  }

  test("corpusReportCard: one-row datasheet with exact rates") {
    val d = Seq(
      (1L, "the a of and", "web", 10L),
      (2L, "the a of and", "web", 10L),   // exact dup of doc 1
      (3L, "der und ist zu", "web", 20L),
      (4L, "zz qq ww", "books", 30L)
    ).toDF("doc_id", "text", "source", "n_chars")
    val r = graft.operators.Profile.corpusReportCard(d).head()
    assert(r.getLong(0) == 4L)         // n_docs
    assert(r.getLong(1) == 2L)         // n_sources
    assert(r.getLong(2) == 70L)        // total_chars
    assert(r.getDouble(3) == 0.25)     // dup_rate: 4 docs, 3 distinct fps
    assert(r.getDouble(4) == 0.5)      // pct_en: docs 1,2
    // mean quality equals the independent per-doc score average
    val qs = d.select(graft.functions.TextFunctions.qualityScore(col("text")))
      .collect().map(x => BigDecimal(x.getDouble(0)))
    assert(r.getDouble(5) == (qs.sum / 4).toDouble)
    assert(r.getDouble(6) == 15.0)     // p50 of 10,10,20,30
  }

  test("histogramByKey / modeByKey: per-key bins with clamping; mode ties to smallest value") {
    val d = Seq(("a", -5.0), ("a", 2.0), ("a", 99.0), ("b", 7.0))
      .toDF("k", "v")
    val h = graft.operators.Profile.histogramByKey(d, "k", "v", 0.0, 10.0, 2)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(3)).toMap
    // a: -5 clamps to bin 0, 2 -> bin 0, 99 clamps to bin 1; b: 7 -> bin 1
    assert(h == Map(("a", 0L) -> 2L, ("a", 1L) -> 1L, ("b", 1L) -> 1L))
    val m = graft.operators.Profile.modeByKey(
      Seq(("s1", "en"), ("s1", "en"), ("s1", "de"),
        ("s2", "fr"), ("s2", "de")).toDF("src", "lang"), "src", "lang")
      .collect().map(r => r.getString(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(m("s1") == (("en", 2L)))
    assert(m("s2") == (("de", 1L))) // 1-1 tie -> alphabetically first
  }

  test("psi: zero for identical distributions, positive for shifts, finite on empty bins") {
    val a = (1 to 100).map(i => (i % 10).toDouble).toDF("v")
    val same = graft.operators.Profile.psi(a, a, "v", 0.0, 10.0, 10).head()
    assert(same.getDouble(2) == 0.0)
    // shift all mass up by 5: heavy movement across bins
    val b = (1 to 100).map(i => (i % 10) / 2.0 ).toDF("v") // mass into low bins
    val shifted = graft.operators.Profile.psi(a, b, "v", 0.0, 10.0, 10).head()
    assert(shifted.getDouble(2) > 0.25, s"psi=${shifted.getDouble(2)}")
    assert(shifted.getLong(0) == 100L && shifted.getLong(1) == 100L)
  }

  test("dupFlowMatrix: literal copy traffic between sources, within-source dups invisible") {
    val d = Seq(
      ("A", "shared doc one"), ("B", "shared doc one"),   // A<->B copy
      ("A", "shared doc two"), ("C", "  Shared   DOC two "), // A<->C (formatting)
      ("B", "b only"), ("B", "b only"),                  // within-B dup: no pair
      ("C", "c only")
    ).toDF("source", "text")
    val out = Dedup.dupFlowMatrix(d, "source", "text")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(out == Map(("A", "B") -> 1L, ("A", "C") -> 1L))
  }

  test("smallCells / dedupSavings: suppression worklist and token accounting") {
    val d = Seq(
      ("en", "web", 1L, "alpha beta"), ("en", "web", 2L, "alpha beta"),
      ("en", "web", 3L, "gamma delta"),
      ("de", "web", 4L, "eins zwei drei")
    ).toDF("lang", "source", "doc_id", "text")
    val cells = graft.operators.Profile.smallCells(d, Seq("lang", "source"), 3L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(cells.toSeq == Seq(("de", "web", 1L))) // en-web has 3 rows: safe
    val sav = graft.operators.Dedup.dedupSavings(d, "doc_id", "text").head()
    // 2+2+2+3 = 9 total tokens; the duplicate "alpha beta" loses 2
    assert((sav.getLong(0), sav.getLong(1), sav.getLong(2)) == ((9L, 7L, 2L)))
    assert(sav.getDouble(3) == 2.0 / 9)
  }

  test("clusterCohesion: triangle is dense, chain is sparse, scores averaged") {
    // cluster A: triangle {1,2,3} (density 1); cluster B: chain 10-11-12
    // (density 2/3)
    val pairs = Seq(
      (1L, 2L, 0.9), (1L, 3L, 0.8), (2L, 3L, 1.0),
      (10L, 11L, 0.85), (11L, 12L, 0.95)
    ).toDF("id_a", "id_b", "jaccard")
    val out = Dedup.clusterCohesion(pairs, "id_a", "id_b", "jaccard")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(out(1L) == ((3L, 3L, 1.0, 0.9)))
    assert(out(10L)._1 == 3L && out(10L)._2 == 2L)
    assert(math.abs(out(10L)._3 - 2.0 / 3) < 1e-12)
    assert(out(10L)._4 == 0.9) // (0.85 + 0.95) / 2
  }

  test("langIdMargin: ambiguous docs margin 0, clear docs positive") {
    import graft.functions.TextFunctions
    val d = Seq(
      (1L, "the a of and to"),       // clearly en: margin 5
      (2L, "the der"),               // en-de coin flip: margin 0
      (3L, "zz qq")                  // no hits anywhere: margin 0
    ).toDF("doc_id", "text")
    val out = d.select(col("doc_id"),
      TextFunctions.langIdMargin(col("text")).cast("long").as("m"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 5L, 2L -> 0L, 3L -> 0L))
  }

  test("minhashCalibration: estimates track exact jaccard on the verified pair set") {
    val cal = Dedup.minhashCalibration(docs, "doc_id", "text", 3, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3)))
    assert(cal.nonEmpty)
    // 64-hash binomial estimator: sd <= 1/16 at any p; 4 sd tolerance
    cal.foreach { case (a, b, j, e) =>
      assert(math.abs(e - j) <= 0.25, s"pair ($a,$b): jaccard=$j est=$e")
    }
    // calibration rows cover EXACTLY the detector's pair set
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cal.map(t => (t._1, t._2)).toSet == exact)
  }

  test("lshPlanner: closed-form S-curve, monotone midpoints, chooses the r nearest the threshold") {
    val out = Dedup.lshPlanner(spark, threshold = 0.8, lowT = 0.6,
        highT = 0.9, totalHashes = 256, maxR = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6),
        r.getBoolean(7)))
    assert(out.length == 16 && out.map(_._1).toSeq == (1L to 16L))
    // budget respected, bands exact
    assert(out.forall(t => t._2 == 256L / t._1 && t._3 <= 256L))
    // curve midpoint rises with r (sharper curves sit later)
    assert(out.map(_._4).sliding(2).forall(w => w(0) < w(1)))
    // closed form replay for r=8, b=32
    val p = 1.0 - math.pow(1.0 - math.pow(0.8, 8.0), 32.0)
    assert(math.abs(out(7)._5 - p) < 1e-6)
    // exactly one chosen row, and its midpoint is the argmin distance
    val chosen = out.filter(_._8)
    assert(chosen.length == 1)
    assert(math.abs(chosen(0)._4 - 0.8) ==
      out.map(t => math.abs(t._4 - 0.8)).min)
    // at the chosen setting, true dups at 0.9 are nearly never missed
    assert(chosen(0)._7 < 0.05)
  }

  test("captureRecapture: Chapman estimate from two pair sets; empty-world pins coverage NULL") {
    import spark.implicits._
    val pa = Seq((1L, 2L), (3L, 4L), (5L, 6L)).toDF("id_a", "id_b")
    val pb = Seq((1L, 2L), (7L, 8L)).toDF("id_a", "id_b")
    val out = Dedup.captureRecapture(pa, pb).collect()(0)
    // n1=3, n2=2, m=1 -> (4*3)/2 - 1 = 5; coverages 0.6 / 0.4
    assert(out.getLong(0) == 3L && out.getLong(1) == 2L &&
      out.getLong(2) == 1L)
    assert(out.getDouble(3) == 5.0)
    assert(out.getDouble(4) == 0.6 && out.getDouble(5) == 0.4)
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    val o2 = Dedup.captureRecapture(empty, empty).collect()(0)
    assert(o2.getDouble(3) == 0.0 && o2.isNullAt(4) && o2.isNullAt(5))
  }

  test("pairAuditQueue: band-balanced, capped, partition-stable sampling") {
    // mid-band scores (x.x5) are floor-safe in doubles; a boundary score
    // of exactly 1.0 would clamp into the top band
    val pairs = (1 to 40).map(i =>
      (i.toLong, (i + 100).toLong, 0.55 + (i % 5) * 0.1)) // bands 5..9
      .toDF("id_a", "id_b", "score")
    def run(df: org.apache.spark.sql.DataFrame) = graft.operators.Dedup
      .pairAuditQueue(df, "id_a", "id_b", "score", bands = 10, perBand = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      .sorted
    val out = run(pairs)
    // 5 populated bands x 2 per band, rk always 1..2
    assert(out.length == 10)
    assert(out.map(_._1).distinct.sorted == Seq(5L, 6L, 7L, 8L, 9L))
    assert(out.forall(t => t._2 == 1L || t._2 == 2L))
    // the clamp: score exactly 1.0 lands in band 9, not a band 10
    val top = graft.operators.Dedup.pairAuditQueue(
      Seq((1L, 2L, 1.0)).toDF("id_a", "id_b", "score"),
      "id_a", "id_b", "score", bands = 10, perBand = 1)
      .head()
    assert(top.getLong(0) == 9L)
    // md5-keyed selection is partitioning-proof
    assert(run(pairs.repartition(7)) == out)
  }

  test("dupRateReport: formatting-only copies count as dups; clean source rates 0") {
    val d = Seq(
      ("web", 1L, "same doc"), ("web", 2L, "  Same   DOC "), // dup pair
      ("web", 3L, "unique one"),
      ("books", 4L, "alpha"), ("books", 5L, "beta")
    ).toDF("source", "doc_id", "text")
    val out = Dedup.dupRateReport(d, "source", "text")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out("web") == ((3L, 2L, 1.0 / 3)))
    assert(out("books") == ((2L, 2L, 0.0)))
  }

  test("noveltyScores: template-heavy docs score low, original docs high") {
    val template = "copyright footer terms of service apply here"
    val d = Seq(
      (1L, s"original insight number one $template"),
      (2L, s"different novel content here $template"),
      (3L, "completely standalone text nobody else shares at all")
    ).toDF("doc_id", "text")
    val out = Dedup.noveltyScores(d, "doc_id", "text", n = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
      .map(t => t._1 -> t).toMap
    // doc3 shares nothing: every shingle docfreq 1 -> novelty 1.0
    assert(out(3L)._4 == 1.0)
    // docs 1/2 share the template's trigrams -> strictly below 1
    assert(out(1L)._4 < 1.0 && out(2L)._4 < 1.0)
    // novelty = n_novel / n_shingles exactly
    out.values.foreach { case (_, ns, nn, nov) =>
      assert(nov == nn.toDouble / ns.toDouble)
    }
  }

  test("quantileNormalize: endpoints map to pooled extremes, interior interpolates") {
    // pooled sorted values: 0,1,2,3,5,6,10,100 (N=8)
    val df = Seq(
      ("a", 1L, 1.0), ("a", 2L, 3.0), ("a", 3L, 100.0),
      ("b", 4L, 2.0), ("b", 5L, 10.0),
      ("c", 6L, 0.0), ("c", 7L, 5.0), ("c", 8L, 6.0)
    ).toDF("src", "id", "score")
    val out = graft.operators.Percentiles
      .quantileNormalize(df, "src", "id", "score")
      .collect().map(r => r.getLong(1) -> r.getDouble(3)).toMap
    // every source's min maps to the pooled min, max to the pooled max
    assert(out(1L) == 0.0 && out(3L) == 100.0)
    assert(out(4L) == 0.0 && out(5L) == 100.0)
    assert(out(6L) == 0.0 && out(8L) == 100.0)
    // a 3-element source's middle rank (p = .5) lands at pooled pos
    // 0.5 * 7 = 3.5 -> halfway between the 4th (3) and 5th (5) value
    assert(out(2L) == 4.0 && out(7L) == 4.0)
  }

  test("rollingHllDistinct: window 1 == per-bucket sketch; wide window == global sketch") {
    val events = Tables.load(spark, sfDir, "events")
    val day = 86400000000L
    val roll1 = graft.operators.Profile
      .rollingHllDistinct(events, "ts", "user_id", 86400L, 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val perBucket = graft.operators.Profile.hllDistinct(
      events.select(expr(s"unix_micros(ts) div $day").as("bk"),
        col("user_id").as("v")), "bk", "v")
      .collect().map(r => (r.getLong(0) * day, r.getLong(1), r.getDouble(2)))
    assert(roll1.sortBy(_._1).toSeq == perBucket.sortBy(_._1).toSeq)
    // a window covering the whole span makes the LAST bucket the global
    // sketch (register max over everything)
    val rollAll = graft.operators.Profile
      .rollingHllDistinct(events, "ts", "user_id", 86400L, 100000)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val global = graft.operators.Profile.hllDistinct(
      events.select(lit(1L).as("g"), col("user_id").as("v")), "g", "v")
      .collect().map(r => (r.getLong(1), r.getDouble(2))).head
    val last = rollAll.maxBy(_._1)
    assert((last._2, last._3) == global)
  }

  test("madOutliers: only the heavy tail trips; constant groups flag nothing") {
    val df = (Seq((1.0, 1L), (2.0, 2L), (3.0, 3L), (4.0, 4L), (5.0, 5L),
      (100.0, 6L)).map { case (v, i) => ("g", i, v) } ++
      Seq(7L, 8L, 9L).map(i => ("h", i, 42.0)))
      .toDF("grp", "id", "v")
    val out = graft.operators.Percentiles
      .madOutliers(df, "grp", "id", "v", k = 3.0)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    // g: median 3.5, MAD 1.5 -> only |100 - 3.5| = 96.5 > 4.5 trips
    // (a mean/stddev test at 3 sigma would MISS it: the outlier inflates
    // sigma to ~39, and 100 sits only ~2.1 sigma out)
    // h: MAD 0, no deviation > 0 -> nothing flagged
    assert(out.toSeq == Seq(("g", 6L, 100.0)))
  }

  test("streaming count-min cells == batch sketch over the same events") {
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_cm").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    val stream = EventStreams.readEvents(spark, dir)
    @volatile var cells: Array[(Int, Long, Long)] = Array.empty
    val sq = EventStreams.countMinStream(stream, "event_type",
      depth = 3, width = 64) { (batch, _) =>
      cells = batch.collect().map(r =>
        (r.getInt(0), r.getLong(1), r.getLong(2)))
    }
    try {
      val batchCells = graft.operators.FrequentItems
        .countMinCells(Tables.load(spark, sfDir, "events"), "event_type", 3, 64)
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      // commutative cell sums + md5-deterministic rows => identical state
      assert(cells.sorted.toSeq == batchCells.sorted.toSeq)
      // bounded state: never more than depth x width cells
      assert(cells.length <= 3 * 64)
    } finally sq.stop()
  }

  test("containment catches short-in-long subsumption jaccard misses; capped == uncapped") {
    // long doc of 40 distinct tokens; short doc = its first 12 tokens
    // (an embedded quote / doc+boilerplate shape); one unrelated doc
    val longDoc = (1 to 40).map(i => s"tok$i").mkString(" ")
    val shortDoc = (1 to 12).map(i => s"tok$i").mkString(" ")
    val other = (100 to 140).map(i => s"w$i").mkString(" ")
    val d = Seq((1L, longDoc), (2L, shortDoc), (3L, other))
      .toDF("doc_id", "text")
    // jaccard of the pair is 10/38 ≈ 0.26 — invisible at any practical
    // threshold — while containment is exactly 1.0
    assert(Dedup.ngramJaccardPairs(d, "doc_id", "text", 3, 0.8).count() == 0)
    val con = Dedup.ngramContainmentPairs(d, "doc_id", "text", 3, 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(con == Seq((1L, 2L, 1.0)))
    // capped candidate+verify path surfaces the same pairs and values
    val capped = Dedup.ngramContainmentPairs(d, "doc_id", "text", 3, 0.9,
      maxDocFreq = Some(10))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(capped == con)
    // sub-threshold containment stays out: a doc sharing 8 of its 10
    // trigrams scores 0.8 < 0.9
    val partial = (1 to 10).map(i => s"tok$i").mkString(" ") + " zz yy"
    val d2 = d.unionAll(Seq((4L, partial)).toDF("doc_id", "text"))
    val con2 = Dedup.ngramContainmentPairs(d2, "doc_id", "text", 3, 0.9)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!con2.contains((1L, 4L)))
  }

  test("capped containment: hot shingles count in the verify, prune bound is sound") {
    // "aa bb cc" appears in all 13 docs -> df > cap, dropped from the
    // candidate index but NOT from the exact verify
    val boiler = (1 to 10).map(i => (100L + i, s"aa bb cc f$i g$i"))
    val d = (Seq(
      (1L, "aa bb cc x1 x2"),           // 3 shingles, 1 hot
      (2L, "aa bb cc x1 x2 extra"),     // shares ALL of doc1's shingles
      (4L, "aa bb cc x1 q1 q2 q3 q4")   // candidate via "bb cc x1", true containment 2/3
    ) ++ boiler).toDF("doc_id", "text")
    val out = Dedup.ngramContainmentPairs(d, "doc_id", "text", 3, 0.9,
      maxDocFreq = Some(5))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    // (1,2): capped_c=2, hot overlap 1 -> exact 3/3 = 1.0, found even
    // though a third of its intersection is cap-invisible
    assert(out == Seq((1L, 2L, 1.0)))
  }

  test("sampleDiversity matches the brute-force pairwise mean") {
    val vecs = Seq(
      (1L, Seq(1.0f, 0.0f, 2.0f)),
      (2L, Seq(0.0f, 1.0f, -1.0f)),
      (3L, Seq(3.0f, 3.0f, 0.0f)),
      (4L, Seq(-1.0f, 0.5f, 1.0f)))
    val brute = (for {
      (a, va) <- vecs; (b, vb) <- vecs if a < b
    } yield va.zip(vb).map { case (x, y) => (x - y).toDouble * (x - y) }.sum)
    val want = brute.sum / brute.length
    val out = graft.operators.Similarity
      .sampleDiversity(vecs.toDF("id", "vec"), "vec").head()
    assert(out.getLong(0) == 4L)
    assert(math.abs(out.getDouble(1) - want) < 1e-9)
    val normSq = vecs.map(_._2.map(x => x.toDouble * x).sum).sum / 4
    assert(math.abs(out.getDouble(2) - normSq) < 1e-9)
    // degenerate single-row sample: no pairs, mean 0 by contract
    val one = graft.operators.Similarity
      .sampleDiversity(vecs.take(1).toDF("id", "vec"), "vec").head()
    assert(one.getLong(0) == 1L && one.getDouble(1) == 0.0)
  }

  test("jaccardThresholdSweep bands agree with per-threshold pair counts") {
    val base = (1 to 12).map(i => s"t$i").mkString(" ")
    val d = Seq(
      (1L, base),
      (2L, base),                                      // jaccard 1.0 -> band 20
      (3L, (1 to 11).map(i => s"t$i").mkString(" ")),  // 9/10 vs doc1 -> band 18
      (4L, (1 to 8).map(i => s"t$i").mkString(" "))    // 6/10 -> band 12
    ).toDF("doc_id", "text")
    val out = graft.operators.Dedup
      .jaccardThresholdSweep(d, "doc_id", "text", n = 3, minBucket = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // doc1/doc2 identical (band 20); docs 1,2 vs 3: inter 9, union 10
    // -> 180//10 = 18; docs 1,2 vs 4: inter 6, union 10 -> 12; doc3 vs 4:
    // inter 6, union 9 -> 120//9 = 13
    assert(out == Map(20L -> 1L, 18L -> 2L, 12L -> 2L, 13L -> 1L))
    // cross-check: every pair >= 0.8 in ngramJaccardPairs lands in a
    // band >= 16
    val above = graft.operators.Dedup
      .ngramJaccardPairs(d, "doc_id", "text", 3, 0.8).count()
    assert(above == out.filterKeys(_ >= 16).values.sum)
  }

  test("ivfIndexUpsert equals a full rebuild; incoming ids replace standing rows") {
    val toD: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      v => transform(v, x => x.cast("double"))
    val all = embs.select(col("vec_id"), col("embedding"))
    val standing = all.filter(col("vec_id") % 2 === 0)
      .select(col("vec_id"),
        Similarity.ivfAssign(toD(col("embedding")), 8, 64).as("bucket"))
    val incoming = all.filter(col("vec_id") % 2 === 1 || col("vec_id") < 6)
    val merged = Similarity.ivfIndexUpsert(
      standing, incoming, "vec_id", "embedding", 8, 64)
    // row-identity with a from-scratch rebuild over the union corpus
    val rebuilt = all.select(col("vec_id"),
      Similarity.ivfAssign(toD(col("embedding")), 8, 64).as("bucket"))
    assert(merged.count() == rebuilt.count())
    assert(merged.select("vec_id", "bucket").exceptAll(rebuilt).isEmpty)
    // replace semantics: overlapping ids (even ids < 6) carry is_new
    val overlap = merged.filter(col("vec_id") === 0 || col("vec_id") === 2)
      .select("is_new").collect().map(_.getBoolean(0))
    assert(overlap.length == 2 && overlap.forall(identity))
  }

  test("streaming hour-of-week profile equals the batch x135 operator") {
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_how").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    val sq = EventStreams.runToMemory(
      EventStreams.hourOfWeekStream(EventStreams.readEvents(spark, dir)),
      "how_stream", outputMode = "complete")
    try {
      val streamed = spark.table("how_stream")
      val batch = graft.operators.EventAnalytics.hourOfWeekProfile(
        Tables.load(spark, sfDir, "events"), "ts")
      assert(streamed.count() == batch.count() && batch.count() > 0)
      assert(streamed.exceptAll(batch).isEmpty)
      // state bound: the profile can never exceed the 168 cells
      assert(streamed.count() <= 168)
    } finally sq.stop()
  }

  test("streaming SRM deltas roll up to the batch x202 guardrail counts") {
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_srm").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    val sq = EventStreams.runToMemory(
      EventStreams.srmStream(EventStreams.readEvents(spark, dir))
        .toDF("segment", "d0", "d1"),
      "srm_stream", outputMode = "append")
    try {
      val rolled = spark.table("srm_stream")
        .groupBy(col("segment"))
        .agg(sum("d0").as("n_arm0"), sum("d1").as("n_arm1"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      val batch = graft.operators.Experiment.srmCheck(
        Tables.load(spark, sfDir, "events"), "user_id", "event_type")
        .select("segment", "n_arm0", "n_arm1")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(batch.nonEmpty && rolled == batch,
        s"streamed=$rolled batch=$batch")
    } finally sq.stop()
  }

  test("streaming Wilson deltas roll up to the batch x243 intervals via the shared fold") {
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_wil").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    val sq = EventStreams.runToMemory(
      EventStreams.wilsonStream(EventStreams.readEvents(spark, dir))
        .toDF("arm", "dn", "dk"),
      "wilson_stream", outputMode = "append")
    try {
      val rolled = spark.table("wilson_stream")
        .groupBy(col("arm"))
        .agg(sum("dn").as("n"), sum("dk").as("k"))
      val streamed = graft.operators.Experiment
        .wilsonOnCounts(rolled, 1.96).orderBy("arm").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getDouble(3), r.getDouble(4), r.getDouble(5))).toSeq
      val batch = graft.operators.Experiment.wilsonGuardrail(
        Tables.load(spark, sfDir, "events"), "user_id", "event_type",
        "purchase").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getDouble(3), r.getDouble(4), r.getDouble(5))).toSeq
      assert(batch.nonEmpty && streamed == batch,
        s"streamed=$streamed batch=$batch")
    } finally sq.stop()
  }

  test("streaming Wilson: a late conversion emits a k-only delta, not a new user") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val sq = EventStreams.wilsonStream(
        input.toDF().toDF("user_id", "event_type"))
      .toDF("arm", "dn", "dk")
      .writeStream.format("memory").queryName("wilson_late")
      .outputMode("append").start()
    try {
      input.addData((7L, "view"), (8L, "view"))
      sq.processAllAvailable()
      // user 7 converts LATE: delta must be (dn=0, dk=1); a repeat
      // conversion emits nothing
      input.addData((7L, "purchase"))
      sq.processAllAvailable()
      input.addData((7L, "purchase"), (8L, "view"))
      sq.processAllAvailable()
      val rows = spark.table("wilson_late")
        .groupBy(col("arm")).agg(sum("dn").as("n"), sum("dk").as("k"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet
      val armOf7 = graft.operators.Experiment.armOf(lit(7L), 2)
      val armOf8 = graft.operators.Experiment.armOf(lit(8L), 2)
      val arms = spark.range(1).select(armOf7, armOf8).collect()(0)
      val (a7, a8) = (arms.getLong(0), arms.getLong(1))
      val expected =
        if (a7 == a8) Set((a7, 2L, 1L))
        else Set((a7, 1L, 1L), (a8, 1L, 0L))
      assert(rows == expected, s"rows=$rows expected=$expected")
    } finally sq.stop()
  }

  test("streaming PSI deltas roll up to the batch x220 bins; thresholds replay the batch binning") {
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_psi")
      .toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/documents.parquet"),
      java.nio.file.Paths.get(s"$dir/documents.parquet"))
    val ref = docs.filter(col("lang") === "en")
    val batch = graft.operators.Profile.psiDrift(ref,
        docs.filter(col("lang") =!= "en"), "n_chars", bins = 8)
      .orderBy("bin").collect()
    val thresholds = graft.streaming.CorpusStreams.psiBinThresholds(
      ref, "n_chars", 8)
    assert(thresholds.length <= 7 && thresholds.sorted.sameElements(thresholds))
    val sq = EventStreams.runToMemory(
      graft.streaming.CorpusStreams.psiDriftStream(
        graft.streaming.CorpusStreams.readDocs(spark, dir)
          .filter(col("lang") =!= "en"), "n_chars", thresholds),
      "psi_stream", outputMode = "append")
    try {
      val rolled = spark.table("psi_stream")
        .groupBy(col("bin")).agg(sum(col("delta")).as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // running per-bin sums equal the batch operator's cur_n per bin
      batch.foreach { r =>
        assert(rolled.getOrElse(r.getLong(0), 0L) == r.getLong(2),
          s"bin ${r.getLong(0)}: ${rolled.get(r.getLong(0))} vs batch")
      }
      // the dashboard's PSI recompute from the rolled counts + the static
      // reference histogram reproduces the batch total exactly
      val nRef = batch.map(_.getLong(1)).sum.toDouble
      val nCur = batch.map(_.getLong(2)).sum.toDouble
      def r6(x: Double): Double = java.math.BigDecimal.valueOf(x)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
      val psi = batch.map { r =>
        val p = (r.getLong(1) + 0.5) / (nRef + 4.0)
        val q = (rolled.getOrElse(r.getLong(0), 0L) + 0.5) / (nCur + 4.0)
        BigDecimal(r6((p - q) * math.log(p / q)))
      }.sum.toDouble
      assert(batch.forall(_.getDouble(4) == psi))
    } finally sq.stop()
  }

  test("streaming mSPRT max-seq rows equal the batch x212 table, including after a late-arrival batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, java.sql.Timestamp)]
    def tsOf(day: Int, sec: Int) =
      new java.sql.Timestamp((day.toLong * 86400L + sec) * 1000L)
    val est = EventStreams.msprtStream(
      input.toDF().toDF("user_id", "ts"))
      .toDF("seq", "day", "n_days", "c1", "c0", "mean_diff", "lambda",
        "p_always_valid", "rejected")
    val q = est.writeStream.format("memory").queryName("msprt_stream")
      .outputMode("append").start()
    try {
      val batch1 = (1L to 40L).map(u => (u, tsOf((u % 3).toInt, u.toInt)))
      input.addData(batch1: _*)
      q.processAllAvailable()
      // late events land in day 0 — a watermarked design would drop them;
      // every cumulative row downstream self-corrects on the re-emission
      val batch2 = Seq((41L, tsOf(0, 50)), (42L, tsOf(0, 51)),
        (43L, tsOf(3, 1)))
      input.addData(batch2: _*)
      q.processAllAvailable()
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("day")).orderBy(col("seq").desc)
      val streamed = spark.table("msprt_stream")
        .withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
        .select(col("day"), col("n_days"), col("c1"), col("c0"),
          col("mean_diff"), col("lambda"), col("p_always_valid"),
          col("rejected"))
      val batch = graft.operators.Experiment.msprt(
        (batch1 ++ batch2).toDF("user_id", "ts"), "user_id", "ts")
        .select(unix_date(col("day")).cast("long").as("day"),
          col("n_days"), col("c1"), col("c0"), col("mean_diff"),
          col("lambda"), col("p_always_valid"), col("rejected"))
      assert(batch.count() == 4)
      assert(streamed.count() == batch.count())
      assert(streamed.exceptAll(batch).isEmpty &&
        batch.exceptAll(streamed).isEmpty,
        s"streamed=${streamed.collect().mkString(",")} " +
          s"batch=${batch.collect().mkString(",")}")
    } finally q.stop()
  }

  test("streaming group-sequential max-seq user rows replay to the batch x244 look table, including after a late-arrival batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, java.sql.Timestamp, String)]
    def tsOf(day: Int, sec: Int) =
      new java.sql.Timestamp((day.toLong * 86400L + sec) * 1000L)
    val est = EventStreams.groupSequentialStream(
      input.toDF().toDF("user_id", "ts", "event_type"))
      .toDF("user_id", "arm", "first_us", "purch_us", "max_us", "seq")
    val q = est.writeStream.format("memory").queryName("gs_stream")
      .outputMode("append").start()
    try {
      val batch1 = (1L to 30L).flatMap { u =>
        Seq((u, tsOf((u % 5).toInt, u.toInt), "view")) ++
          (if (u % 3 == 0L)
            Seq((u, tsOf((u % 5).toInt + 1, u.toInt), "purchase"))
          else Nil)
      }
      input.addData(batch1: _*)
      q.processAllAvailable()
      // late batch: an EARLIER first event for user 7, an earlier
      // conversion for user 9, and a brand-new user stretching the range
      val batch2 = Seq((7L, tsOf(0, 1), "view"),
        (9L, tsOf(1, 2), "purchase"), (31L, tsOf(9, 9), "view"))
      input.addData(batch2: _*)
      q.processAllAvailable()
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("seq").desc)
      val users = spark.table("gs_stream")
        .withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
        .select(col("arm"), col("first_us"), col("purch_us"), col("max_us"))
      val perUser = users.select(col("arm"), col("first_us"), col("purch_us"))
      val range1 = users.agg(min(col("first_us")).as("lo"),
        max(col("max_us")).as("hi"))
      val replayed = graft.operators.Experiment
        .groupSequentialFold(perUser, range1)
      val batch = graft.operators.Experiment.groupSequential(
        (batch1 ++ batch2).toDF("user_id", "ts", "event_type"),
        "user_id", "ts", "event_type", "purchase")
      assert(batch.count() == 5)
      assert(replayed.exceptAll(batch).isEmpty &&
        batch.exceptAll(replayed).isEmpty,
        s"replayed=${replayed.collect().mkString(",")} " +
          s"batch=${batch.collect().mkString(",")}")
    } finally q.stop()
  }

  test("streaming UCB1 deltas roll up to the batch x248 allocation table exactly") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(String, Double)]
    val est = EventStreams.ucbStream(
      input.toDF().toDF("event_type", "value"))
    val q = est.writeStream.format("memory").queryName("ucb_stream")
      .outputMode("append").start()
    try {
      val batch1 = (1 to 60).map(i =>
        (Seq("view", "click", "purchase")(i % 3), i * 0.17))
      input.addData(batch1: _*)
      q.processAllAvailable()
      val batch2 = Seq(("view", 4.2), ("purchase", 0.01)) // late pulls
      input.addData(batch2: _*)
      q.processAllAvailable()
      val rolled = spark.table("ucb_stream")
        .groupBy(col("arm"))
        .agg(sum(col("dn")).as("n"), sum(col("drm")).as("s"))
      val replayed = graft.operators.Evaluation.ucbOnCounts(rolled)
      val batch = graft.operators.Evaluation.ucbAllocation(
        (batch1 ++ batch2).toDF("event_type", "value"),
        "event_type", "value")
      assert(batch.count() == 3)
      assert(replayed.exceptAll(batch).isEmpty &&
        batch.exceptAll(replayed).isEmpty,
        s"replayed=${replayed.collect().mkString(",")} " +
          s"batch=${batch.collect().mkString(",")}")
    } finally q.stop()
  }

  test("streaming covariate-balance deltas roll up to the batch x213 moments and SMD") {
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_cb").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    val sq = EventStreams.runToMemory(
      EventStreams.covariateBalanceStream(EventStreams.readEvents(spark, dir))
        .toDF("arm", "covariate", "dx", "dx2", "du"),
      "cb_stream", outputMode = "append")
    try {
      def r6(x: Double) = java.math.BigDecimal.valueOf(x)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
      // sufficient statistics from the rolled deltas
      val n = spark.table("cb_stream").filter(col("covariate") === "n_events")
        .groupBy(col("arm")).agg(sum("du").as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val sums = spark.table("cb_stream")
        .groupBy(col("arm"), col("covariate"))
        .agg(sum("dx").as("sx"), sum("dx2").as("sx2"))
        .collect().map(r => (r.getLong(0), r.getString(1)) ->
          (r.getLong(2), r.getLong(3))).toMap
      val streamed = Seq("n_events", "n_days", "n_types").map { c =>
        def mv(a: Long) = {
          val (sx, sx2) = sums((a, c))
          val m = sx.toDouble / n(a)
          (m, sx2.toDouble / n(a) - m * m)
        }
        val ((m0, v0), (m1, v1)) = (mv(0L), mv(1L))
        val smd = if (v0 + v1 <= 0.0) null
          else java.lang.Double.valueOf(r6((m1 - m0) / math.sqrt((v0 + v1) / 2.0)))
        (c, r6(m0), r6(m1), smd)
      }.toSet
      val batch = graft.operators.Experiment.covariateBalance(
        Tables.load(spark, sfDir, "events"), "user_id", "ts", "event_type")
        .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2),
          if (r.isNullAt(3)) null else java.lang.Double.valueOf(r.getDouble(3))))
        .toSet
      assert(batch.nonEmpty && streamed == batch,
        s"streamed=$streamed batch=$batch")
    } finally sq.stop()
  }

  test("streaming BH-FDR deltas roll up to the batch x230 readout exactly") {
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_fdr").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    val b = 64
    val sq = EventStreams.runToMemory(
      EventStreams.fdrBhStream(EventStreams.readEvents(spark, dir), b = b)
        .toDF("kind", "event_type", "obs_bit", "rep_bits"),
      "fdr_stream", outputMode = "append")
    try {
      def r6(x: Double) = java.math.BigDecimal.valueOf(x)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
      val rows = spark.table("fdr_stream").collect().map(r =>
        (r.getString(0), r.getString(1), r.getLong(2),
          r.getSeq[Long](3)))
      // denominators from the once-per-user rows
      val uRows = rows.filter(_._1 == "u")
      val nt = uRows.length.toLong
      val nObs = uRows.map(_._3).sum
      val nR = (0 until b).map(r => uRows.map(_._4(r)).sum)
      // per-type numerators from the per-event rows
      val byType = rows.filter(_._1 == "m").groupBy(_._2)
      val tested = byType.toSeq.map { case (tpe, ms) =>
        val st = ms.length.toLong
        def stat(s: Long, n: Long): Option[Double] =
          if (n == 0L || n == nt) None
          else Some(r6(s.toDouble / n - (st - s).toDouble / (nt - n)))
        val statObs = stat(ms.map(_._3).sum, nObs).get
        val extreme = (0 until b).count { r =>
          stat(ms.map(_._4(r)).sum, nR(r)).exists(v =>
            math.abs(v) >= math.abs(statObs))
        }
        (tpe, statObs, extreme.toLong, r6((extreme + 1).toDouble / (b + 1)))
      }
      // BH step-up on the rolled K-row frame
      val k = tested.size
      val ranked = tested.sortBy(t => (t._4, t._1)).zipWithIndex.map {
        case ((tpe, so, ex, p), i) =>
          (tpe, so, ex, p, i + 1, r6((i + 1) * 0.1 / k))
      }
      val kMax = ranked.filter(t => t._4 <= t._6).map(_._5)
        .foldLeft(0)(math.max)
      val streamed = ranked.map(t =>
        (t._1, t._2, t._3, t._4, t._5, t._6, t._5 <= kMax)).toSet
      val batch = graft.operators.Experiment.fdrBh(
        Tables.load(spark, sfDir, "events"), "user_id", "event_type", b = b)
        .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2),
          r.getDouble(3), r.getInt(4), r.getDouble(5), r.getBoolean(6)))
        .toSet
      assert(batch.nonEmpty && streamed == batch,
        s"streamed=$streamed batch=$batch")
    } finally sq.stop()
  }

  test("streaming DiD deltas roll up to the batch x215 estimate, including a late pre-period batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, java.sql.Timestamp)]
    def tsOf(day: Int, sec: Int) = java.sql.Timestamp.valueOf(
      f"2024-01-${10 + day}%02d 00:00:${sec}%02d")
    val est = EventStreams.didStream(
      input.toDF().toDF("user_id", "ts"), "2024-01-16 00:00:00")
      .toDF("arm", "dpre", "dpost", "du")
    val q = est.writeStream.format("memory").queryName("did_stream")
      .outputMode("append").start()
    try {
      val batch1 = (1L to 30L).flatMap(u =>
        Seq((u, tsOf((u % 4).toInt, 1)), (u, tsOf(7, 2))))
      input.addData(batch1: _*)
      q.processAllAvailable()
      val batch2 = Seq((31L, tsOf(1, 30)), (5L, tsOf(2, 31)), (6L, tsOf(8, 3)))
      input.addData(batch2: _*)
      q.processAllAvailable()
      def r6(x: Double) = java.math.BigDecimal.valueOf(x)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
      val rolled = spark.table("did_stream").groupBy(col("arm"))
        .agg(sum("du").as("n"), sum("dpre").as("sp"), sum("dpost").as("sq"))
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      val (n0, sp0, sq0) = rolled(0L)
      val (n1, sp1, sq1) = rolled(1L)
      val did = r6((sq1.toDouble / n1 - sp1.toDouble / n1)
        - (sq0.toDouble / n0 - sp0.toDouble / n0))
      val batch = graft.operators.Experiment.diffInDiff(
        (batch1 ++ batch2).toDF("user_id", "ts"), "user_id", "ts",
        "2024-01-16 00:00:00").collect()(0)
      assert(batch.getLong(0) == n0 && batch.getLong(1) == n1)
      assert(batch.getDouble(6) == did)
    } finally q.stop()
  }

  test("streaming out-of-orderness deltas roll up to the batch x150 report") {
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_ooo").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    val sq = EventStreams.runToMemory(
      EventStreams.outOfOrdernessStream(EventStreams.readEvents(spark, dir))
        .toDF("user_id", "n_pairs", "n_inversions", "max_regression_us"),
      "ooo_stream", outputMode = "append")
    try {
      val rolled = spark.table("ooo_stream")
        .agg(sum("n_pairs").as("n_pairs"),
          sum("n_inversions").as("n_inversions"),
          max("max_regression_us").as("max_regression_us"))
        .head()
      val batch = graft.operators.EventAnalytics.outOfOrderness(
        Tables.load(spark, sfDir, "events"), "user_id", "event_id", "ts")
        .head()
      assert(rolled.getLong(0) == batch.getLong(0))
      assert(rolled.getLong(1) == batch.getLong(1))
      assert(rolled.getLong(2) == batch.getLong(3))
      assert(batch.getLong(0) > 0)
    } finally sq.stop()
  }

  test("streaming churn increments converge to the batch x132 operator once buckets close") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val bucketSeconds = 3600L
    val usOf: (Long, Long) => java.sql.Timestamp = (bucket, off) =>
      new java.sql.Timestamp(bucket * bucketSeconds * 1000L + off * 1000L)
    val input = MemoryStream[(Long, java.sql.Timestamp)]
    val churn = EventStreams.churnStream(
      input.toDF().toDF("user_id", "ts"), bucketSeconds)
      .toDF("bucket_us", "prev_active_inc", "churned_inc")
    val q = churn.writeStream.format("memory").queryName("churn_stream")
      .outputMode("append").start()
    try {
      // user 1 active in buckets 10, 11, 13 (returns: no churn at 11,
      // churn at 12); user 2 active in 10 only (trailing churn at 11);
      // user 3 active in 11, 12 (no churn at 12, trailing churn at 13)
      val events = Seq(
        (1L, usOf(10, 5)), (1L, usOf(11, 9)), (1L, usOf(13, 1)),
        (2L, usOf(10, 30)),
        (3L, usOf(11, 2)), (3L, usOf(12, 40)))
      input.addData(events: _*)
      q.processAllAvailable()
      // two watermark-advancing sentinels: the first carries the real
      // data's max event time into the watermark, the second pushes the
      // watermark past every open bucket so trailing churn fires
      input.addData((99L, usOf(100, 0)))
      q.processAllAvailable()
      input.addData((98L, usOf(200, 0)))
      q.processAllAvailable()
      // the sentinels are synthetic users: their own trailing-churn rows
      // land in far-future buckets — out of scope of the comparison
      val streamed = spark.table("churn_stream")
        .filter(col("bucket_us") < lit(50L * bucketSeconds * 1000000L))
        .groupBy(col("bucket_us"))
        .agg(sum("prev_active_inc").as("n_prev_active"),
          sum("churned_inc").as("n_churned"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val batch = graft.operators.EventAnalytics.churn(
        events.toDF("user_id", "ts"), "user_id", "ts", bucketSeconds)
        .select("bucket_us", "n_prev_active", "n_churned")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(batch.nonEmpty && streamed == batch,
        s"streamed=$streamed batch=$batch")
    } finally q.stop()
  }

  test("streaming hour-of-week cells roll up to the batch x162 spike report") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val tsOf: (Long, Long) => java.sql.Timestamp = (day, hour) =>
      new java.sql.Timestamp((day * 86400L + hour * 3600L + 60L) * 1000L)
    val input = MemoryStream[java.sql.Timestamp]
    val cells = EventStreams.hourOfWeekCellStream(input.toDF().toDF("ts"))
    val q = cells.writeStream.format("memory").queryName("how_cells")
      .outputMode("append").start()
    try {
      // 3 epoch weeks of traffic on two (dow,hour) cells; cell A spikes
      // in week 2 (5 events vs 1,1) — max*3 = 15 > 2*7; cell B is flat
      val events = Seq(
        tsOf(0, 9), tsOf(7, 9), tsOf(14, 9), tsOf(14, 9), tsOf(14, 9),
        tsOf(14, 9), tsOf(14, 9),
        tsOf(1, 13), tsOf(8, 13), tsOf(15, 13))
      input.addData(events: _*)
      q.processAllAvailable()
      // two watermark-advancing sentinels (far-future weeks): the first
      // folds the real max event time into the watermark, the second
      // closes every real week
      input.addData(tsOf(7000, 0)); q.processAllAvailable()
      input.addData(tsOf(7100, 0)); q.processAllAvailable()
      val closed = spark.table("how_cells").filter(col("wk") < 1000L)
      // every real cell closed exactly once
      assert(closed.count() == closed.select("wk", "dow", "hour").distinct().count())
      val weeks = closed.agg(countDistinct(col("wk")).as("n_weeks"))
      val rolled = closed.groupBy(col("dow"), col("hour"))
        .agg(count(lit(1)).as("n_weeks_active"), sum("n").as("total"),
          max("n").as("max_week"))
        .crossJoin(weeks)
        .select(col("dow"), col("hour"), col("n_weeks_active"), col("total"),
          col("max_week"),
          (col("max_week") * col("n_weeks") > col("total") * 2L).as("spike"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getBoolean(5))).toSet
      val batch = graft.operators.EventAnalytics.hourOfWeekAnomaly(
        events.map(Tuple1(_)).toDF("ts"), "ts")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getBoolean(5))).toSet
      assert(batch.nonEmpty && rolled == batch,
        s"rolled=$rolled batch=$batch")
      assert(rolled.exists(_._6), "the staged spike cell must flag")
    } finally q.stop()
  }

  test("streaming CUSUM estimates converge to the batch x169 operator, surviving late data") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val tsOf: (Long, Long) => java.sql.Timestamp = (day, off) =>
      new java.sql.Timestamp((day * 86400L + off) * 1000L)
    val input = MemoryStream[(String, java.sql.Timestamp)]
    val est = EventStreams.cusumStream(
      input.toDF().toDF("event_type", "ts"), "event_type", 86400L)
      .toDF("event_type", "cp_bucket_us", "s_abs_scaled", "n_buckets")
    val q = est.writeStream.format("memory").queryName("cusum_stream")
      .outputMode("append").start()
    try {
      // key "a": level shift after day 2 (1,1 then 5,5,5); key "b" flat
      val batch1 = Seq(
        "a" -> tsOf(0, 1), "a" -> tsOf(1, 1),
        "a" -> tsOf(2, 1), "a" -> tsOf(2, 2), "a" -> tsOf(2, 3),
        "a" -> tsOf(2, 4), "a" -> tsOf(2, 5),
        "a" -> tsOf(3, 1), "a" -> tsOf(3, 2), "a" -> tsOf(3, 3),
        "a" -> tsOf(3, 4), "a" -> tsOf(3, 5),
        "b" -> tsOf(0, 9), "b" -> tsOf(1, 9))
      input.addData(batch1: _*)
      q.processAllAvailable()
      // a LATE batch lands day-1 data for "a" — a watermarked design
      // would drop it; this monitor self-corrects
      val batch2 = Seq("a" -> tsOf(1, 7), "a" -> tsOf(4, 1))
      input.addData(batch2: _*)
      q.processAllAvailable()
      def cusumOf(evs: Seq[(String, java.sql.Timestamp)], key: String) =
        graft.operators.Temporal.cusumChangepoint(
          evs.toDF("event_type", "ts"), "event_type", "ts",
          bucketSeconds = 86400L)
          .filter(col("event_type") === key)
          .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
            r.getLong(3))).head
      val emitted = spark.table("cusum_stream").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      // key "a" emitted twice: the batch-1 estimate, then the corrected
      // one over the union; key "b" (untouched by batch 2) exactly once
      assert(emitted.filter(_._1 == "a").toSeq.sorted ==
        Seq(cusumOf(batch1, "a"), cusumOf(batch1 ++ batch2, "a")).sorted,
        s"emitted=${emitted.toSeq}")
      assert(emitted.filter(_._1 == "b").toSeq == Seq(cusumOf(batch1, "b")))
    } finally q.stop()
  }

  test("tokenEntropyStats: degenerate doc flags, diverse doc doesn't; exact values") {
    val d = Seq(
      (1L, "a a a a"),                          // H=0, top_share=1 -> flag
      (2L, "t1 t2 t3 t4 t5 t6 t7 t8"),         // H=ln 8 ~ 2.079 > 2 -> clean
      (3L, "u1 u1 u2 u3 u4 u5 u6 u7 u8 u9")    // H > 2, top_share 0.2 -> clean
    ).toDF("doc_id", "text")
    val out = graft.operators.QualityFilters
      .tokenEntropyStats(d, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    def rd(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // doc 1: n=4, types=1, ent_micro = 4*round(ln(4)*1e6)
    val e1 = rd(math.log(4) - 4 * math.round(math.log(4) * 1e6) / (1e6 * 4))
    assert(out(1L).getLong(1) == 4L && out(1L).getLong(2) == 1L)
    assert(out(1L).getDouble(3) == e1 && out(1L).getDouble(5) == 1.0)
    assert(out(1L).getBoolean(6)) // low_diversity
    // doc 2: all singletons -> Σ c·ln c = 0 exactly, H = ln 8
    assert(out(2L).getDouble(3) == rd(math.log(8)))
    assert(out(2L).getDouble(4) == 1.0 && !out(2L).getBoolean(6))
    // doc 3: n=10, one token twice -> H = ln 10 - 2 ln 2 / 10 on the grid
    val e3 = rd(math.log(10) - 2 * math.round(math.log(2) * 1e6) / (1e6 * 10))
    assert(out(3L).getDouble(3) == e3)
    assert(out(3L).getDouble(5) == 0.2 && !out(3L).getBoolean(6))
  }

  test("segmentDedup: cross-doc and within-doc segments keep first; empty-loser rows survive") {
    val d = Seq(
      (1L, "a b c d"),   // segs "a b","c d" -> both first
      (2L, "a b x y"),   // "a b" lost to doc 1; keeps "x y"
      (3L, "c d"),       // sole seg lost to doc 1 -> kept_text ""
      (4L, "p q p q"),   // within-doc repeat -> keeps one "p q"
      (5L, "e f g")      // odd tail: segs "e f","g"
    ).toDF("doc_id", "text")
    val out = graft.operators.CorpusOps
      .segmentDedup(d, "doc_id", "text", segTokens = 2)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) == ((2L, 2L, "a b c d")))
    assert(out(2L) == ((2L, 1L, "x y")))
    assert(out(3L) == ((1L, 0L, "")))   // every segment lost, row retained
    assert(out(4L) == ((2L, 1L, "p q")))
    assert(out(5L) == ((2L, 2L, "e f g")))
  }

  test("tokenBudgetSelect == the naive global cumulative window, boundary mid-tie-group") {
    // quality groups: q=10 {1,2}, q=9 {3,4}, q=8 {5}; budget 15 crosses
    // INSIDE the q=9 group (cum 5,10,14,18) -> ids 1,2,3 exactly
    val d = Seq((1L, 10L, 5L), (2L, 10L, 5L), (3L, 9L, 4L), (4L, 9L, 4L),
      (5L, 8L, 3L)).toDF("id", "quality", "n_tok")
    val out = graft.operators.Selection
      .tokenBudgetSelect(d, "id", "quality", "n_tok", budgetTokens = 15L)
      .collect().map(_.getLong(0)).toSet
    assert(out == Set(1L, 2L, 3L))
    // brute single-order cumsum on a larger random-ish frame
    val rows = (1L to 200L).map(i => (i, (i * 7) % 13, 1L + (i * 3) % 5))
    val brute = rows.sortBy { case (id, q, _) => (-q, id) }
      .scanLeft((0L, 0L, 0L, 0L)) { case ((_, _, _, cum), (id, q, t)) =>
        (id, q, t, cum + t) }
      .drop(1).takeWhile(_._4 <= 137L).map(_._1).toSet
    val got = graft.operators.Selection
      .tokenBudgetSelect(rows.toDF("id", "quality", "n_tok"),
        "id", "quality", "n_tok", budgetTokens = 137L)
      .collect().map(_.getLong(0)).toSet
    assert(got == brute && got.nonEmpty)
  }

  test("idfWeightedJaccardPairs matches a local replay; boilerplate-only overlap scores low") {
    val d = Seq(
      (1L, "x y z a b c"),   // shares "x y z" (df 3) with everyone,
      (2L, "x y z a b d"),   //   and rare content with doc 1 only
      (3L, "x y z p q r"),
      (4L, "m n o p q r")
    ).toDF("doc_id", "text")
    val texts = Map(1L -> "x y z a b c", 2L -> "x y z a b d",
      3L -> "x y z p q r", 4L -> "m n o p q r")
    def sh(t: String) = t.split(" ").sliding(3).map(_.mkString(" ")).toSet
    def replay(cap: Option[Int]): Set[(Long, Long, Double)] = {
      val all = texts.view.mapValues(sh).toMap
      val df3 = all.values.flatten.groupBy(identity).view.mapValues(_.size).toMap
      val w = df3.collect { case (s, df) if cap.forall(df <= _) =>
        s -> math.round(math.log(4.0 / df) * 1e6) }.toMap.withDefaultValue(0L)
      val tw = all.view.mapValues(_.iterator.map(w).sum).toMap
      (for {
        a <- texts.keys; b <- texts.keys if a < b
        iw = (all(a) & all(b)).iterator.map(w).sum
        uw = tw(a) + tw(b) - iw
        if uw > 0 && iw * 1000000L >= math.round(0.3 * 1e6) * uw
      } yield (a, b, BigDecimal(iw.toDouble / uw)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)).toSet
    }
    def run(cap: Option[Int]) = graft.operators.Dedup
      .idfWeightedJaccardPairs(d, "doc_id", "text", n = 3, threshold = 0.3,
        maxDocFreq = cap)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val un = run(None)
    assert(un == replay(None) && un.map(p => (p._1, p._2)).contains((1L, 2L)))
    // docs 1 and 3 share ONLY boilerplate-ish shingles ("x y z" df 3,
    // ln(4/3) weight) — raw jaccard 1/7 is already low, but weighted
    // similarity must be lower still (idf discounts the shared mass)
    assert(!un.map(p => (p._1, p._2)).contains((1L, 3L)))
    // cap=2: the df-3 "x y z" shingle zero-weights; replay agrees
    assert(run(Some(2)) == replay(Some(2)))
  }

  test("winnowingFingerprints matches a local replay; shared 6-token run guarantees a shared fp") {
    def md5l(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(d.take(15), 16)
    }
    def replay(text: String, k: Int = 3, w: Int = 4): Set[Long] = {
      val hs = text.split(" ").sliding(k).filter(_.length == k)
        .map(g => md5l(g.mkString(" "))).toVector
      if (hs.isEmpty) Set.empty
      else (0 until math.max(hs.size - w + 1, 1))
        .map(i => hs.slice(i, i + w).min).toSet
    }
    // docs 1 and 2 share the 6-token run "p q r s t u" (= w + k - 1 with
    // k=3, w=4): the winnowing guarantee says they MUST share >= 1 fp
    val texts = Map(
      1L -> "a b c p q r s t u d e f",
      2L -> "x y p q r s t u z w v",
      3L -> "m n o",             // single k-gram: 1 truncated window
      4L -> "g h")               // shorter than k: no fingerprints
    val d = texts.toSeq.toDF("doc_id", "text")
    val got = graft.operators.Dedup
      .winnowingFingerprints(d, "doc_id", "text")
      .collect().groupBy(_.getLong(0))
      .map { case (id, rs) => id -> rs.map(_.getLong(1)).toSet }
    assert(got == texts.collect {
      case (id, t) if replay(t).nonEmpty => id -> replay(t) })
    assert((got(1L) & got(2L)).nonEmpty) // the span guarantee
    assert(got(3L).size == 1 && !got.contains(4L))
    // pair counting + minShared: doc1/doc2 share exactly the replayed set
    val pairs = graft.operators.Dedup
      .winnowingPairs(d, "doc_id", "text", minShared = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs((1L, 2L)) == (replay(texts(1L)) & replay(texts(2L))).size)
  }

  test("adjustedRandIndex: identical partitions 1.0, hand contingency exact, relabeling-invariant") {
    def ari(rows: Seq[(Long, String, String)]): org.apache.spark.sql.Row =
      graft.operators.Evaluation.adjustedRandIndex(
        rows.toDF("id", "cluster", "truth"), "cluster", "truth").head()
    // identical partitions (modulo label names): ARI = 1
    val ident = (1L to 12L).map(i => (i, s"c${i % 3}", s"t${i % 3}"))
    assert(ari(ident).getDouble(6) == 1.0)
    // hand case: clusters {a:1..4, b:5..8}, truth {x:1..3+5, y:4+6..8}
    // contingency: (a,x)=3 (a,y)=1 (b,x)=1 (b,y)=3 -> sc=3+0+0+3=6
    // marginals a=4,b=4 -> sa=12; x=4,y=4 -> sb=12; C(8,2)=28
    // expected=12*12/28; max=12; ari=(6-e)/(12-e)
    val rows = (1L to 8L).map { i =>
      val c = if (i <= 4) "a" else "b"
      val t = if (i <= 3 || i == 5) "x" else "y"
      (i, c, t)
    }
    val r = ari(rows)
    val e = 12.0 * 12.0 / 28.0
    val want = BigDecimal((6.0 - e) / (12.0 - e))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((8L, 2L, 2L)))
    assert((r.getLong(3), r.getLong(4), r.getLong(5)) == ((6L, 12L, 12L)))
    assert(r.getDouble(6) == want)
    // invariance under cluster relabeling (ARI ignores label identity)
    val relabeled = rows.map { case (i, c, t) => (i, c + "_renamed", t) }
    assert(ari(relabeled).getDouble(6) == want)
  }

  test("perLangPerplexityBuckets: per-lang tertile boundaries are minimal order statistics") {
    val out = graft.operators.LanguageModel
      .perLangPerplexityBuckets(docs, "doc_id", "text", "lang")
      .collect().map(r => (r.getString(1), r.getLong(2), r.getString(3)))
    assert(out.nonEmpty && out.map(_._3).toSet.subsetOf(Set("head", "middle", "tail")))
    for ((lang, rows) <- out.groupBy(_._1)) {
      val byB = rows.groupBy(_._3).view.mapValues(_.map(_._2)).toMap
      val n = rows.length.toLong
      // strict value separation: head <= b1 < middle <= b2 < tail
      for {h <- byB.get("head"); m <- byB.get("middle")}
        assert(h.max < m.min, s"$lang head/middle overlap")
      for {m <- byB.get("middle"); t <- byB.get("tail")}
        assert(m.max < t.min, s"$lang middle/tail overlap")
      // b1 minimality: head holds >= n/3 docs, but dropping the boundary
      // grid cell would fall below n/3
      val head = byB.getOrElse("head", Array.empty[Long])
      if (byB.contains("middle")) {
        assert(head.length * 3 >= n, s"$lang head too small")
        val atBoundary = head.count(_ == head.max)
        assert((head.length - atBoundary) * 3 < n, s"$lang b1 not minimal")
      }
    }
  }

  test("randomizedResponse: seeded coins replay locally, release debiases to the exact identity, mass conserved") {
    // 60-bit md5 prefix (the md5Long convention), JVM-side
    def md5Bits(s: String): Long = {
      val dig = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      var v = 0L
      for (i <- 0 until 7) v = (v << 8) | (dig(i) & 0xFFL)
      (v << 4) | ((dig(7) & 0xF0L) >> 4)
    }
    // 40 users; modal type = cat(u % 3) with a tie-breaking duplicate
    val cats = Seq("alpha", "beta", "gamma")
    val rows = (0L until 40L).flatMap { u =>
      Seq.fill(2)((u, cats((u % 3).toInt))) :+ ((u, cats(((u + 1) % 3).toInt)))
    }
    val out = graft.operators.Profile.randomizedResponse(
        rows.toDF("user_id", "event_type"), "user_id", "event_type",
        keepMicro = 750000L, seed = 11)
      .orderBy("category").collect()
    assert(out.map(_.getString(0)).toSeq == cats)
    // local replay of every user's keep/fake coin
    val sorted = cats.sorted
    val local = (0L until 40L).map { u =>
      val trueC = cats((u % 3).toInt)
      val keep = md5Bits(s"rr|11|keep|$u") % 1000000L < 750000L
      if (keep) trueC
      else sorted((md5Bits(s"rr|11|cat|$u") % 3L).toInt)
    }
    val obsLocal = local.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val truLocal = (0L until 40L).groupBy(u => cats((u % 3).toInt))
      .view.mapValues(_.size.toLong).toMap
    for (r <- out) {
      assert(r.getLong(1) == truLocal.getOrElse(r.getString(0), 0L))
      assert(r.getLong(2) == obsLocal.getOrElse(r.getString(0), 0L))
      // debias identity: est = (obs - n(1-p)/K) / p with exact dyadic p
      val expect = (r.getLong(2).toDouble - 40.0 * 0.25 / 3.0) / 0.75
      assert(math.abs(r.getDouble(3) - expect) < 1e-6, s"$r")
    }
    // mass conservation: sum(est) == n (debiasing is a linear bijection)
    assert(math.abs(out.map(_.getDouble(3)).sum - 40.0) < 1e-4)
    // a different seed flips some coins (the release is seed-keyed)
    val out2 = graft.operators.Profile.randomizedResponse(
        rows.toDF("user_id", "event_type"), "user_id", "event_type",
        keepMicro = 750000L, seed = 12)
      .orderBy("category").collect()
    assert(out.map(_.getLong(1)).toSeq == out2.map(_.getLong(1)).toSeq,
      "true counts are seed-independent")
  }

  test("cmJoinSizeEstimate: exact inner product on a hand fixture; one-sided bound holds; collisions only add") {
    val a = (Seq.fill(3)("a") ++ Seq.fill(2)("b") ++ Seq("c")).map(Tuple1(_))
      .toDF("k")
    // self-join size = 3² + 2² + 1² = 14; width 512 >> 3 keys, so with
    // overwhelming probability no collision and the estimate is EXACT —
    // and the bound must hold regardless
    val r = graft.operators.FrequentItems
      .cmJoinSizeEstimate(a, "k", a, "k").head()
    assert(r.getLong(0) == 14L)
    assert(r.getBoolean(2), "count-min join-size must never underestimate")
    assert(r.getLong(1) == 14L, "3 keys in 512 buckets should not collide")
    // asymmetric sides: A has a x3, b x1; B has a x2, c x5 -> exact 6
    val b = (Seq.fill(2)("a") ++ Seq.fill(5)("c")).map(Tuple1(_)).toDF("k")
    val a2 = (Seq.fill(3)("a") ++ Seq("b")).map(Tuple1(_)).toDF("k")
    val r2 = graft.operators.FrequentItems
      .cmJoinSizeEstimate(a2, "k", b, "k").head()
    assert(r2.getLong(0) == 6L && r2.getBoolean(2))
    // a tiny width forces collisions: the estimate may only grow
    val r3 = graft.operators.FrequentItems
      .cmJoinSizeEstimate(a2, "k", b, "k", depth = 4, width = 2).head()
    assert(r3.getLong(1) >= 6L && r3.getBoolean(2))
  }

  test("hits: hand-computed integer hub/authority scores; pure source and sink get zeros") {
    // a->b (wt 2), a->c (1), b->c (3): a1 = {b:2, c:4};
    // h1 = {a: 2*2 + 1*4 = 8, b: 3*4 = 12};
    // a2 = {b: 2*8 = 16, c: 1*8 + 3*12 = 44}
    val edges = Seq(("a", "b", 2L), ("a", "c", 1L), ("b", "c", 3L))
      .toDF("src", "dst", "wt")
    val out = graft.operators.GraphRank.hits(edges, "src", "dst", "wt")
      .collect().map(r => (r.getString(0),
        r.getDecimal(1).longValueExact(), r.getDecimal(2).longValueExact()))
      .toSet
    assert(out == Set(("a", 0L, 8L), ("b", 16L, 12L), ("c", 44L, 0L)))
  }

  test("dpNoisyCounts: md5-seeded Laplace noise replays locally; scale halves when epsilon doubles") {
    def md5l(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(d.take(15), 16)
    }
    def lap(cell: String, eps: Double): Double = {
      val u = md5l(s"42|$cell").toDouble / 1152921504606846976.0
      -1.0 / eps * math.signum(u - 0.5) * math.log(1.0 - 2.0 * math.abs(u - 0.5))
    }
    val df = Seq(("s1", "en"), ("s1", "en"), ("s1", "de"), ("s2", "en"))
      .toDF("source", "lang")
    def run(eps: Double): Map[(String, String), Double] =
      graft.operators.Profile.dpNoisyCounts(df, Seq("source", "lang"), eps)
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2))
        .toMap
    val r1 = run(1.0)
    def r6(x: Double): Double = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r1 == Map(
      ("s1", "en") -> r6(2.0 + lap("s1|en", 1.0)),
      ("s1", "de") -> r6(1.0 + lap("s1|de", 1.0)),
      ("s2", "en") -> r6(1.0 + lap("s2|en", 1.0))))
    // Laplace scale b = 1/eps: doubling epsilon halves every deviation
    val r2 = run(2.0)
    for (k <- r1.keys) {
      val n = if (k == ("s1", "en")) 2.0 else 1.0
      assert(math.abs((r2(k) - n) - (r1(k) - n) / 2.0) < 2e-6, s"$k")
    }
  }

  test("kCore peels to the dense core: 4-clique survives, chain strands round by round") {
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (5L, 6L)).toDF("id_a", "id_b")
    def core(k: Int): Map[Long, Long] =
      graft.operators.GraphRank.kCore(pairs, "id_a", "id_b", k)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // k=2: node 6 peels first (deg 1), which strands node 5 (deg 2 -> 1)
    // — a SECOND round must fire; the 4-clique remains, each degree 3
    assert(core(2) == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    assert(core(3) == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    assert(core(4).isEmpty)
  }

  test("streaming session windows converge to the batch x100 session features, inclusive-gap edge exact") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val tsOf: Long => java.sql.Timestamp = s => new java.sql.Timestamp(s * 1000L)
    val gap = 100L
    val input = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val sess = EventStreams.sessionWindowStream(
      input.toDF().toDF("user_id", "ts", "value"), "user_id", gap, "value")
    val q = sess.writeStream.format("memory").queryName("sess_stream")
      .outputMode("append").start()
    try {
      // user 1: 0s, 100s (gap EXACTLY == gap -> SAME session, the
      // inclusive-rule edge the 1µs pad exists for), 150s; then 351s
      // (gap 201 > 100 -> new session). user 2: a singleton.
      val events = Seq(
        (1L, tsOf(0), 1.5), (1L, tsOf(100), 2.0), (1L, tsOf(150), 0.25),
        (1L, tsOf(351), 4.0),
        (2L, tsOf(50), 7.0))
      input.addData(events: _*)
      q.processAllAvailable()
      // two watermark sentinels: fold the real max event time into the
      // watermark, then push it past every open session
      input.addData((99L, tsOf(100000), 0.0)); q.processAllAvailable()
      input.addData((98L, tsOf(200000), 0.0)); q.processAllAvailable()
      val streamed = spark.table("sess_stream")
        .filter(col("user_id") < 90L)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getDouble(5))).toSet
      val batch = graft.operators.Temporal.sessionFeatures(
        events.toDF("user_id", "ts", "value"), "user_id", "ts", "ts",
        gap, "value")
        .select(col("user_id"), col("n_events"), col("start_us"),
          col("end_us"), col("duration_us"), col("sum_value"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getDouble(5))).toSet
      assert(batch.size == 3 && streamed == batch,
        s"streamed=$streamed batch=$batch")
    } finally q.stop()
  }

  test("streaming new-vs-returning increments equal batch x133 at every point, late first-seen retracts") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val bucketSeconds = 3600L
    val usOf: (Long, Long) => java.sql.Timestamp = (bucket, off) =>
      new java.sql.Timestamp(bucket * bucketSeconds * 1000L + off * 1000L)
    val input = MemoryStream[(Long, java.sql.Timestamp)]
    val stream = EventStreams.newVsReturningStream(
      input.toDF().toDF("user_id", "ts"), bucketSeconds)
      .toDF("bucket_us", "active_inc", "new_inc")
    val q = stream.writeStream.format("memory").queryName("nvr_stream")
      .outputMode("append").start()
    def rolled(): Set[(Long, Long, Long, Long)] =
      spark.table("nvr_stream").groupBy(col("bucket_us"))
        .agg(sum("active_inc").as("n_active"), sum("new_inc").as("n_new"))
        .filter(col("n_active") > 0L)
        .select(col("bucket_us"), col("n_active"), col("n_new"),
          (col("n_active") - col("n_new")).as("n_returning"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSet
    def batchOf(ev: Seq[(Long, java.sql.Timestamp)]) =
      graft.operators.EventAnalytics.newVsReturning(
        ev.toDF("user_id", "ts"), "user_id", "ts", bucketSeconds)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSet
    try {
      // batch 1: user 1 in buckets 10 and 11; user 2 in bucket 10
      val first = Seq((1L, usOf(10, 5)), (1L, usOf(11, 9)), (2L, usOf(10, 30)))
      input.addData(first: _*)
      q.processAllAvailable()
      assert(rolled() == batchOf(first), "mid-stream sums must already match")
      // batch 2: user 1 arrives LATE in bucket 8 — first-seen moves from
      // 10 to 8, the stale new-credit at 10 must retract; user 2 repeats
      // bucket 10 (no emission); user 3 is brand new in 11
      val second = Seq((1L, usOf(8, 2)), (2L, usOf(10, 45)), (3L, usOf(11, 1)))
      input.addData(second: _*)
      q.processAllAvailable()
      val all = first ++ second
      assert(rolled() == batchOf(all),
        s"rolled=${rolled()} batch=${batchOf(all)}")
      // the retraction really happened: bucket 10 shows active 2, new 1
      // (user 2 only — user 1's credit moved to bucket 8)
      assert(rolled().contains((10L * bucketSeconds * 1000000L, 2L, 1L, 1L)))
    } finally q.stop()
  }

  test("contaminationStream deltas roll up to the batch x281 n_hit; duplicate corpus docs never double-count") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val evals = Seq((10L, "a b c d e"), (11L, "p q r"), (12L, "x y z"))
      .toDF("doc_id", "text")
    val evalSh = graft.streaming.CorpusStreams.evalShingleFrame(
      evals, "doc_id", "text", 3)
    // batch truth over the FULL corpus the stream will have seen
    val corpusAll = Seq((1L, "a b c d"), (2L, "x y z"), (3L, "c d e"))
      .toDF("doc_id", "text")
    val batch = Dedup.contaminationAudit(corpusAll, evals,
        "doc_id", "text", n = 3, threshold = 0.5)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val input = MemoryStream[(Long, String)]
    val sq = graft.streaming.CorpusStreams.contaminationStream(
        input.toDF().toDF("doc_id", "text"), "text", evalSh, n = 3)
      .writeStream.format("memory").queryName("contam_stream")
      .outputMode("append").start()
    try {
      input.addData((1L, "a b c d"), (2L, "x y z"))
      sq.processAllAvailable()
      // batch 2: one new doc AND an exact replay of doc 1 — the
      // first-seen n-gram state must absorb the duplicate
      input.addData((3L, "c d e"), (1L, "a b c d"))
      sq.processAllAvailable()
      val rolled = spark.table("contam_stream")
        .groupBy(col("eval_id")).agg(sum(col("delta")).as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // rolled sums equal the batch n_hit for every eval doc with hits
      // (zero-hit docs simply have no delta rows)
      assert(rolled == batch.filter(_._2 > 0L),
        s"rolled=$rolled batch=$batch")
      assert(rolled(10L) == 3L && rolled(12L) == 1L && !rolled.contains(11L))
    } finally sq.stop()
  }

  test("contaminationAudit: hand-computed overlap fractions, short docs drop, threshold verdict") {
    import spark.implicits._
    // corpus trigram set = {"a b c", "b c d"} u {"x y z"}
    val corpus = Seq((1L, "a b c d"), (2L, "x y z")).toDF("doc_id", "text")
    val evals = Seq(
      (10L, "a b c d e"),   // trigrams: abc, bcd, cde -> 2/3 hit
      (11L, "p q r"),       // pqr -> 0/1
      (12L, "x y z"),       // xyz -> 1/1
      (13L, "a b"))         // < 3 tokens -> no shingles, drops out
      .toDF("doc_id", "text")
    val out = Dedup.contaminationAudit(corpus, evals, "doc_id", "text",
        n = 3, threshold = 0.5)
      .orderBy("eval_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getBoolean(4)))
    assert(out.toSeq == Seq(
      (10L, 3L, 2L, 0.666667, true),
      (11L, 1L, 0L, 0.0, false),
      (12L, 1L, 1L, 1.0, true)))
  }

  test("ivfNprobeAdvisor: curve is monotone, ends at full recall when every bucket is probed, scan frac reaches 1") {
    import spark.implicits._
    // 32 deterministic vectors; maxNprobe == numCentroids probes
    // EVERYTHING, so the last row must be exact recall over the whole
    // corpus and scan fraction 1 (every query scans every bucket)
    val vecs = (0L until 32L).map { i =>
      (i, Array.tabulate(8)(d => ((i * 7 + d * 3) % 11 - 5).toFloat))
    }.toDF("vec_id", "embedding")
    val out = Similarity.ivfNprobeAdvisor(vecs, "vec_id", "embedding",
        k = 3, numCentroids = 4, maxNprobe = 4, dims = 8, querySlice = 4L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(out.length == 4)
    // monotone in both recall and scan cost
    assert(out.sliding(2).forall { case Array(a, b) =>
      a._2 <= b._2 && a._4 <= b._4 })
    val last = out.last
    assert(last._3 == 1.0, s"probing all buckets must be exact: $last")
    assert(last._4 == 1.0, s"probing all buckets scans the corpus: $last")
  }
}
