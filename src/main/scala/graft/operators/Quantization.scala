package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Product quantization (Jégou et al. 2011, "Product Quantization for
  * Nearest Neighbor Search") over an embedding column — the memory-side
  * scale lever for ANN: a d-dim float vector (256 B at d=64) compresses
  * to m one-byte codes, so a 100 TB embedding corpus's index fits in
  * ~m/(4d) of the raw footprint and asymmetric-distance (ADC) search
  * scans codes, not vectors.
  *
  * Spark shape:
  *  - The codebook is DETERMINISTIC here: per subspace, the candidate
  *    centroids are the sub-vectors of the k lowest-id corpus rows (a
  *    bounded O(k·d) driver collect — the same seeding x34/x46 use; a
  *    learned codebook would come from [[Similarity.kmeansFit]] per
  *    subspace and drop in unchanged).
  *  - Encoding is ONE narrow corpus scan: the per-subspace argmin over k
  *    centroids is a pure codegen'd expression tree with the codebook
  *    inlined as literals (the [[Similarity.ivfAssign]] pattern) — no
  *    join, no shuffle, no UDF.
  *  - ADC search broadcasts the m×k distance table (computed once from
  *    the query) and reduces each row's m codes — candidate scoring
  *    never touches the original vectors.
  *
  * All sub-distances are squared L2 accumulated left-to-right over the
  * sub-dimensions — the same IEEE order as the DuckDB oracle's
  * `list_sum(list_transform(...))`, so code assignments are bit-exact
  * across engines; ADC distances are rounded to 6 before ranking (gate
  * convention for cross-row double sums).
  */
object Quantization {

  private def asDouble(vec: Column): Column =
    transform(vec, v => v.cast(DoubleType))

  /** The k lowest-id vectors as the deterministic codebook seeds. */
  private def seeds(corpus: DataFrame, idCol: String, vecCol: String,
      k: Int): Array[Array[Double]] =
    corpus.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
      .orderBy(col("id")).limit(k)
      .collect()
      .map(_.getSeq[Double](1).toArray)

  /** PQ codes in long format: (idCol, sub, code), sub 0-based. One narrow
    * scan — the whole per-row encode (m argmins over k centroids) is the
    * single codegen'd [[graft.functions.PqExpression]] loop; the
    * posexplode multiplies OUTPUT rows by m, not the scan. (A declarative
    * argmin tree at this geometry blows janino's 64 KB method limit and
    * drops the stage to interpreted eval — see the expression's docs.) */
  def pqCodes(corpus: DataFrame, idCol: String, vecCol: String,
      m: Int = 8, dsub: Int = 8, k: Int = 16): DataFrame = {
    val cb = seeds(corpus, idCol, vecCol, k)
    require(cb.nonEmpty, "pqCodes: empty corpus")
    val codes = graft.functions.PqExpression.codes(
      corpus.sparkSession, asDouble(col(vecCol)), cb, m, dsub)
    corpus.select(col(idCol), posexplode(codes).as(Seq("sub", "code")))
      .select(col(idCol), col("sub").cast(LongType).as("sub"), col("code"))
  }

  /** ADC top-k: approximate squared-L2 distance of every corpus row to
    * the query row `queryId` = sum over subspaces of the precomputed
    * (query sub-vector -> assigned centroid) distance. The distance table
    * is m×k rows, broadcast; ranking follows the x44 convention (round to
    * 6, then order by the ROUNDED distance with the id tiebreak, so both
    * engines rank identical keys). The query row itself is excluded. */
  /** The query's m*k ADC distance table (same left-to-right fold as the
    * encoder) as a broadcast-able frame (sub, code, d). */
  private def distTable(spark: org.apache.spark.sql.SparkSession,
      q: Array[Double], cb: Array[Array[Double]],
      m: Int, dsub: Int, k: Int): DataFrame = {
    import spark.implicits._
    (0 until m).flatMap { j =>
      (0 until k).map { c =>
        var s = 0.0
        var d = 0
        while (d < dsub) {
          val i = j * dsub + d
          val x = (if (i < q.length) q(i) else 0.0) - cb(c)(i)
          s += x * x
          d += 1
        }
        (j.toLong, c.toLong, s)
      }
    }.toDF("sub", "code", "d")
  }

  private def queryVec(corpus: DataFrame, idCol: String, vecCol: String,
      queryId: Long, who: String): Array[Double] = {
    val qRows = corpus.filter(col(idCol) === queryId)
      .select(asDouble(col(vecCol))).limit(1).collect()
    require(qRows.nonEmpty, s"$who: query id $queryId not in corpus")
    qRows(0).getSeq[Double](0).toArray
  }

  def adcTopK(corpus: DataFrame, idCol: String, vecCol: String,
      queryId: Long, topK: Int,
      m: Int = 8, dsub: Int = 8, k: Int = 16): DataFrame = {
    val cb = seeds(corpus, idCol, vecCol, k)
    val q = queryVec(corpus, idCol, vecCol, queryId, "adcTopK")
    val dtable = distTable(corpus.sparkSession, q, cb, m, dsub, k)
    pqCodes(corpus, idCol, vecCol, m, dsub, k)
      .filter(col(idCol) =!= queryId)
      .join(broadcast(dtable), Seq("sub", "code"))
      .groupBy(col(idCol))
      .agg(round(sum(col("d")), 6).as("adist"))
      .orderBy(col("adist").asc, col(idCol).asc)
      .limit(topK)
  }

  /** IVF-ADC top-k — the full FAISS-style IVFPQ serving composition
    * (Jégou et al. 2011 §IV): a coarse quantizer prunes the corpus to the
    * query's `nprobe` inverted lists, then candidates are ranked by ADC
    * from their PQ codes alone. The coarse quantizer is
    * [[Similarity.ivfAssign]]'s deterministic sign-pattern centroids and
    * the PQ codebook is the global one (codes match [[pqCodes]] /
    * [[adcTopK]] exactly — no per-list residual re-training), so
    * `nprobe = numCentroids` degrades EXACTLY to [[adcTopK]] (spec-gated).
    * Recall < 1 for smaller nprobe by construction, like [[Similarity.ivfTopK]].
    *
    * 100 TB shape: the serving read touches ~nprobe/numCentroids of the
    * corpus (one narrow scan computing bucket + codes, filtered by the
    * probe literal — partition-prunable if the corpus is stored bucketed
    * by list id); the m*k distance table broadcasts; exact vectors are
    * never moved at query time; top-k is a bins-bounded agg + TakeOrdered.
    * Output: (idCol, adist), ranked (round 6, id tie-break).
    */
  /** The deterministic PQ codebook as a persistable k-row frame
    * (cid, vec), cid = seed rank (0-based, by corpus id order). Build it
    * once offline alongside [[pqIndex]]; [[ivfAdcTopKWithIndex]] collects
    * it back (bounded O(k·d)) to inline the ADC distance table. */
  def pqCodebook(corpus: DataFrame, idCol: String, vecCol: String,
      k: Int = 16): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    seeds(corpus, idCol, vecCol, k).zipWithIndex
      .map { case (v, i) => (i.toLong, v.toSeq) }.toSeq
      .toDF("cid", "vec")
  }

  private def codebookArray(codebook: DataFrame): Array[Array[Double]] =
    codebook.select(col("cid"), col("vec")).collect()
      .sortBy(_.getLong(0)).map(_.getSeq[Double](1).toArray)

  /** Build-once IVFPQ index: ONE narrow corpus scan producing
    * (idCol, bucket, codes) — coarse list id + the m PQ codes per row.
    * This is the offline build FAISS does once; at 100 TB, persist it
    * partitioned/bucketed by `bucket` so a query's probe filter prunes
    * files, and serve from [[ivfAdcTopKWithIndex]] — query-time work then
    * never re-encodes the corpus (round-4 verdict: [[ivfAdcTopK]] paid a
    * full re-encode per query, the slowest bench row). */
  def pqIndex(corpus: DataFrame, idCol: String, vecCol: String,
      codebook: DataFrame, numCentroids: Int = 16, dims: Int = 64,
      m: Int = 8, dsub: Int = 8): DataFrame = {
    val cb = codebookArray(codebook)
    require(cb.nonEmpty, "pqIndex: empty codebook")
    val codes = graft.functions.PqExpression.codes(
      corpus.sparkSession, asDouble(col(vecCol)), cb, m, dsub)
    corpus.select(col(idCol),
      Similarity.ivfAssign(asDouble(col(vecCol)), numCentroids, dims)
        .as("bucket"),
      codes.as("codes"))
  }

  /** IVF-ADC serving from a precomputed index: identical ranking to
    * [[ivfAdcTopK]] (spec-gated), but query-time work is only
    *  - a point lookup of the query vector (id-prunable),
    *  - the k-row codebook collect + m×k broadcast distance table,
    *  - one scan of the INDEX restricted to the probed buckets — codes
    *    only, never corpus vectors.
    * The index scan reads ~nprobe/numCentroids of (id, bucket, m bytes)
    * rather than re-encoding d-dim vectors — the FAISS build/serve split. */
  def ivfAdcTopKWithIndex(corpus: DataFrame, index: DataFrame,
      codebook: DataFrame, idCol: String, vecCol: String,
      queryId: Long, topK: Int, numCentroids: Int = 16, nprobe: Int = 4,
      dims: Int = 64, m: Int = 8, dsub: Int = 8): DataFrame = {
    val spark = corpus.sparkSession
    val cb = codebookArray(codebook)
    val q = queryVec(corpus, idCol, vecCol, queryId, "ivfAdcTopKWithIndex")
    val dtable = distTable(spark, q, cb, m, dsub, cb.length)
    val probes = corpus.filter(col(idCol) === queryId)
      .select(explode(Similarity.ivfProbes(asDouble(col(vecCol)),
        numCentroids, nprobe, dims)).as("ci"))
      .collect().map(_.getInt(0))
    index
      .filter(col("bucket").isin(probes.map(Integer.valueOf): _*) &&
        col(idCol) =!= queryId)
      .select(col(idCol), posexplode(col("codes")).as(Seq("sub", "code")))
      .select(col(idCol), col("sub").cast(LongType).as("sub"), col("code"))
      .join(broadcast(dtable), Seq("sub", "code"))
      .groupBy(col(idCol))
      .agg(round(sum(col("d")), 6).as("adist"))
      .orderBy(col("adist").asc, col(idCol).asc)
      .limit(topK)
  }

  def ivfAdcTopK(corpus: DataFrame, idCol: String, vecCol: String,
      queryId: Long, topK: Int, numCentroids: Int = 16, nprobe: Int = 4,
      dims: Int = 64, m: Int = 8, dsub: Int = 8, k: Int = 16): DataFrame = {
    val spark = corpus.sparkSession
    val cb = seeds(corpus, idCol, vecCol, k)
    val q = queryVec(corpus, idCol, vecCol, queryId, "ivfAdcTopK")
    val dtable = distTable(spark, q, cb, m, dsub, k)
    // probe lists via the SAME Catalyst expressions as the corpus-side
    // assignment (evaluated on the 1-row query frame — no reimplementation
    // drift between the probe scorer and the bucket scorer)
    val probes = corpus.filter(col(idCol) === queryId)
      .select(explode(Similarity.ivfProbes(asDouble(col(vecCol)),
        numCentroids, nprobe, dims)).as("ci"))
      .collect().map(_.getInt(0))
    val candidates = corpus
      .filter(col(idCol) =!= queryId)
      .withColumn("__bucket",
        Similarity.ivfAssign(asDouble(col(vecCol)), numCentroids, dims))
      .filter(col("__bucket").isin(probes.map(Integer.valueOf): _*))
      .drop("__bucket")
    val codes = graft.functions.PqExpression.codes(
      spark, asDouble(col(vecCol)), cb, m, dsub)
    candidates.select(col(idCol), posexplode(codes).as(Seq("sub", "code")))
      .select(col(idCol), col("sub").cast(LongType).as("sub"), col("code"))
      .join(broadcast(dtable), Seq("sub", "code"))
      .groupBy(col(idCol))
      .agg(round(sum(col("d")), 6).as("adist"))
      .orderBy(col("adist").asc, col(idCol).asc)
      .limit(topK)
  }

  // ---------------------------------------------------------------- SQ8

  /** Global int8 scalar-quantization params over every element of every
    * vector: ONE partial-agged aggregate over per-row array_min/array_max
    * (two doubles reach the driver). Symmetric-range SQ is the other
    * standard ANN memory lever next to PQ (FAISS `SQ8`, Lucene/HNSW int8):
    * 4x smaller vectors, reconstruction is two flops per element, and —
    * unlike PQ — the decoded vector lives in the ORIGINAL space, so exact
    * rescoring pipelines reuse it directly. */
  def sq8Params(corpus: DataFrame, vecCol: String): (Double, Double, Double) = {
    val r = corpus.agg(
      min(array_min(asDouble(col(vecCol)))).as("vmin"),
      max(array_max(asDouble(col(vecCol)))).as("vmax")).collect()(0)
    val vmin = r.getDouble(0)
    val vmax = r.getDouble(1)
    require(vmax > vmin, "sq8Params: degenerate value range")
    (vmin, vmax, (vmax - vmin) / 255.0)
  }

  /** code_i = floor((x_i - vmin)/scale + 0.5) in [0, 255] — half-up via
    * floor(+0.5), the only rounding rule that is bit-identical across
    * engines (`round()` half-even/half-away conventions differ). */
  private def sq8Code(x: Column, vmin: Double, scale: Double): Column =
    least(lit(255.0), floor((x - lit(vmin)) / lit(scale) + lit(0.5)))

  /** The persistable SQ8 index: (idCol, codes array<int>) from ONE narrow
    * corpus scan — no join, no shuffle; at 100 TB this is the build-once
    * artifact served instead of float vectors (with (vmin, vmax) stored
    * alongside, here re-derivable from [[sq8Params]]). */
  def sq8Index(corpus: DataFrame, idCol: String, vecCol: String,
      vmin: Double, scale: Double): DataFrame =
    corpus.select(col(idCol),
      transform(asDouble(col(vecCol)),
        x => sq8Code(x, vmin, scale).cast("int")).as("codes"))

  /** Exact-on-reconstructions cosine top-k: the FLOAT query against the
    * corpus decoded from its SQ8 codes (vmin + code*scale) — the
    * asymmetric convention (query never quantized), same as ADC. One
    * narrow decode-and-score scan via [[Similarity.bruteForceTopK]]'s
    * broadcast-query plan: the corpus neither shuffles nor joins.
    * Output: (query_id, neighbor_id, cos, rank). */
  def sq8TopK(corpus: DataFrame, idCol: String, vecCol: String,
      queryId: Long, topK: Int): DataFrame = {
    val (vmin, _, scale) = sq8Params(corpus, vecCol)
    val recon = corpus.select(col(idCol),
      transform(asDouble(col(vecCol)),
        x => lit(vmin) + sq8Code(x, vmin, scale) * lit(scale)).as(vecCol))
    Similarity.bruteForceTopK(
      corpus.filter(col(idCol) === queryId), recon, idCol, vecCol, topK)
  }

  /** Recall@k of SQ8-reconstructed search against exact float search —
    * the acceptance number for the 4x memory saving. Both rankings are
    * TakeOrdered-bounded; the recall join is k-row vs k-row. Output:
    * (query_id, n_hit, recall). */
  def sq8Recall(corpus: DataFrame, idCol: String, vecCol: String,
      queryId: Long, k: Int): DataFrame = {
    val approx = sq8TopK(corpus, idCol, vecCol, queryId, k)
    val exact = Similarity.bruteForceTopK(
      corpus.filter(col(idCol) === queryId), corpus, idCol, vecCol, k)
    Evaluation.recallAtK(approx, exact, "query_id", "neighbor_id", "rank", k)
  }

  /** Two-stage retrieval: SQ8 coarse candidate generation + exact float
    * re-rank — the standard production serving shape (quantized index
    * narrows the corpus to `candidates` rows, exact scoring touches only
    * those). At 100 TB stage 1 scans codes (4x smaller than vectors) and
    * stage 2 is `candidates` id-keyed point lookups; recall losses happen
    * only when a true neighbor falls outside the coarse cut. Output:
    * (query_id, neighbor_id, cos, rank) — exact cosines, re-ranked. */
  def sq8RerankTopK(corpus: DataFrame, idCol: String, vecCol: String,
      queryId: Long, topK: Int, candidates: Int = 100): DataFrame = {
    require(candidates >= topK, "sq8RerankTopK: candidates < topK")
    val cand = sq8TopK(corpus, idCol, vecCol, queryId, candidates)
      .select(col("neighbor_id").as(idCol))
    val sub = corpus.join(broadcast(cand), Seq(idCol), "left_semi")
    Similarity.bruteForceTopK(
      corpus.filter(col(idCol) === queryId), sub, idCol, vecCol, topK)
  }

  /** Recall@k of the two-stage pipeline against exact search — by
    * construction >= [[sq8Recall]] at the same k (the re-rank can only
    * fix coarse-ranking mistakes inside the candidate cut, never add
    * new ones). */
  def sq8RerankRecall(corpus: DataFrame, idCol: String, vecCol: String,
      queryId: Long, k: Int, candidates: Int = 100): DataFrame = {
    val approx = sq8RerankTopK(corpus, idCol, vecCol, queryId, k, candidates)
    val exact = Similarity.bruteForceTopK(
      corpus.filter(col(idCol) === queryId), corpus, idCol, vecCol, k)
    Evaluation.recallAtK(approx, exact, "query_id", "neighbor_id", "rank", k)
  }

  /** PQ reconstruction-error profile — how much geometry the quantizer
    * actually throws away, the number that justifies (or vetoes) serving
    * from codes: per vector, the squared L2 distance to its PQ
    * reconstruction = Σ over sub-blocks of the distance to the ASSIGNED
    * sub-centroid, which for an argmin assignment is the minimum
    * sub-distance — so the oracle replays it as a min over the codebook
    * with no tie-break sensitivity. Encoder and profile share the same
    * codegen'd [[graft.functions.PqExpression]] argmin; the per-block
    * distance is then one bounded higher-order fold against the
    * broadcast codebook literal (m·dsub terms per row, never a join).
    * Per-vector errors round to 6 (the normProfile convention), then one
    * aggregate: count/mean plus exact-interpolation p50/p90 (the
    * x13/x141 percentile convention) and max. Output: one row (n,
    * mean_err, p50_err, p90_err, max_err). */
  def reconstructionErrorProfile(corpus: DataFrame, idCol: String,
      vecCol: String, m: Int = 8, dsub: Int = 8, k: Int = 16): DataFrame = {
    val cb = seeds(corpus, idCol, vecCol, k)
    require(cb.nonEmpty, "reconstructionErrorProfile: empty corpus")
    val codes = graft.functions.PqExpression.codes(
      corpus.sparkSession, asDouble(col(vecCol)), cb, m, dsub)
    val cbCol = array(cb.map(row => array(row.map(lit(_)): _*)): _*)
    val dist = aggregate(sequence(lit(1), lit(dsub)), lit(0.0),
      (acc, i) => {
        val idx = (col("sub") * dsub + i).cast("int")
        val x = element_at(col("v"), idx)
        val c = element_at(element_at(cbCol, (col("code") + 1).cast("int")), idx)
        acc + (x - c) * (x - c)
      })
    corpus.select(col(idCol), asDouble(col(vecCol)).as("v"),
        posexplode(codes).as(Seq("sub", "code")))
      .select(col(idCol), dist.as("d"))
      .groupBy(col(idCol)).agg(round(sum(col("d")), 6).as("err"))
      .agg(count(lit(1)).as("n"), round(avg(col("err")), 6).as("mean_err"),
        expr("percentile(err, 0.5)").as("p50_err"),
        expr("percentile(err, 0.9)").as("p90_err"),
        max(col("err")).as("max_err"))
  }
}
