package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Exact top-k frequent items at scale, without a full-vocabulary shuffle.
  *
  * The naive plan — groupBy(item).count + global top-k — shuffles one row
  * per DISTINCT item: at 100 TB of text that is the n-gram vocabulary
  * (billions of keys), most of which occur a handful of times and can
  * never reach a top-k. This operator:
  *
  *  1. summarizes each PARTITION with a Misra-Gries sketch of `capacity`
  *     counters (classic guarantee: any item with per-partition frequency
  *     > n_p/capacity survives the partition's sketch). Union over
  *     partitions => every item with GLOBAL frequency > N/capacity is a
  *     candidate. Narrow: no shuffle; output is <= capacity rows/partition.
  *  2. exactly recounts ONLY the candidates (broadcast semi-join filter,
  *     then an ordinary partial-agged groupBy whose key space is
  *     #candidates, not #vocabulary) and takes the top-k.
  *
  * EXACTNESS is certified at runtime, not assumed: if the k-th recounted
  * frequency exceeds N/capacity, no non-candidate can belong to the top-k
  * (their frequency is <= N/capacity), so the result equals the naive
  * plan's bit for bit — the x37 oracle replays the naive rule and the
  * gate proves it. If the certificate fails (capacity too small for the
  * distribution), the operator falls back to the exact groupBy — always
  * correct, just not sketch-accelerated.
  *
  * Ties break (count desc, item asc), matching the SQL replay.
  */
object FrequentItems {

  /** Per-partition Misra-Gries candidates of a Dataset[String], plus the
    * partition's row count folded into the same scan (as a null-item row)
    * so the certificate's total-N needs no third pass over the corpus. */
  private def mgCandidates(items: Dataset[String],
      capacity: Int): Dataset[(String, Long)] = {
    import items.sparkSession.implicits._
    items.mapPartitions { it =>
      val counters = new java.util.HashMap[String, Long]()
      var total = 0L
      it.foreach { x =>
        total += 1
        val c = counters.get(x)
        if (c != 0L || counters.containsKey(x)) counters.put(x, c + 1L)
        else if (counters.size < capacity) counters.put(x, 1L)
        else {
          // decrement-all step; drop zeroed counters
          val iter = counters.entrySet().iterator()
          while (iter.hasNext) {
            val e = iter.next()
            if (e.getValue == 1L) iter.remove() else e.setValue(e.getValue - 1L)
          }
        }
      }
      import scala.jdk.CollectionConverters._
      counters.keySet().iterator().asScala.map((_, 0L)) ++
        Iterator((null: String, total))
    }
  }

  /** Exact top-k of `itemCol` by occurrence count. Output (rk, item, n),
    * rk long 1..k. `capacity` trades sketch size for certificate
    * strength; the fallback keeps correctness unconditional. */
  def topK(df: DataFrame, itemCol: String, k: Int,
      capacity: Int = 4096): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    require(k > 0 && capacity > k, s"need capacity > k > 0, got k=$k capacity=$capacity")

    val items = df.select(col(itemCol).cast("string").as("item"))
      .filter(col("item").isNotNull).as[String]

    def rank(counts: DataFrame): DataFrame = {
      val w = Window.orderBy(col("n").desc, col("item").asc)
      // global top-k window over #candidates (or #vocabulary in the
      // fallback) rows AFTER full aggregation — k and candidates are
      // small by construction, this is not a data-sized window
      counts.withColumn("rk", row_number().over(w).cast(LongType))
        .filter(col("rk") <= k)
        .select(col("rk"), col("item"), col("n"))
    }

    // one sketch pass yields candidates AND the total row count (null key)
    val sketch = mgCandidates(items, capacity).toDF("item", "cnt").collect()
    val total = sketch.filter(_.isNullAt(0)).map(_.getLong(1)).sum
    val cand = sketch.collect { case r if !r.isNullAt(0) => r.getString(0) }
      .distinct.toSeq
    val recount = items.toDF("item")
      .join(broadcast(cand.toDF("item")), Seq("item"), "left_semi")
      .groupBy("item").agg(count(lit(1)).as("n"))
    val top = rank(recount).collect()
    val certified = top.length >= k &&
      top.last.getAs[Long]("n") > total / capacity
    if (certified) {
      spark.createDataFrame(java.util.Arrays.asList(top: _*),
        recount.withColumn("rk", lit(1L)).select("rk", "item", "n").schema)
    } else {
      // certificate failed: the distribution is too flat for this
      // capacity — recount everything (always exact, no sketch savings)
      rank(items.toDF("item").groupBy("item").agg(count(lit(1)).as("n")))
    }
  }
}
