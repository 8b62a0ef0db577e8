package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end entity resolution: fuzzy-duplicate records are clustered and
  * each cluster reduced to one canonical ("golden") record — the master-
  * data / author-dedup / record-linkage composition of the engine's three
  * proven stages:
  *
  *  1. candidate pairs: [[FuzzyJoin.selfPairsSegments]] — PassJoin
  *     pigeonhole blocking, equi-shuffle candidates, never a cartesian;
  *  2. clusters: [[ConnectedComponents.labels]] — min-label propagation
  *     (pointer-jumped, O(log diameter) rounds; driver union-find fast
  *     path for small graphs);
  *  3. canonical pick: one partial-agged groupBy(entity) — member count
  *     and the min-id record's value via min_by (deterministic, no
  *     per-cluster sort).
  *
  * 100 TB shape: the label frame holds only nodes that appear in some
  * pair — typically a small fraction of the corpus — so the label
  * attachment is an equi join against a reduced frame (broadcast-able
  * when dup density is low); singletons never enter the component stage
  * at all (coalesce to their own id).
  */
object EntityResolution {

  /** Resolve records whose `nameCol` is within edit distance `k` into
    * entities. Output: (entity_id = min record id in the cluster,
    * n_members long, canonical_name = nameCol of the min-id member).
    */
  def resolve(records: DataFrame, idCol: String, nameCol: String,
      k: Int = 1): DataFrame = {
    val pairs = FuzzyJoin.selfPairsSegments(records, idCol, nameCol, k)
    val labels = ConnectedComponents.labels(pairs, s"${idCol}_a", s"${idCol}_b")
    records.select(col(idCol), col(nameCol))
      .join(labels, records(idCol) === labels("id"), "left")
      .select(col(idCol), col(nameCol),
        coalesce(col("component"), col(idCol)).as("entity_id"))
      .groupBy(col("entity_id"))
      .agg(count(lit(1)).as("n_members"),
        min_by(col(nameCol), col(idCol)).as("canonical_name"))
  }
}
