package graft.stats

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distinct-entity monitoring — the cardinality counters every ingest
  * pipeline tracks (distinct users per event type, distinct domains per
  * shard, vocabulary growth per day, …).
  *
  * Same twin design as doc_length_stats: [[exact]] is the audit twin —
  * a two-level aggregate whose first level shuffles on the (group, entity)
  * pair, exact and SQL-oracle-able, viable when the DISTINCT set itself is
  * shuffle-able; [[approx]] is the petabyte production path — HyperLogLog++
  * sketches in ONE map-side-combined aggregate (the per-partition sketch is
  * a few KB regardless of row count, and merge is associative), rows-only
  * with a spec bounding its error against the exact twin.
  */
object Cardinality {
  /** Per-group exact (n_rows, n_distinct) over `entityCol`. The first
    * aggregate dedups on the (group, entity) key — uniform shuffle, then
    * the group rollup reuses the partitioning prefix. */
  def exact(df: DataFrame, groupCol: String, entityCol: String): DataFrame =
    df.select(col(groupCol).as("grp"), col(entityCol).as("ent"))
      .groupBy(col("grp"), col("ent")).agg(count(lit(1)).as("_n"))
      .groupBy(col("grp"))
      .agg(sum(col("_n")).cast("long").as("n_rows"),
        count(lit(1)).cast("long").as("n_distinct"))
      .select(col("grp").as(groupCol), col("n_rows"), col("n_distinct"))

  /** Per-group approximate distinct via HyperLogLog++ (`approx_count_
    * distinct`) — one aggregate, sketch-sized shuffle, engine-internal
    * estimate → rows-only gate. rsd = target relative standard dev. */
  def approx(df: DataFrame, groupCol: String, entityCol: String,
             rsd: Double = 0.02): DataFrame =
    df.groupBy(col(groupCol))
      .agg(count(lit(1)).cast("long").as("n_rows"),
        approx_count_distinct(col(entityCol), rsd).cast("long").as("n_distinct_approx"))
}
