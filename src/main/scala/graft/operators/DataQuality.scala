package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality constraint checks, each returning rows of
  * (check_name, n_rows, n_violations) — exact integers, unionable into one
  * report.
  *
  * Scale shape: every scalar check on a table is one more sum(CASE WHEN)
  * column inside a SINGLE aggregation pass over its scan (map-side
  * partials) — N checks cost one job, not N. Referential integrity is a
  * left-anti join shipping only the key columns; uniqueness aggregates at
  * key cardinality. */
object DataQuality {

  /** All `checks` (name → violation predicate) over one scan of `df`. */
  def scalarChecks(df: DataFrame, checks: Seq[(String, Column)]): DataFrame = {
    require(checks.nonEmpty, "need at least one check")
    val aggs = count(lit(1)).as("_n") +:
      checks.zipWithIndex.map { case ((_, cond), i) =>
        // coalesce: sum over an EMPTY frame is NULL — a report must say
        // "0 violations of 0 rows", not NULL (uniqueCheck already does)
        coalesce(sum(when(cond, 1L).otherwise(0L)), lit(0L)).as(s"_v$i")
      }
    // typed explode, not a spliced selectExpr stack — check names are
    // caller data and must never be parsed as SQL text
    val rows = array(checks.zipWithIndex.map { case ((name, _), i) =>
      struct(lit(name).as("check_name"), col("_n").as("n_rows"),
        col(s"_v$i").as("n_violations"))
    }: _*)
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(rows).as("_r"))
      .select(col("_r.check_name"), col("_r.n_rows"), col("_r.n_violations"))
  }

  /** Orphaned-child check: `childKey` values with no match in `parent`. */
  def fkCheck(name: String, child: DataFrame, childKey: String,
              parent: DataFrame, parentKey: String): DataFrame =
    child.select(col(childKey))
      .join(parent.select(col(parentKey)), col(childKey) === col(parentKey), "left_anti")
      .agg(count(lit(1)).as("_v"))
      .crossJoin(broadcast(child.agg(count(lit(1)).as("_n"))))
      .select(lit(name).as("check_name"), col("_n").as("n_rows"),
        col("_v").as("n_violations"))

  /** Candidate-key profile: how close `keyCols` comes to uniquely
    * identifying `df`'s rows — (n_rows, n_distinct, uniqueness ratio).
    * One aggregation per candidate; the exact distinct is a two-phase
    * hash aggregate that shuffles at KEY cardinality (map-side partial
    * dedup first). At extreme cardinality swap in
    * `approx_count_distinct` — the documented sketch path (the ratio then
    * carries the HLL ±2% band, fine for discovery, not for a gate). */
  def keyProfile(name: String, df: DataFrame, keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    df.agg(count(lit(1)).as("_n"),
        count_distinct(struct(keyCols.map(col): _*)).as("_d"))
      .select(lit(name).as("candidate_key"), col("_n").as("n_rows"),
        col("_d").as("n_distinct"),
        (floor((col("_d").cast("double") / col("_n")) * lit(1e6) + lit(0.5)) / lit(1e6)).as("uniqueness"))
  }

  /** Functional-dependency audit for `lhs → rhs`: a violating group is an
    * lhs value observed with >1 distinct rhs. One groupBy at lhs
    * cardinality (map-side partial distinct on (lhs, rhs)), then a scalar
    * roll-up — exact integers throughout. */
  def fdCheck(name: String, df: DataFrame, lhs: Seq[String], rhs: String): DataFrame = {
    require(lhs.nonEmpty, "need at least one determinant column")
    df.groupBy(lhs.map(col): _*)
      .agg(count_distinct(col(rhs)).as("_k"), count(lit(1)).as("_c"))
      .agg(coalesce(count(lit(1)), lit(0L)).as("_g"),
        coalesce(sum(when(col("_k") > 1, 1L).otherwise(0L)), lit(0L)).as("_vg"),
        coalesce(sum(when(col("_k") > 1, col("_c")).otherwise(0L)), lit(0L)).as("_vr"))
      .select(lit(name).as("fd"), col("_g").as("n_groups"),
        col("_vg").as("n_violating_groups"), col("_vr").as("n_violating_rows"))
  }

  /** Key-collision report — the follow-up [[keyProfile]] demands when a
    * declared key scores under 1.0: how many key values collide, how many
    * extra rows they carry, and whether the collisions are benign exact
    * copies or CONFLICTING payloads (distinct non-key values under one
    * key — the case an upsert/merge must resolve, not just dedup). One
    * key-cardinality groupBy with a partial (key, payload) distinct. */
  def keyDups(name: String, df: DataFrame, keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    val payload = df.columns.filterNot(keyCols.contains).map(col)
    require(payload.nonEmpty, "key covers every column — use rowDups semantics instead")
    df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("_k"), count_distinct(struct(payload: _*)).as("_p"))
      .agg(coalesce(count(lit(1)), lit(0L)).as("_nk"),
        coalesce(sum(when(col("_k") > 1, 1L).otherwise(0L)), lit(0L)).as("_dk"),
        coalesce(sum(col("_k") - 1), lit(0L)).as("_xr"),
        coalesce(sum(when(col("_p") > 1, 1L).otherwise(0L)), lit(0L)).as("_ck"))
      .select(lit(name).as("key_name"), col("_nk").as("n_keys"),
        col("_dk").as("n_dup_keys"), col("_xr").as("n_extra_rows"),
        col("_ck").as("n_conflicting_keys"))
  }

  /** Key-uniqueness check: every extra copy of a key is one violation. */
  def uniqueCheck(name: String, df: DataFrame, key: String): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("_k"))
      .agg(coalesce(sum(col("_k")), lit(0L)).as("_n"),
        coalesce(sum(col("_k") - 1), lit(0L)).as("_v"))
      .select(lit(name).as("check_name"), col("_n").as("n_rows"),
        col("_v").as("n_violations"))
}
