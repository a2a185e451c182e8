package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Slowly-Changing-Dimension Type-2 merge — the lakehouse dimension-history
  * operator [[MergeUpsert]] (Type-1 overwrite) deliberately does not do:
  * instead of overwriting a changed attribute, the current version row
  * CLOSES (its open validity interval ends at the change's effective date)
  * and a new open version row begins there, so every historical value stays
  * queryable by as-of date ([[AsOfJoin]] composes naturally on the result).
  *
  * Contract: `dim` carries (key, attr, validFrom, validTo) where a NULL
  * validTo marks the current version; `updates` carries (key, attr, eff) —
  * at most one row per key (pre-aggregate a change stream to its latest
  * with the max-struct idiom first). Emitted `op` values: K (untouched
  * pass-through, open or historical), C (version closed by a change),
  * N (new open version from a change), I (insert for a key with no current
  * row). A no-op update (same attribute value) passes through as K.
  *
  * Shape at scale: ONE equi-join of the open slice against the (already
  * per-key-unique) update batch on the key, plus a union with the closed
  * history, which is touched by no join at all — the Type-2 pattern that
  * stays linear when the history dwarfs the open slice. Updates join
  * broadcast when small (left to AQE); nothing shuffles on anything but
  * the key.
  */
object Scd2 {

  def merge(dim: DataFrame, updates: DataFrame, key: String, attr: String,
            eff: String, validFrom: String = "valid_from",
            validTo: String = "valid_to"): DataFrame = {
    // malformed update batches fail loudly inside the plan (MergeUpsert rule)
    val upd = updates
      .filter(assert_true(col(key).isNotNull,
        lit("Scd2: update batch has a NULL key — a keyless change can never " +
          "match a dimension row")).isNull)
      .select(col(key).as("_uk"), col(attr).as("_uv"), col(eff).as("_ue"))
    val open = dim.filter(col(validTo).isNull)
    val closedHistory = dim.filter(col(validTo).isNotNull)
      .select(col(key), col(attr), col(validFrom), col(validTo), lit("K").as("op"))
    val j = open.join(upd, col(key) === col("_uk"), "full_outer")
    // untouched open rows + no-op updates stay open, unchanged
    val kept = j.filter(col("_uk").isNull ||
        (col(key).isNotNull && col(attr) === col("_uv")))
      .select(col(key), col(attr), col(validFrom), col(validTo), lit("K").as("op"))
    // real changes: close the current version at eff, open the new one
    val changed = j.filter(col("_uk").isNotNull && col(key).isNotNull &&
      col(attr) =!= col("_uv"))
    val closed = changed.select(col(key), col(attr), col(validFrom),
      col("_ue").as(validTo), lit("C").as("op"))
    val opened = changed.select(col("_uk").as(key), col("_uv").as(attr),
      col("_ue").as(validFrom), lit(null).cast("bigint").as(validTo),
      lit("N").as("op"))
    // keys with no current row insert a fresh open version
    val inserted = j.filter(col("_uk").isNotNull && col(key).isNull)
      .select(col("_uk").as(key), col("_uv").as(attr),
        col("_ue").as(validFrom), lit(null).cast("bigint").as(validTo),
        lit("I").as("op"))
    closedHistory.unionByName(kept).unionByName(closed)
      .unionByName(opened).unionByName(inserted)
  }
}
