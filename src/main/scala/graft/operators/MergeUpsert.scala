package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SCD-1 style MERGE: apply a keyed change batch (upserts + deletes) to a
  * snapshot, producing the next snapshot — the batch face of a CDC apply.
  *
  * Shape: ONE full-outer join on the key. Both sides hash-partition on the
  * key (at 100 TB the snapshot is typically bucketed/partitioned by key, so
  * the exchange is one-sided), and AQE downgrades to a broadcast join
  * whenever the change batch is small — the common CDC case. Rows:
  *   - key only in snapshot            → kept as-is (op "K")
  *   - key in both, change op = "U"    → updated columns overwrite (op "U")
  *   - key in both, change op = "D"    → dropped
  *   - key only in changes, op = "U"   → inserted (op "I"); snapshot columns
  *                                       not provided by the change are NULL
  *   - key only in changes, op = "D"   → no-op delete, dropped
  */
object MergeUpsert {

  /** @param snapshot  current table
    * @param changes   change batch: key column, `opCol` ("U"/"D"), and a
    *                  subset of snapshot columns carrying new values
    * @param key       join key column name (same on both sides)
    * @param opCol     name of the op column in `changes`
    */
  def merge(snapshot: DataFrame, changes: DataFrame, key: String,
            opCol: String = "op"): DataFrame = {
    val updatable = changes.columns.filter(c => c != key && c != opCol).toSeq
    require(updatable.forall(snapshot.columns.contains),
      s"change columns ${updatable.mkString(",")} must exist in the snapshot")
    val s = snapshot.alias("s")
    // A change row with a NULL op is malformed (after the full-outer join it
    // is indistinguishable from "no change row" — it would overwrite values
    // while reporting 'K'), and a NULL-key change row can never match the
    // snapshot: a 'U' silently inserts an unmatchable NULL-key row and a 'D'
    // silently no-ops. Fail execution loudly, inside the plan: assert_true
    // returns NULL for valid rows, so the filter keeps them all.
    val c = changes
      .filter(assert_true(col(opCol).isNotNull,
        lit(s"MergeUpsert: change batch has a NULL '$opCol' value — " +
          "every change row must carry an explicit op (\"U\"/\"D\")")).isNull)
      .filter(assert_true(col(key).isNotNull,
        lit(s"MergeUpsert: change batch has a NULL '$key' value — a keyless " +
          "change can never match the snapshot (a 'U' would silently insert " +
          "an unmatchable NULL-key row); drop or key the row first")).isNull)
      .alias("c")
    val joined = s.join(c, col(s"s.$key") === col(s"c.$key"), "full_outer")
      .filter(col(s"c.$opCol").isNull || col(s"c.$opCol") =!= "D")
    val outCols: Seq[Column] =
      coalesce(col(s"s.$key"), col(s"c.$key")).as(key) +:
        snapshot.columns.filter(_ != key).toSeq.map { name =>
          if (updatable.contains(name))
            coalesce(col(s"c.$name"), col(s"s.$name")).as(name)
          else col(s"s.$name").as(name)
        } :+
        when(col(s"c.$opCol").isNull, lit("K"))
          .when(col(s"s.$key").isNull, lit("I"))
          .otherwise(col(s"c.$opCol")).as(opCol)
    joined.select(outCols: _*)
  }
}
