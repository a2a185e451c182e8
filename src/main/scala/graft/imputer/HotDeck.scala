package graft.imputer

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequential hot-deck imputation — the survey-statistics donor method the
  * reference's mean/median/group strategies sit beside
  * (scikit_learn_imputer.py:150-166 covers the model-based family; hot-deck
  * is the donor-based family): each missing value is replaced by an OBSERVED
  * value from a "donor" record in the same adjustment cell, so imputed values
  * are always real, in-distribution observations (never a synthetic mean that
  * no respondent actually reported — the property hot-deck exists for).
  *
  * Classic sequential hot-deck sorts the cell in a random order and carries
  * the last observed value forward. A non-deterministic shuffle would make
  * the result irreproducible across reruns/engines, so the "random" order
  * here is the same RNG-free multiplicative scramble the sampling operators
  * use ([[graft.operators.Sampling]]): `(id mod (2^31−1)) · 2654435761 mod
  * (2^31−1)` — a bijection on ~2.1e9 residues, uncorrelated with id order,
  * exactly reproducible in any SQL engine (the product stays under 2^63).
  * Leading missings in the scrambled order (no preceding donor yet) take the
  * cell's FIRST observed value in that order — the standard wrap-around.
  * A cell with no donors at all stays missing (the caller chains a global
  * strategy behind it, same as the reference's hierarchical fill).
  *
  * Scale shape: two windows PARTITIONED BY the cell key — one shuffle on the
  * cell, parallel across cells, no global window. Donor values are picked,
  * never averaged, so doubles pass through bitwise (hash-checkable).
  */
object HotDeck {

  /** Deterministic donor order from an integer id (see scaladoc above). */
  def donorOrder(id: Column): Column =
    pmod(pmod(id, lit(2147483647L)) * lit(2654435761L), lit(2147483647L))

  /** Impute `valueCols` within `cellCol` adjustment cells, donors ordered by
    * the scrambled `idCol`. `idCol` must be non-null integers (ids beyond
    * 2^31−1 still work — the scramble only decides order; the id itself
    * tie-breaks residue collisions). */
  def sequential(df: DataFrame, cellCol: String, idCol: String,
                 valueCols: Seq[String]): DataFrame = {
    val wf = Window.partitionBy(cellCol).orderBy(col("_hd_ord"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wb = Window.partitionBy(cellCol).orderBy(col("_hd_ord"), col(idCol))
      .rowsBetween(0, Window.unboundedFollowing)
    val filled = valueCols.foldLeft(df.withColumn("_hd_ord", donorOrder(col(idCol)))) {
      (d, c) =>
        // carry-forward, then the wrap-around: after the forward pass the
        // only nulls left are the leading run before the cell's first donor,
        // and the backward first() fills exactly those with that donor.
        d.withColumn(c, last(col(c), ignoreNulls = true).over(wf))
          .withColumn(c, first(col(c), ignoreNulls = true).over(wb))
    }
    filled.drop("_hd_ord")
  }
}
