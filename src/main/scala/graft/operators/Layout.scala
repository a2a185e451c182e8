package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton) interleaving, the
  * clustering trick behind Delta/Iceberg OPTIMIZE ZORDER — rows sorted by
  * the interleaved key land in files whose min/max statistics are TIGHT in
  * EVERY interleaved dimension, so parquet row-group / file skipping works
  * for predicates on any of them (a plain sort gives skipping on the
  * leading column only).
  *
  * The Morton code is a pure bit-arithmetic projection (shift/and/or
  * chains — whole-stage codegen, no UDF, reproducible in any engine), so
  * the layout is cheap to compute and the write is one
  * `repartitionByRange(z) + sortWithinPartitions(z)` — exactly the shuffle
  * a sorted write costs anyway.
  */
object Layout {

  /** Morton-interleave the low `bits` bits of two non-negative ints:
    * bit i of `x` lands at position 2i, bit i of `y` at 2i+1. 2·bits ≤ 62
    * keeps the code in a positive bigint. Values ≥ 2^bits alias (the
    * caller buckets/clamps first — stated, not checked, because the z-code
    * is a layout hint, not a semantic key). */
  def morton(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    (0 until bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** Cluster `df` for a Z-ordered write: range-partition on the Morton code
    * of (xCol, yCol) into `numFiles` output partitions and sort within each
    * — the standard OPTIMIZE ZORDER shape. Downstream `.write.parquet`
    * yields one tight-statistics file per partition. */
  def zOrderBy(df: DataFrame, xCol: String, yCol: String, bits: Int,
               numFiles: Int): DataFrame = {
    require(numFiles >= 1, s"numFiles must be >= 1, got $numFiles")
    val z = morton(col(xCol), col(yCol), bits)
    df.withColumn("_z", z)
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
  }
}
