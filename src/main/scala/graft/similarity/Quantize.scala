package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Int8 symmetric (max-abs) embedding quantization — the standard trick for
  * shrinking an ANN corpus 4× before indexing: `scale = max(|v_i|)`,
  * `q_i = round_half_up(v_i · 127 / scale)`.
  *
  * Everything is a per-row codegen'd array expression (`transform` /
  * `array_max`) — no shuffle, no UDF; at 100 TB this runs entirely inside
  * the scan's whole-stage codegen and writes back 1/4 the bytes.
  *
  * Rounding is `floor(x + 0.5)` rather than `round()` so the oracle
  * reproduces it exactly: half-up-toward-+inf is the same libm-free
  * expression tree in Spark and DuckDB, while the engines' `round()`
  * builtins disagree on negative halves.
  */
object Quantize {

  /** Per-vector max-abs scale, computed on the raw floats (exact: abs and
    * max never round), surfaced as double. */
  def maxAbs(vec: Column): Column =
    array_max(transform(vec, x => abs(x))).cast("double")

  private def q8(v: Column, scale: Column): Column =
    when(scale === 0.0, 0)
      .otherwise(floor(v.cast("double") * 127.0 / scale + 0.5).cast("int"))

  /** Array-in, array-out API: adds `scale` (double) and `q` (array<int>,
    * int8-ranged) columns. */
  def int8(df: DataFrame, vecCol: String): DataFrame = {
    val scale = maxAbs(col(vecCol))
    df.withColumn("scale", scale)
      .withColumn("q", transform(col(vecCol), v => q8(v, col("scale"))))
  }

  /** Exploded (id, dim, v, q, scale) face — one row per vector component,
    * 0-based dim. This is the oracle-checkable shape; `int8` is the one a
    * pipeline would persist. */
  def int8Exploded(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    int8(df, vecCol)
      .select(col(idCol), col("scale"), posexplode(col(vecCol)).as(Seq("dim", "v")))
      .select(col(idCol), col("dim"), col("v").cast("double").as("v"),
        q8(col("v"), col("scale")).as("q"), col("scale"))

  /** Dequantized reconstruction (q · scale / 127) and the per-component
    * absolute reconstruction error — quantization-quality audit face. */
  def reconstructionError(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    int8Exploded(df, idCol, vecCol)
      .withColumn("v_hat", col("q").cast("double") * col("scale") / 127.0)
      .withColumn("abs_err", abs(col("v") - col("v_hat")))
}
