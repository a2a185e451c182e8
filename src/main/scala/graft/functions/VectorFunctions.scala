package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float|double>` columns using codegen'd built-ins
  * (`zip_with` + `aggregate`) — no UDFs, stays inside whole-stage codegen.
  *
  * All math is done in Double with a sequential left-to-right fold so results
  * are bitwise-reproducible and match a sequential oracle computation.
  */
object VectorFunctions {
  /** Cast array<float> to array<double> (parquet embeddings are float32). */
  def toDouble(a: Column): Column = transform(a, x => x.cast("double"))

  /** Native fused multiply-add loop ([[DotProductExpr]]) — same sequential
    * accumulation as a `zip_with`+`aggregate` fold, without the per-row
    * intermediate array. Requires [[GraftFunctions.register]] on the session
    * (done by graft.Tables loaders). */
  def dot(a: Column, b: Column): Column = call_function("graft_dot", a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Cosine over float arrays, computed in double. */
  def cosineF(a: Column, b: Column): Column = cosine(toDouble(a), toDouble(b))
}
