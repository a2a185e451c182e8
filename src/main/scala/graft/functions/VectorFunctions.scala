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

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Cosine over float arrays, computed in double. */
  def cosineF(a: Column, b: Column): Column = cosine(toDouble(a), toDouble(b))
}
