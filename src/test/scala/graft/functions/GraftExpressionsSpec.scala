package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The native expressions must agree exactly with the built-in
  * formulations they replace — including bitwise double equality for the
  * dot product (same sequential accumulation). */
class GraftExpressionsSpec extends SparkSpec {

  test("graft_dot is bitwise-identical to the zip_with/aggregate fold") {
    // built from spark.range so the expressions run through WholeStageCodegen
    // (a LocalRelation would be folded and evaluated interpreted, hiding
    // codegen-only bugs like uninitialized accumulators)
    val df = spark.range(1, 51).select(
      transform(sequence(lit(0), lit(15)), d => sin(col("id") * 17 + d) * 3.7).as("a"),
      transform(sequence(lit(0), lit(15)), d => cos(col("id") * 31 + d) * 1.3).as("b"))
    val got = df.select(VectorFunctions.dot(col("a"), col("b"))).collect().map(_.getDouble(0))
    val want = df.select(
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y), lit(0.0), (s, v) => s + v))
      .collect().map(_.getDouble(0))
    assert(got.toSeq == want.toSeq) // == on Double is bitwise here (no NaN)
  }

  test("graft_dot handles unequal lengths and empty arrays") {
    import spark.implicits._
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0)), (Seq.empty[Double], Seq(1.0)))
      .toDF("a", "b")
    val got = df.select(VectorFunctions.dot(col("a"), col("b"))).collect().map(_.getDouble(0))
    assert(got.toSeq == Seq(14.0, 0.0))
  }

  test("graft_sorted_intersect_size matches array_intersect on sorted distinct arrays") {
    // spark.range source → codegen path (see note above)
    val df = spark.range(1, 41).select(
      sort_array(array_distinct(transform(sequence(lit(0), lit(19)),
        j => concat(lit("w"), (col("id") * 7 + j * 3) % 25)))).as("a"),
      sort_array(array_distinct(transform(sequence(lit(0), lit(19)),
        j => concat(lit("w"), (col("id") * 11 + j * 5) % 25)))).as("b"))
    val got = df.select(call_function("graft_sorted_intersect_size", col("a"), col("b")))
      .collect().map(_.getInt(0))
    val want = df.select(size(array_intersect(col("a"), col("b")))).collect().map(_.getInt(0))
    assert(got.toSeq == want.toSeq)
  }

  test("null inputs yield null") {
    import spark.implicits._
    val df = Seq((Some(Seq(1.0)), None: Option[Seq[Double]])).toDF("a", "b")
    val r = df.select(VectorFunctions.dot(col("a"), col("b"))).collect()
    assert(r(0).isNullAt(0))
  }
}
