package graft.similarity

import org.apache.spark.sql.functions._
import graft.SparkSpec

class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  test("int8 quantizes with max-abs scale and half-up rounding") {
    val df = Seq(
      (0L, Seq(1.0f, -0.5f, 0.25f)),
      (1L, Seq(0.0f, 0.0f, 0.0f))          // zero vector: scale 0, q all 0
    ).toDF("vec_id", "embedding")
    val out = Quantize.int8(df, "embedding")
      .select($"vec_id", $"scale", $"q").as[(Long, Double, Seq[Int])]
      .collect().sortBy(_._1)
    assert(out(0)._2 == 1.0)
    assert(out(0)._3 == Seq(127, -63, 32))  // -63.5 → floor(-63.0)= -63; 31.75+0.5 → 32
    assert(out(1)._2 == 0.0 && out(1)._3 == Seq(0, 0, 0))
  }

  test("exact half values round half-up toward +inf on both signs") {
    // scale = 1.0; ±0.5 · 127 = ±63.5 → floor(x + 0.5): 64 and -63
    val df = Seq((0L, Seq(1.0f, 0.5f, -0.5f))).toDF("vec_id", "embedding")
    val q = Quantize.int8(df, "embedding").select($"q").as[Seq[Int]].head()
    assert(q == Seq(127, 64, -63))
  }

  test("int8Exploded matches the array face component-wise") {
    val df = Seq((7L, Seq(0.3f, -0.9f, 0.6f, 0.9f))).toDF("vec_id", "embedding")
    val arr = Quantize.int8(df, "embedding").select($"q").as[Seq[Int]].head()
    val expl = Quantize.int8Exploded(df, "vec_id", "embedding")
      .orderBy("dim").select("q").as[Int].collect().toSeq
    assert(arr == expl)
    assert(expl.forall(q => q >= -127 && q <= 127))
  }

  test("reconstruction error is bounded by half a quantization step") {
    val df = Seq((0L, Seq(0.83f, -0.41f, 0.002f, -0.77f))).toDF("vec_id", "embedding")
    val errs = Quantize.reconstructionError(df, "vec_id", "embedding")
      .select(max($"abs_err"), max($"scale")).as[(Double, Double)].head()
    assert(errs._1 <= errs._2 / 127.0 / 2.0 + 1e-12)
  }
}
