package graft.text

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.SparkSpec

class PackingSpec extends SparkSpec {

  test("two-pass token offsets equal the single-window cumsum") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val docs = (1L to 500L).map { i =>
      (i, Seq.fill(1 + rnd.nextInt(40))("w").mkString(" "))
    }.toDF("doc_id", "text").repartition(7) // scrambled input partitioning
    val toks = size(split(col("text"), " ")).cast("bigint")
    val got = Packing.packWindows(docs, "doc_id", toks, budget = 64)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val naive = docs.select(col("doc_id"), toks.as("n"))
      .withColumn("start", coalesce(sum("n").over(
        Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.map(t => (t._1, t._2, t._3)).toSeq == naive.toSeq)
    // pack assignment invariants
    got.foreach { case (_, n, start, pack, nPacks) =>
      assert(pack == start / 64)
      assert(nPacks == (start + math.max(n - 1, 0)) / 64 - pack + 1)
    }
    // offsets are contiguous: each doc starts where the previous ended
    got.sliding(2).foreach { case Array(a, b) =>
      assert(b._3 == a._3 + a._2)
    case _ => ()
    }
  }

  test("more partitions than rows still yields a correct global cumsum") {
    import spark.implicits._
    val docs = Seq((1L, 3L), (2L, 5L), (3L, 2L)).toDF("doc_id", "n")
    val out = Packing.packWindows(docs, "doc_id", col("n"), budget = 4,
        numPartitions = 16)
      .orderBy("doc_id").select("tok_start", "pack_id", "n_packs")
      .as[(Long, Long, Long)].collect().toSeq
    // offsets 0,3,8; budget 4 → packs: [0], [0..1], [2]
    assert(out == Seq((0L, 0L, 1L), (3L, 0L, 2L), (8L, 2L, 1L)))
  }
}
