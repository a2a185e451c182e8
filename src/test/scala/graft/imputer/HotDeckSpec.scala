package graft.imputer

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Sequential hot-deck: every imputed value must be a REAL donor value from
  * the same cell, chosen by the deterministic scrambled order. */
class HotDeckSpec extends SparkSpec {

  test("imputed values are observed donor values from the same cell") {
    import spark.implicits._
    val df = (1L to 200L).map { i =>
      val cell = (i % 3).toInt
      // donor values encode their cell in the integer part so a cross-cell
      // leak is detectable from the value alone
      val v: Option[Double] = if (i % 4 == 0) None else Some(cell * 1000.0 + i)
      (i, cell, v)
    }.toDF("id", "cell", "x")
    val out = HotDeck.sequential(df, "cell", "id", Seq("x"))
    assert(out.filter(col("x").isNull).count() == 0)
    val leaked = out.filter(floor(col("x") / 1000.0).cast("int") =!= col("cell"))
    assert(leaked.count() == 0)
    // imputed values come from the observed donor SET of the cell
    val donors = df.filter(col("x").isNotNull).select("cell", "x")
      .as[(Int, Double)].collect().toSet
    val got = out.select("cell", "x").as[(Int, Double)].collect()
    assert(got.forall(donors.contains))
  }

  test("matches the per-cell LOCF-with-wraparound reference in scrambled order") {
    import spark.implicits._
    val rows = (1L to 60L).map { i =>
      (i, (i % 2).toInt, if (i % 3 == 0) None: Option[Double] else Some(i.toDouble))
    }
    val df = rows.toDF("id", "cell", "x")
    // driver-side reference: sort each cell by the scramble, carry forward,
    // wrap leading missings to the first donor
    def scramble(id: Long): Long = ((id % 2147483647L) * 2654435761L) % 2147483647L
    val want = rows.groupBy(_._2).flatMap { case (_, cellRows) =>
      val ordered = cellRows.sortBy(r => (scramble(r._1), r._1))
      val firstDonor = ordered.flatMap(_._3).headOption
      var lastSeen: Option[Double] = None
      ordered.map { case (id, cell, v) =>
        val filled = v.orElse(lastSeen).orElse(firstDonor)
        if (v.isDefined) lastSeen = v
        (id, cell, filled)
      }
    }.toSeq.sortBy(_._1)
    val got = HotDeck.sequential(df, "cell", "id", Seq("x"))
      .orderBy("id").as[(Long, Int, Option[Double])].collect().toSeq
    assert(got == want)
  }

  test("a cell with no donors stays missing instead of leaking a neighbor") {
    import spark.implicits._
    val df = Seq(
      (1L, 0, Some(5.0)), (2L, 0, None: Option[Double]),
      (3L, 1, None: Option[Double]), (4L, 1, None: Option[Double])
    ).toDF("id", "cell", "x")
    val out = HotDeck.sequential(df, "cell", "id", Seq("x"))
      .orderBy("id").as[(Long, Int, Option[Double])].collect()
    assert(out(1)._3.contains(5.0))
    assert(out(2)._3.isEmpty && out(3)._3.isEmpty)
  }
}
