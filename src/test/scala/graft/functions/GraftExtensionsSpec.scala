package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier

/** The `spark.sql.extensions` entry point must stay in lockstep with the
  * session-level `register` route — both install `GraftFunctions.builders`.
  * (A true extensions-built session needs a fresh SparkContext, which a
  * shared-JVM suite can't create; the builder list being the single source
  * of truth is what makes the two routes equivalent by construction.) */
class GraftExtensionsSpec extends SparkSpec {

  test("extensions inject every builder without error") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext) // throws on malformed injection
  }

  test("register() installs exactly the builder list into the session registry") {
    GraftFunctions.register(spark)
    val registry = spark.sessionState.functionRegistry
    GraftFunctions.builders.foreach { case (name, _) =>
      assert(registry.functionExists(FunctionIdentifier(name)), name)
    }
  }

  test("every SQL-callable graft function resolves through plain spark.sql") {
    GraftFunctions.register(spark)
    import spark.implicits._
    Seq((Seq(1.0, 2.0), Seq(3.0, 4.0), "a b c d", 7L))
      .toDF("a", "b", "t", "x").createOrReplaceTempView("ext_probe")
    val r = spark.sql(
      """SELECT graft_dot(a, b) AS d,
        |       graft_deflate_len(t) AS z,
        |       graft_simhash64(array(x)) AS s,
        |       size(graft_shingle_hashes(t, 2)) AS n
        |FROM ext_probe""".stripMargin).collect().head
    assert(r.getDouble(0) == 11.0)
    assert(r.getInt(1) > 0)
    assert(r.getLong(2) == 7L)
    assert(r.getInt(3) == 3)
  }
}
