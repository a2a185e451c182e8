package graft.imputer

import org.apache.spark.ml.classification.DecisionTreeClassifier
import org.apache.spark.ml.regression.DecisionTreeRegressor
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** End-to-end SparkImputer behavior on the reference README examples
  * (readme.md "Example Usage"): mixed continuous/categorical frames with
  * NaNs come back fully imputed; models persist and reload. */
class SparkImputerSpec extends SparkSpec {

  private def mixedFrame = {
    import spark.implicits._
    // ref readme second example: A,B,C continuous; D,E,F categorical
    Seq(
      (0L, Some(1.0), 1.0, None: Option[Double], Some("1"), Some("1"), Some("0")),
      (1L, None: Option[Double], 3.0, None: Option[Double], Some("0"), Some("1"), None: Option[String]),
      (2L, Some(2.0), 4.0, Some(2.0), None: Option[String], None: Option[String], None: Option[String]),
      (3L, Some(3.0), 3.0, Some(1.0), Some("1"), Some("1"), Some("1")),
      (4L, Some(4.0), 4.0, Some(2.0), Some("0"), None: Option[String], Some("0")),
      (5L, Some(2.5), 2.0, Some(1.0), Some("1"), Some("0"), Some("1")),
      (6L, None: Option[Double], 1.0, Some(2.0), Some("0"), Some("1"), Some("0")),
      (7L, Some(1.5), 2.0, Some(1.5), Some("1"), Some("0"), Some("1")),
      (8L, Some(3.5), 3.0, Some(2.0), Some("0"), Some("1"), Some("0")),
      (9L, Some(2.2), 1.0, Some(1.2), Some("1"), Some("0"), Some("1"))
    ).toDF("id", "A", "B", "C", "D", "E", "F")
  }

  private val imputer = new SparkImputer(idCol = "id",
    categorical = Seq("D", "E", "F"), testModulo = 5)

  test("missingMetrics reports per-variable rates") {
    val m = imputer.missingMetrics(mixedFrame).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(m("A") == (8L, 2L))
    assert(m("B") == (10L, 0L))
    assert(m("C") == (8L, 2L))
    assert(m("F") == (8L, 2L))
  }

  test("columnsToImpute finds exactly the columns with nulls") {
    assert(imputer.columnsToImpute(mixedFrame).toSet == Set("A", "C", "D", "E", "F"))
  }

  test("fitTransform imputes every missing cell (ref tests.py no-null check)") {
    val out = imputer.fitTransform(mixedFrame,
      new DecisionTreeClassifier(), new DecisionTreeRegressor())
    val nulls = out.columns.map(c => out.filter(col(c).isNull).count()).sum
    assert(nulls == 0)
    // observed values are untouched
    val a0 = out.filter(col("id") === 0).select("A").collect()(0).getDouble(0)
    assert(a0 == 1.0)
  }

  test("categorical imputation returns observed label values") {
    val out = imputer.fitTransform(mixedFrame,
      new DecisionTreeClassifier(), new DecisionTreeRegressor())
    val dVals = out.select("D").distinct().collect().map(_.getString(0)).toSet
    assert(dVals.subsetOf(Set("0", "1")))
  }

  test("save/load roundtrip imputes like the original") {
    val dir = java.nio.file.Files.createTempDirectory("graft_imp").toString
    val model = imputer.fit(mixedFrame, new DecisionTreeClassifier(), new DecisionTreeRegressor())
    val direct = model.transform(mixedFrame).orderBy("id").collect()
    model.save(spark, dir)
    val loaded = SparkImputerModel.load(spark, dir, imputer)
    assert(loaded.models.keySet == model.models.keySet)
    val replayed = loaded.transform(mixedFrame).orderBy("id").collect()
    assert(replayed.toSeq == direct.toSeq)
    // _meta round-trips the whole ColumnModel, not just the pipelines:
    // featureCols, metric name/score, and timings survive save→load, so a
    // loaded model's performance() matches the saved one
    model.models.foreach { case (t, cm) =>
      val lm = loaded.models(t)
      assert(lm.featureCols == cm.featureCols, s"featureCols of $t")
      assert(lm.metricName == cm.metricName)
      assert(lm.metricValue == cm.metricValue ||
        (lm.metricValue.isNaN && cm.metricValue.isNaN), s"score of $t")
    }
    // a column name that would corrupt the hand-rolled _meta format (or
    // nest the model_<target> path) fails loudly instead of silently
    // misparsing on reload
    val poisoned = new SparkImputerModel(imputer,
      Map("bad\"name" -> model.models.head._2))
    val eq = intercept[IllegalArgumentException] {
      poisoned.save(spark, java.nio.file.Files.createTempDirectory("graft_imp").toString)
    }
    assert(eq.getMessage.contains("rename the column"))
    model.models.foreach { case (t, cm) =>
      val lm = loaded.models(t)
      assert(lm.trainTime == cm.trainTime && lm.testTime == cm.testTime)
    }
    val perfSaved = model.performance(spark).orderBy("variable").collect().toSeq
    val perfLoaded = loaded.performance(spark).orderBy("variable").collect().toSeq
    assert(perfLoaded == perfSaved)
  }

  test("validate treats NaN cells as missing and survives all-null targets") {
    import spark.implicits._
    val frame = Seq(
      (0L, Option(1.0), 10.0), (1L, None: Option[Double], 20.0), (2L, Option(3.0), 30.0),
      (3L, Option(4.0), 40.0), (4L, Option(5.0), 50.0), (5L, None: Option[Double], 60.0),
      (6L, Option(7.0), 70.0), (7L, Option(8.0), 80.0), (8L, Option(9.0), 90.0),
      (9L, Option(10.0), 100.0)
    ).toDF("id", "x", "y")
    val imp = new SparkImputer(idCol = "id", testModulo = 5)
    val model = imp.fit(frame, new DecisionTreeClassifier(), new DecisionTreeRegressor())
    // NaN cells are missing (ref validate's fillna sentinel): they must drop
    // out of the observed rows, not score as actual values
    val poisoned = frame.withColumn("x",
      when(col("id") < 5, lit(Double.NaN)).otherwise(col("x")))
    val v1 = model.validate(poisoned).collect()
      .map(r => r.getString(0) -> (r.getDouble(2), r.getLong(3))).toMap
    assert(v1("x")._2 == 4L)      // ids 6..9 observed (5 was already null)
    assert(!v1("x")._1.isNaN)
    // entirely-null target: zero observed rows → NaN score, not an NPE
    val blank = frame.withColumn("x", lit(null).cast("double"))
    val v2 = model.validate(blank).collect()
      .map(r => r.getString(0) -> (r.getDouble(2), r.getLong(3))).toMap
    assert(v2("x")._1.isNaN && v2("x")._2 == 0L)
  }

  test("validate scores observed rows for every trained column") {
    val model = imputer.fit(mixedFrame, new DecisionTreeClassifier(), new DecisionTreeRegressor())
    val v = model.validate(mixedFrame).collect()
    assert(v.map(_.getString(0)).toSet == Set("A", "C", "D", "E", "F"))
    v.foreach { r =>
      val metric = r.getString(1)
      assert(metric == "mse" || metric == "accuracy")
      assert(!r.isNullAt(2))
    }
  }

  test("selectModel ranks candidate pairs with timings, sizes, rank sums") {
    val res = ModelSelection.selectModel(imputer, mixedFrame, Seq(
      ModelOption("tree", new DecisionTreeClassifier(), new DecisionTreeRegressor(),
        checkSeparateFitTransformTime = true),
      ModelOption("tree_d2",
        new DecisionTreeClassifier().setMaxDepth(2),
        new DecisionTreeRegressor().setMaxDepth(2))))
    val rows = res.collect()
    assert(rows.length == 2)
    assert(rows.map(_.getString(0)).toSet == Set("tree", "tree_d2"))
    val cols = res.columns
    assert(cols.contains("sum_of_performance_ranks"))
    assert(cols.contains("A_mse_rank") && cols.contains("D_accuracy_rank"))
    val tree = rows.find(_.getString(0) == "tree").get
    assert(!tree.isNullAt(tree.fieldIndex("model_size")))          // measured
    assert(!tree.isNullAt(tree.fieldIndex("user_rollout_time_transform")))
    val d2 = rows.find(_.getString(0) == "tree_d2").get
    assert(d2.isNullAt(d2.fieldIndex("model_size")))               // not requested
  }

  test("selectModel checkpoint survives a mid-study failure with N-1 rows") {
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt")
      .resolve("summary.csv").toString
    // candidate 3 dies at fit time (maxDepth must be >= 0) AFTER two good
    // candidates have been measured — the reference's per-candidate to_csv
    // (scikit_learn_imputer.py:520-522) is exactly for this case
    val boom = intercept[Exception] {
      ModelSelection.selectModel(imputer, mixedFrame, Seq(
        ModelOption("good_a", new DecisionTreeClassifier(), new DecisionTreeRegressor()),
        ModelOption("good_b",
          new DecisionTreeClassifier().setMaxDepth(2),
          new DecisionTreeRegressor().setMaxDepth(2)),
        ModelOption("bad",
          new DecisionTreeClassifier() {
            override def train(d: org.apache.spark.sql.Dataset[_]):
                org.apache.spark.ml.classification.DecisionTreeClassificationModel =
              throw new RuntimeException("cluster lost mid-study")
          },
          new DecisionTreeRegressor())), checkpointPath = ckpt)
    }
    assert(boom != null)
    val lines = java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(ckpt)).toArray.map(_.toString)
    assert(lines.length == 3) // header + the two completed candidates
    assert(lines.head.startsWith("model,fit_function_time,"))
    assert(lines(1).startsWith("good_a,") && lines(2).startsWith("good_b,"))
    // every completed row carries all measurement columns
    val nCols = lines.head.split(",", -1).length
    assert(lines.tail.forall(_.split(",", -1).length == nCols))
  }

  test("selectModel gives tied metrics pandas average ranks") {
    // two IDENTICAL candidates → every metric ties → both must get the
    // average of positions 1 and 2 (= 1.5), not distinct ranks 1 and 2
    // (pandas .rank() default method='average', ref L534-541)
    val res = ModelSelection.selectModel(imputer, mixedFrame, Seq(
      ModelOption("twin_a", new DecisionTreeClassifier(), new DecisionTreeRegressor()),
      ModelOption("twin_b", new DecisionTreeClassifier(), new DecisionTreeRegressor())))
    val rows = res.collect()
    val rankCols = res.columns.filter(c => c.endsWith("_mse_rank") || c.endsWith("_accuracy_rank"))
    assert(rankCols.nonEmpty)
    rows.foreach { r =>
      rankCols.foreach { c =>
        assert(r.getDouble(r.fieldIndex(c)) == 1.5, s"$c of ${r.getString(0)}")
      }
      // 5 metric columns (A,C mse; D,E,F accuracy) × 1.5 each
      assert(r.getDouble(r.fieldIndex("sum_of_performance_ranks")) == 7.5)
    }
    // unmeasured rollout/size columns keep missing ranks (pandas na_option='keep')
    rows.foreach { r =>
      assert(r.isNullAt(r.fieldIndex("user_rollout_time_transform_rank")))
      assert(r.isNullAt(r.fieldIndex("model_size_rank")))
    }
  }

  test("custom scaler is honored (ref fit's scaler parameter)") {
    // identity scaler: features keep raw values
    val identity = new SparkImputer(idCol = "id", categorical = Seq("D", "E", "F"),
      testModulo = 5,
      scaler = (d, cs, suf) => cs.foldLeft(d)((acc, c) => acc.withColumn(s"$c$suf", col(c))))
    val feats = identity.scaledFeatures(mixedFrame)
    val b = feats.select("B").collect().map(_.getDouble(0)).toSet
    assert(b == Set(1.0, 2.0, 3.0, 4.0)) // raw, not scaled to [0,1]
    val out = identity.fitTransform(mixedFrame,
      new DecisionTreeClassifier(), new DecisionTreeRegressor())
    assert(out.columns.map(c => out.filter(col(c).isNull).count()).sum == 0)
  }

  test("createFeatures with missing flags appends int flag columns") {
    val withFlags = new SparkImputer(idCol = "id", categorical = Seq("D", "E", "F"),
      includeMissingFlags = true)
    val f = withFlags.createFeatures(mixedFrame)
    assert(f.columns.contains("A_flag") && f.columns.contains("F_flag"))
    assert(f.filter(col("A_flag") === 1).count() == 2) // two missing A rows
  }

  test("arbitrary test_size fraction splits deterministically (ref fit test_size)") {
    import spark.implicits._
    val n = 2000
    val frame = (0L until n).map(i => (i, i.toDouble, (i * 7 % 100).toDouble))
      .toDF("id", "x", "y")
    val imp = new SparkImputer(idCol = "id", testSize = 0.3)
    val testRows = frame.filter(imp.isTestRow(col("id"))).count()
    // hash split: fraction within a few percent of the requested 30%
    assert(math.abs(testRows.toDouble / n - 0.3) < 0.04, s"got $testRows of $n")
    // deterministic: same predicate, same rows every time
    val again = frame.filter(imp.isTestRow(col("id"))).count()
    assert(again == testRows)
    // unrepresentable fractions under the old 1/m scheme now work end to end
    val frame2 = frame.withColumn("x",
      when(col("id") % 5 === 0, lit(null).cast("double")).otherwise(col("x")))
    val model = imp.fit(frame2, new DecisionTreeClassifier(), new DecisionTreeRegressor())
    assert(!model.models("x").metricValue.isNaN)
    intercept[IllegalArgumentException] { new SparkImputer(idCol = "id", testSize = 1.5) }
  }

  test("constructor and save-path validation mirror the reference error tests") {
    // ref tests.py test_key_error: unknown categorical columns
    val e1 = intercept[IllegalArgumentException] {
      new SparkImputer(idCol = "id", categorical = Seq("pilot", "space"))
        .fit(mixedFrame, new DecisionTreeClassifier(), new DecisionTreeRegressor())
    }
    assert(e1.getMessage.contains("The following columns are not in data frame")
      && e1.getMessage.contains("pilot"))
    // ref tests.py test_os_error: save dir must exist BEFORE training starts
    val badPath = new SparkImputer(idCol = "id", categorical = Seq("D", "E", "F"),
      testModulo = 5, saveModelsTo = "/graft_no_such_dir_xyz/model")
    val e2 = intercept[java.io.IOException] {
      badPath.fit(mixedFrame, new DecisionTreeClassifier(), new DecisionTreeRegressor())
    }
    assert(e2.getMessage == "The directory specified in save_models_to does not exist")
    // same pre-flight on an explicit save path
    val model = imputer.fit(mixedFrame, new DecisionTreeClassifier(), new DecisionTreeRegressor())
    intercept[java.io.IOException] {
      model.save(spark, "/graft_no_such_dir_xyz/model")
    }
    // eager value checks at construction (ref __init__ raises before any work)
    intercept[IllegalArgumentException] { new SparkImputer(idCol = "id", testModulo = 1) }
    intercept[IllegalArgumentException] { new SparkImputer(idCol = "id", classThreshold = 0) }
  }

  test("loud failure per bad-input class: missing id, wrong-typed categorical") {
    import spark.implicits._
    // ref tests.py pins a SPECIFIC loud error per malformed-input class —
    // the contract is "fail at entry with the named column", never a
    // confusing stack trace mid-fit
    val df = Seq((1L, 1.0, Seq(1.0))).toDF("id", "x", "arr")
    // missing id column
    val e1 = intercept[IllegalArgumentException] {
      new SparkImputer(idCol = "row_id")
        .fit(df, new DecisionTreeClassifier(), new DecisionTreeRegressor())
    }
    assert(e1.getMessage.contains("id column 'row_id' is not in the data frame"))
    // wrong-typed categorical (the ref TypeError class): an array column
    // cannot be a category — named loudly at entry
    val e2 = intercept[IllegalArgumentException] {
      new SparkImputer(idCol = "id", categorical = Seq("arr"))
        .fit(df, new DecisionTreeClassifier(), new DecisionTreeRegressor())
    }
    assert(e2.getMessage.contains("categorical columns must be atomic-typed")
      && e2.getMessage.contains("arr: array<double>"))
    // transform-side validation fails the same way (shared entry checks)
    val e3 = intercept[IllegalArgumentException] {
      new SparkImputer(idCol = "id", categorical = Seq("arr"))
        .fitTransform(df, new DecisionTreeClassifier(), new DecisionTreeRegressor())
    }
    assert(e3.getMessage.contains("atomic-typed"))
  }

  test("findImputationVariance: zero for identical datasets, positive for different") {
    import spark.implicits._
    val d1 = Seq((1.0, "a"), (2.0, "a"), (3.0, "b")).toDF("x", "c")
    val d2 = Seq((1.0, "a"), (2.0, "a"), (5.0, "a")).toDF("x", "c")
    val same = ImputationVariance.findImputationVariance(Seq(d1, d1), Seq("c"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(same("x") == 0.0 && same("c") == 0.0)
    val diff = ImputationVariance.findImputationVariance(Seq(d1, d2), Seq("c"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(diff("x") > 0.0 && diff("c") > 0.0)
  }
}
