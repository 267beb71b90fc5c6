package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EvalSpec extends SparkSpec {
  import spark.implicits._

  private def metrics(rows: Seq[(Long, Boolean, Boolean)]) = {
    val df = rows.toDF("bucket", "label", "pred")
    Eval.binaryMetrics(df, col("bucket"), col("label"), col("pred")).collect().head
  }

  test("perfect separation gives auc = 1, inverted gives 0") {
    val perfect = metrics(Seq((1L, false, false), (2L, false, false),
      (3L, true, true), (4L, true, true)))
    assert(perfect.getAs[Double]("auc") == 1.0)
    assert(perfect.getAs[Double]("precision") == 1.0)
    assert(perfect.getAs[Double]("recall") == 1.0)
    assert(perfect.getAs[Double]("f1") == 1.0)
    val inverted = metrics(Seq((4L, false, false), (3L, false, false),
      (1L, true, true), (2L, true, true)))
    assert(inverted.getAs[Double]("auc") == 0.0)
  }

  test("average-rank tie correction: all-tied scores give auc = 0.5 exactly") {
    val tied = metrics(Seq((7L, true, true), (7L, false, true),
      (7L, true, true), (7L, false, true)))
    assert(tied.getAs[Double]("auc") == 0.5)
    // all predicted positive: tp=2 fp=2 fn=0 tn=0
    assert(tied.getAs[Long]("tp") == 2 && tied.getAs[Long]("fp") == 2)
    assert(tied.getAs[Double]("recall") == 1.0)
    assert(tied.getAs[Double]("precision") == 0.5)
  }

  test("hand-computed mixed case matches the Mann-Whitney formula") {
    // buckets: neg@1, pos@2, neg@2, pos@3 -> ranks 1, (2.5, 2.5), 4
    // rank_sum(pos) = 2.5 + 4 = 6.5; auc = (6.5 - 2*3/2) / (2*2) = 0.875
    val m = metrics(Seq((1L, false, false), (2L, true, false),
      (2L, false, false), (3L, true, true)))
    assert(m.getAs[Double]("auc") == 0.875)
    // threshold: tp=1 fp=0 fn=1 tn=2
    assert(m.getAs[Long]("tp") == 1 && m.getAs[Long]("fp") == 0)
    assert(m.getAs[Long]("fn") == 1 && m.getAs[Long]("tn") == 2)
    assert(m.getAs[Double]("f1") == 2.0 / 3.0)
  }

  test("degenerate classes: auc and ratios null, counts intact") {
    val allPos = metrics(Seq((1L, true, false), (2L, true, true)))
    assert(allPos.isNullAt(allPos.fieldIndex("auc")))
    assert(allPos.getAs[Long]("n_pos") == 2 && allPos.getAs[Long]("n_neg") == 0)
    assert(allPos.getAs[Double]("recall") == 0.5)
    val nonePred = metrics(Seq((1L, false, false), (2L, true, false)))
    assert(nonePred.isNullAt(nonePred.fieldIndex("precision")))
  }
}
