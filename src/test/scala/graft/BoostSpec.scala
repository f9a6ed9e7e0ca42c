package graft

import graft.core.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Fitted tree/boosting wave: driver-side brute-force cross-checks on
  * sf0.001 plus the boosting invariants (weak-learner edge, monotone
  * training loss). */
class BoostSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("stump_fit rank-1 split matches a brute-force exhaustive search") {
    val rows = Tables.lineitem(spark, sf)
      .select(col("l_quantity"), col("l_discount"), col("l_tax"),
        when(col("l_returnflag") === "R", 1.0).otherwise(0.0))
      .collect().map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    val n = rows.length.toDouble
    def gini(cnt: Double, pos: Double): Double =
      1.0 - math.pow(pos / cnt, 2) - math.pow((cnt - pos) / cnt, 2)
    val cands = for {
      (f, get) <- Seq[(String, ((Double, Double, Double, Double)) => Double)](
        ("l_quantity", _._1), ("l_discount", _._2), ("l_tax", _._3))
      v <- rows.map(get).distinct.sorted
      left = rows.filter(get(_) <= v)
      if left.length < rows.length
    } yield {
      val nle = left.length.toDouble; val ple = left.map(_._4).sum
      val ngt = n - nle; val pgt = rows.map(_._4).sum - ple
      val g = BigDecimal((nle * gini(nle, ple) + ngt * gini(ngt, pgt)) / n)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (g, f, v)
    }
    val best = cands.minBy(c => (c._1, c._2, c._3))
    val got = SparkEntry.queries("stump_fit")(spark, sf).orderBy("rank").head()
    assert(got.getString(got.fieldIndex("feature")) == best._2)
    assert(math.abs(got.getDouble(got.fieldIndex("threshold")) - best._3) < 1e-9)
    assert(math.abs(got.getDouble(got.fieldIndex("gini")) - best._1) < 1e-9)
  }

  test("gbt_stumps: training MSE decreases monotonically and beats the constant model") {
    val rows = SparkEntry.queries("gbt_stumps")(spark, sf).orderBy("round").collect()
    assert(rows.length == 4)
    val mses = rows.map(_.getDouble(rows.head.fieldIndex("mse")))
    assert(mses.zip(mses.tail).forall { case (a, b) => b <= a + 1e-9 },
      s"MSE not monotone: ${mses.toSeq}")
    val y = Tables.lineitem(spark, sf)
      .select(col("l_extendedprice") / 100000.0).collect().map(_.getDouble(0))
    val mean = y.sum / y.length
    val varY = y.map(v => (v - mean) * (v - mean)).sum / y.length
    assert(mses.last < varY, s"final MSE ${mses.last} not below baseline variance $varY")
  }

  test("adaboost_stumps: every round's weak learner beats chance; alphas positive") {
    val rows = SparkEntry.queries("adaboost_stumps")(spark, sf).orderBy("round").collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val eps = r.getDouble(r.fieldIndex("eps"))
      assert(eps > 0 && eps < 0.5, s"round ${r.getLong(0)} eps $eps")
      assert(r.getDouble(r.fieldIndex("alpha")) > 0)
    }
    val errs = rows.map(_.getDouble(rows.head.fieldIndex("ens_err")))
    // the 5-round ensemble should not be worse than the single stump
    assert(errs.last <= errs.head + 1e-9, s"ens err ${errs.toSeq}")
  }

  test("feature_select MI matches a driver-side recomputation per feature") {
    val rows = Tables.lineitem(spark, sf)
      .select(col("l_quantity"), col("l_discount"), col("l_tax"), col("l_returnflag"))
      .collect()
    val feats = Seq[(String, org.apache.spark.sql.Row => Long)](
      ("l_quantity", r => math.floor(r.getDouble(0) / 10).toLong),
      ("l_discount", r => math.round(r.getDouble(1) * 100)),
      ("l_tax", r => math.round(r.getDouble(2) * 100)))
    val got = SparkEntry.queries("feature_select")(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    feats.foreach { case (f, bin) =>
      val pairs = rows.map(r => (bin(r), r.getString(3)))
      val n = pairs.length.toDouble
      val joint = pairs.groupBy(identity).view.mapValues(_.length.toDouble)
      val byB = pairs.groupBy(_._1).view.mapValues(_.length.toDouble)
      val byL = pairs.groupBy(_._2).view.mapValues(_.length.toDouble)
      val mi = joint.map { case ((b, l), c) =>
        c / n * math.log(c * n / (byB(b) * byL(l)))
      }.sum
      val r = got(f)
      assert(r.getLong(r.fieldIndex("n_bins")) == byB.size)
      assert(math.abs(r.getDouble(r.fieldIndex("mi")) - mi) < 1e-5, s"$f MI")
      assert(r.getDouble(r.fieldIndex("chi2")) >= 0)
    }
    assert(got.values.map(_.getLong(got.head._2.fieldIndex("mi_rank"))).toSet == Set(1L, 2L, 3L))
  }
}
