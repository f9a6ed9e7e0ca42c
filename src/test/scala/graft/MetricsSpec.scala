package graft

import graft.metrics.Metrics
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Classification-metric semantics against brute-force / hand-computed
  * ground truth. */
class MetricsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  /** Quantize like Metrics.rocAuc (Spark round = HALF_UP on the decimal). */
  private def q4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("rocAuc equals the brute-force pairwise probability (with ties)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // planted signal + deliberate ties: score quantized to a 0.05 grid
    val rows = (0 until 400).map { i =>
      val y = i % 3 == 0
      val s = math.rint(((if (y) 0.3 else 0.0) + rnd.nextGaussian()) * 20) / 20.0
      (y, s)
    }
    val df = rows.toDF("y", "s")
    val got = Metrics.rocAuc(df, col("y"), col("s")).head()
    val pos = rows.filter(_._1).map(r => q4(r._2))
    val neg = rows.filterNot(_._1).map(r => q4(r._2))
    val brute = pos.map(p => neg.map(n =>
      if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum).sum / (pos.size * neg.size)
    assert(got.getLong(0) == pos.size && got.getLong(1) == neg.size)
    assert(math.abs(got.getDouble(2) - brute) < 1e-6,
      s"auc ${got.getDouble(2)} vs brute $brute")
  }

  test("rocAuc is 1.0 on perfectly separated scores and 0.5 on a constant") {
    import spark.implicits._
    val sep = ((0 until 50).map(i => (true, 1.0 + i)) ++
      (0 until 50).map(i => (false, -1.0 - i))).toDF("y", "s")
    assert(Metrics.rocAuc(sep, col("y"), col("s")).head().getDouble(2) == 1.0)
    val const = ((0 until 50).map(_ => (true, 3.0)) ++
      (0 until 50).map(_ => (false, 3.0))).toDF("y", "s")
    assert(Metrics.rocAuc(const, col("y"), col("s")).head().getDouble(2) == 0.5)
  }

  test("classificationReport matches hand-computed P/R/F1, incl. a never-predicted class") {
    import spark.implicits._
    // truth: 4 a, 3 b, 2 c; pred: c never predicted
    val df = Seq(
      ("a", "a"), ("a", "a"), ("a", "b"), ("a", "b"),
      ("b", "b"), ("b", "b"), ("b", "a"),
      ("c", "a"), ("c", "b")).toDF("y", "p")
    val r = Metrics.classificationReport(df, col("y"), col("p"))
      .collect().map(x => x.getString(0) ->
        ((x.getLong(1), x.getDouble(2), x.getDouble(3), x.getDouble(4)))).toMap
    // a: tp=2 predn=4 support=4 → P=.5 R=.5 F1=.5
    assert(r("a") == ((4L, 0.5, 0.5, 0.5)), r.toString)
    // b: tp=2 predn=5 support=3 → P=.4 R=.6667 F1=2*2/8=.5
    assert(r("b") == ((3L, 0.4, 0.6667, 0.5)), r.toString)
    // c: tp=0 predn=0 support=2 → P=0 R=0 F1=0
    assert(r("c") == ((2L, 0.0, 0.0, 0.0)), r.toString)
  }

  test("confusionMatrix counts every (truth, pred) cell") {
    import spark.implicits._
    val df = Seq(("a", "a"), ("a", "b"), ("a", "b"), ("b", "b")).toDF("y", "p")
    val m = Metrics.confusionMatrix(df, col("y"), col("p"))
      .collect().map(x => (x.getString(0), x.getString(1)) -> x.getLong(2)).toMap
    assert(m == Map(("a", "a") -> 1L, ("a", "b") -> 2L, ("b", "b") -> 1L))
  }

  test("kFoldOLS: every fold's coefficients equal a direct fit on the complement") {
    import spark.implicits._
    import graft.linear.CrossVal
    val rnd = new scala.util.Random(5)
    val rows = (0 until 500).map { i =>
      val x = rnd.nextDouble() * 10
      (i.toLong, x, 2.5 * x + 1.0 + rnd.nextGaussian())
    }
    val df = rows.toDF("id", "x", "y")
    val k = 4
    val got = CrossVal.kFoldOLS(df, "x", col("y"), col("id"), k)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    // brute force: recompute fold ids through the same md5 path, fit directly
    val foldOf = df.select(col("id"), CrossVal.foldId(col("id"), k).as("f"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (f <- 0 until k) {
      val train = rows.filter(r => foldOf(r._1) != f)
      val n = train.size.toDouble
      val (sx, sy) = (train.map(_._2).sum, train.map(_._3).sum)
      val sxx = train.map(r => r._2 * r._2).sum
      val sxy = train.map(r => r._2 * r._3).sum
      val slope = (sxy - sx * sy / n) / (sxx - sx * sx / n)
      val icpt = sy / n - slope * sx / n
      val (nTrain, nVal, gotSlope, gotIcpt) = got(f.toLong)
      assert(nTrain == train.size && nVal == 500 - train.size)
      assert(math.abs(gotSlope - slope) < 1e-3, s"fold $f slope $gotSlope vs $slope")
      assert(math.abs(gotIcpt - icpt) < 1e-3, s"fold $f icpt $gotIcpt vs $icpt")
    }
  }

  test("vMeasure: perfect match → all 1; MI equals brute-force entropy sum") {
    import spark.implicits._
    val same = (0 until 60).map(i => (s"c${i % 3}", s"k${i % 3}")).toDF("a", "b")
    val r1 = Metrics.vMeasure(same, col("a"), col("b")).head()
    assert(r1.getDouble(0) == 1.0 && r1.getDouble(1) == 1.0 && r1.getDouble(2) == 1.0)
    // skewed contingency, brute-force check of every output
    val rows = Seq.fill(10)(("x", "u")) ++ Seq.fill(5)(("x", "v")) ++
      Seq.fill(7)(("y", "v")) ++ Seq.fill(3)(("y", "w"))
    val got = Metrics.vMeasure(rows.toDF("a", "b"), col("a"), col("b")).head()
    val n = rows.size.toDouble
    def entropy(counts: Seq[Int]) = -counts.map(c => c / n * math.log(c / n)).sum
    val hC = entropy(Seq(15, 10)); val hK = entropy(Seq(10, 12, 3))
    val joint = rows.groupBy(identity).map(_._2.size).toSeq
    val hCK = entropy(joint)
    val hCgK = hCK - hK; val hKgC = hCK - hC
    val (h, c) = (1 - hCgK / hC, 1 - hKgC / hK)
    assert(math.abs(got.getDouble(0) - h) < 1e-3, s"${got.getDouble(0)} vs $h")
    assert(math.abs(got.getDouble(1) - c) < 1e-3)
    assert(math.abs(got.getDouble(2) - 2 * h * c / (h + c)) < 1e-3)
    assert(math.abs(got.getDouble(3) - (hC + hK - hCK)) < 1e-5)
  }

  test("cohenKappa: perfect agreement → 1, marginal-independent noise → ~0") {
    import spark.implicits._
    val perfect = (0 until 90).map(i => (s"c${i % 3}", s"c${i % 3}")).toDF("y", "p")
    assert(Metrics.cohenKappa(perfect, col("y"), col("p")).head().getDouble(0) == 1.0)
    val rnd = new scala.util.Random(13)
    val noise = (0 until 3000).map(_ => (s"c${rnd.nextInt(3)}", s"c${rnd.nextInt(3)}"))
      .toDF("y", "p")
    val k = Metrics.cohenKappa(noise, col("y"), col("p")).head().getDouble(0)
    assert(math.abs(k) < 0.05, s"independent labels should give κ≈0, got $k")
    // hand-computed 2×2: agree 70/100, pe = (60*50 + 40*50)/10000 = 0.5 → κ = 0.4
    val hand = (Seq.fill(40)(("a", "a")) ++ Seq.fill(20)(("a", "b")) ++
      Seq.fill(10)(("b", "a")) ++ Seq.fill(30)(("b", "b"))).toDF("y", "p")
    assert(Metrics.cohenKappa(hand, col("y"), col("p")).head().getDouble(0) == 0.4)
  }

  test("KNN.classify recovers planted blob labels perfectly") {
    import spark.implicits._
    val rnd = new scala.util.Random(21)
    val centers = Seq(Seq(0.0, 0.0, 0.0), Seq(30.0, 0.0, 0.0), Seq(0.0, 30.0, 0.0))
    val pts = (0 until 300).map { i =>
      val cl = i % 3
      (i.toLong, centers(cl).map(v => (v + rnd.nextGaussian()).toFloat).toArray, cl)
    }.toDF("vec_id", "embedding", "label")
    val qs = pts.filter(col("vec_id") % 10 === 0)
    val train = pts.filter(col("vec_id") % 10 =!= 0)
    val pred = graft.neighbors.KNN.classify(qs, train, "vec_id", "vec_id",
      "embedding", "embedding", "label", k = 5, graft.neighbors.KNN.Euclidean)
    val joined = pred.join(pts.select(col("vec_id").as("qid"),
      col("label").cast("long").as("truth")), "qid")
    assert(joined.count() == 30)
    assert(joined.filter(col("pred") =!= col("truth")).count() == 0)
  }

  test("ridgeCV matches brute-force fold/lambda scores and flags exactly one winner") {
    import spark.implicits._
    import graft.linear.CrossVal
    val rnd = new scala.util.Random(41)
    val rows = (0 until 400).map { i =>
      val x = rnd.nextDouble() * 10
      (i.toLong, x, 1.8 * x - 2.0 + rnd.nextGaussian() * 2)
    }
    val df = rows.toDF("id", "x", "y")
    val k = 4; val lambdas = Seq(0.5, 50.0, 5000.0)
    val got = CrossVal.ridgeCV(df, "x", col("y"), col("id"), k, lambdas)
      .collect().map(r => r.getDouble(0) -> ((r.getDouble(1), r.getBoolean(2)))).toMap
    assert(got.values.count(_._2) == 1, "exactly one best")
    val foldOf = df.select(col("id"), CrossVal.foldId(col("id"), k).as("f"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (lam <- lambdas) {
      val foldMses = (0 until k).map { f =>
        val train = rows.filter(r => foldOf(r._1) != f)
        val va = rows.filter(r => foldOf(r._1) == f)
        val n = train.size.toDouble
        val (sx, sy) = (train.map(_._2).sum, train.map(_._3).sum)
        val sxx = train.map(r => r._2 * r._2).sum
        val sxy = train.map(r => r._2 * r._3).sum
        val slope = (sxy - sx * sy / n) / (sxx - sx * sx / n + lam)
        val icpt = sy / n - slope * sx / n
        va.map(r => math.pow(r._3 - (icpt + slope * r._2), 2)).sum / va.size
      }
      val want = foldMses.sum / k
      assert(math.abs(got(lam)._1 - want) < 1e-3, s"λ=$lam: ${got(lam)._1} vs $want")
    }
  }

  test("drift gates: planted shift trips KS and inflates PSI; identical halves stay quiet") {
    import spark.implicits._
    import graft.stats.Drift
    val rnd = new scala.util.Random(47)
    val same = (0 until 4000).map { i => (rnd.nextGaussian() * 10 + 100, i % 2 == 0) }
      .toDF("v", "ref")
    val ksSame = Drift.ksTest(same, col("v"), col("ref")).head()
    assert(!ksSame.getBoolean(4), s"no drift but d=${ksSame.getDouble(2)} crit=${ksSame.getDouble(3)}")
    val psiSame = Drift.psi(same, col("v"), col("ref"), bins = 10)
      .head().getDouble(6)
    assert(psiSame < 0.05, s"psi on identical halves: $psiSame")
    val shifted = (0 until 4000).map { i =>
      val ref = i % 2 == 0
      ((if (ref) 100.0 else 106.0) + rnd.nextGaussian() * 10, ref)
    }.toDF("v", "ref")
    val ksShift = Drift.ksTest(shifted, col("v"), col("ref")).head()
    assert(ksShift.getBoolean(4), s"planted shift not detected: d=${ksShift.getDouble(2)}")
    val psiShift = Drift.psi(shifted, col("v"), col("ref"), bins = 10)
      .head().getDouble(6)
    assert(psiShift > 0.1, s"psi on shifted halves: $psiShift")
  }

  test("psiApprox tracks the exact rank-select psi (sketch error bound)") {
    import spark.implicits._
    import graft.stats.Drift
    val rnd = new scala.util.Random(31)
    // planted moderate shift so both twins sit well off zero
    val df = (0 until 4000).map { i =>
      val ref = i % 2 == 0
      ((if (ref) 100.0 else 104.0) + rnd.nextGaussian() * 10, ref)
    }.toDF("v", "ref")
    val exact = Drift.psi(df, col("v"), col("ref"), bins = 10).head().getDouble(6)
    val approx = Drift.psiApprox(df, col("v"), col("ref"), bins = 10).head().getDouble(6)
    // at accuracy=10000 on 2000 reference rows the sketch is rank-exact
    // up to ties; the PSI totals must agree to well under the 0.1/0.25
    // industry alert thresholds
    assert(math.abs(approx - exact) < 0.02, s"approx=$approx exact=$exact")
    // and also on drift-free halves: both near zero
    val same = (0 until 4000).map { i => (rnd.nextGaussian() * 10 + 100, i % 2 == 0) }
      .toDF("v", "ref")
    val approxSame = Drift.psiApprox(same, col("v"), col("ref"), bins = 10)
      .head().getDouble(6)
    assert(approxSame < 0.05, s"psi_approx on identical halves: $approxSame")
  }

  test("simplified silhouette ≈ 1 on tight planted blobs, low on overlap") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val cents = Seq(Seq(0.0, 0.0), Seq(100.0, 0.0))
    val tight = (0 until 200).map { i =>
      val c = cents(i % 2)
      (c(0) + rnd.nextGaussian() * 0.1, c(1) + rnd.nextGaussian() * 0.1)
    }.toDF("x", "y")
    val silT = Metrics.silhouetteSimplified(tight, Seq(col("x"), col("y")), cents)
      .collect().map(_.getDouble(2))
    assert(silT.forall(_ > 0.98), silT.mkString(","))
    val overlap = (0 until 200).map { i =>
      val c = cents(i % 2)
      (c(0) + rnd.nextGaussian() * 80, c(1) + rnd.nextGaussian() * 80)
    }.toDF("x", "y")
    val silO = Metrics.silhouetteSimplified(overlap, Seq(col("x"), col("y")), cents)
      .collect().map(_.getDouble(2))
    assert(silO.forall(_ < 0.9), silO.mkString(","))
  }

  test("averagePrecision matches the brute-force threshold sweep (with ties)") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val rows = (0 until 300).map { i =>
      val y = i % 4 == 0
      val s = math.rint(((if (y) 0.4 else 0.0) + rnd.nextGaussian()) * 10) / 10.0
      (y, s)
    }
    val got = Metrics.averagePrecision(rows.toDF("y", "s"), col("y"), col("s")).head()
    // brute force over distinct thresholds descending
    val byScore = rows.groupBy(r => q4(r._2)).view
      .mapValues(g => (g.count(_._1).toDouble, g.count(!_._1).toDouble))
      .toSeq.sortBy(-_._1)
    val pTot = byScore.map(_._2._1).sum
    var (cumtp, cumpp, ap, bestF1) = (0.0, 0.0, 0.0, 0.0)
    byScore.foreach { case (_, (np, nn)) =>
      cumtp += np; cumpp += np + nn
      ap += np / pTot * (cumtp / cumpp)
      bestF1 = math.max(bestF1, 2.0 * cumtp / (cumpp + pTot))
    }
    assert(got.getLong(0) == pTot.toLong)
    assert(math.abs(got.getDouble(3) - ap) < 1e-5, s"ap ${got.getDouble(3)} vs $ap")
    assert(math.abs(got.getDouble(4) - bestF1) < 1e-5, s"f1 ${got.getDouble(4)} vs $bestF1")
  }

  test("averagePrecision is 1.0 on perfect separation") {
    import spark.implicits._
    val sep = ((0 until 40).map(i => (true, 10.0 + i)) ++
      (0 until 60).map(i => (false, -10.0 - i))).toDF("y", "s")
    val r = Metrics.averagePrecision(sep, col("y"), col("s")).head()
    assert(r.getDouble(3) == 1.0 && r.getDouble(4) == 1.0)
  }

  test("spearman matches brute-force midrank computation; monotone map → 1") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val rows = (0 until 500).map { _ =>
      val x = rnd.nextInt(20).toDouble
      (x, x * 2 + rnd.nextInt(10))
    }
    def midranks(vs: Seq[Double]): Map[Double, Double] = {
      val sorted = vs.sorted
      vs.distinct.map { v =>
        val below = sorted.count(_ < v).toDouble
        val eq = sorted.count(_ == v).toDouble
        v -> (below + (eq + 1.0) / 2.0)
      }.toMap
    }
    val rx = midranks(rows.map(_._1)); val ry = midranks(rows.map(_._2))
    val pairs = rows.map { case (x, y) => (rx(x), ry(y)) }
    val n = pairs.size.toDouble
    val (sx, sy) = (pairs.map(_._1).sum, pairs.map(_._2).sum)
    val sxy = pairs.map(p => p._1 * p._2).sum
    val sxx = pairs.map(p => p._1 * p._1).sum
    val syy = pairs.map(p => p._2 * p._2).sum
    val brute = (n * sxy - sx * sy) / math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    val got = Metrics.spearman(rows.toDF("x", "y"), col("x"), col("y")).head()
    assert(got.getLong(0) == 500L)
    assert(math.abs(got.getDouble(1) - brute) < 1e-5, s"${got.getDouble(1)} vs $brute")
    // strictly monotone transform of x has spearman exactly 1
    val mono = (1 to 100).map(i => (i.toDouble, math.exp(i / 10.0))).toDF("x", "y")
    assert(Metrics.spearman(mono, col("x"), col("y")).head().getDouble(1) == 1.0)
  }

  test("nmi: identical labelings → 1.0 under both normalizations; independent → ~0") {
    import spark.implicits._
    val same = (0 until 300).map(i => (s"c${i % 3}", s"k${i % 3}")).toDF("a", "b")
    val r1 = Metrics.nmi(same, col("a"), col("b")).head()
    assert(math.abs(r1.getDouble(1) - 1.0) < 1e-9 && math.abs(r1.getDouble(2) - 1.0) < 1e-9)
    // a ⊥ b by construction (balanced grid)
    val indep = (0 until 300).map(i => (s"c${i % 3}", s"k${(i / 3) % 5}")).toDF("a", "b")
    val r2 = Metrics.nmi(indep, col("a"), col("b")).head()
    assert(math.abs(r2.getDouble(1)) < 1e-6, r2.toString)
  }

  test("Yuen trimmed t matches textbook order-statistics trimming and shrugs off outliers") {
    import spark.implicits._
    // group A: 1..100; group B: 1..100 with ten 1e6 outliers appended —
    // identical 20%-trimmed cores, so Yuen must NOT reject while the
    // raw means differ wildly
    val a = (1 to 100).map(v => (v.toDouble, true))
    val bNorm = (1 to 100).map(v => (v.toDouble, false))
    val bOut = (1 to 10).map(_ => (1e6, false))
    val df = (a ++ bNorm ++ bOut).toDF("v", "isA")
    val r = graft.stats.Yuen.trimmedTest(df, col("v"), col("isA")).head()
    assert(r.getLong(r.fieldIndex("n_a")) == 100 && r.getLong(r.fieldIndex("n_b")) == 110)
    // textbook check, group A: n=100, g=20, trimmed mean of ranks 21..80
    val tmA = (21 to 80).map(_.toDouble).sum / 60.0
    assert(r.getDouble(r.fieldIndex("trim_mean_a")) == tmA, r.toString)
    // group B: g=22, kept ranks 23..88 of (1..100 + ten 1e6) = values 23..88
    val tmB = (23 to 88).map(_.toDouble).sum / 66.0
    assert(r.getDouble(r.fieldIndex("trim_mean_b")) == tmB, r.toString)
    assert(!r.getBoolean(r.fieldIndex("reject")), r.toString)
    assert(math.abs(r.getDouble(r.fieldIndex("t_yuen"))) < 1.96)
  }

  test("Yuen trimmed t: tiny groups (h <= 1) yield explicit nulls, not divide-by-zero") {
    import spark.implicits._
    // n = 2 at gamma 0.2 → g = 1 → trimmed count h = 0: the when(h > 0/1)
    // guards must surface NULL statistics (advice r13/verdict r14 #4)
    // rather than an exception or a spurious ±Infinity
    val df = Seq((1.0, true), (2.0, true), (10.0, false), (20.0, false),
      (30.0, false), (40.0, false), (50.0, false)).toDF("v", "isA")
    val r = graft.stats.Yuen.trimmedTest(df, col("v"), col("isA")).head()
    assert(r.getLong(r.fieldIndex("n_a")) == 2)
    assert(r.getLong(r.fieldIndex("g_a")) == 1)
    assert(r.isNullAt(r.fieldIndex("trim_mean_a")), "h=0 trimmed mean must be NULL")
    assert(r.isNullAt(r.fieldIndex("t_yuen")), "t with a degenerate side must be NULL")
    assert(r.isNullAt(r.fieldIndex("df")))
    // n = 3 → g = 1 → h = 1: the mean exists but the variance term must
    // be NULL (h·(h−1) = 0)
    val df3 = Seq((1.0, true), (2.0, true), (3.0, true), (10.0, false),
      (20.0, false), (30.0, false), (40.0, false), (50.0, false)).toDF("v", "isA")
    val r3 = graft.stats.Yuen.trimmedTest(df3, col("v"), col("isA")).head()
    assert(r3.getLong(r3.fieldIndex("n_a")) == 3)
    assert(r3.getDouble(r3.fieldIndex("trim_mean_a")) == 2.0, "h=1 keeps the median")
    assert(r3.isNullAt(r3.fieldIndex("t_yuen")), "h=1 variance term must be NULL")
  }

  test("Platt scaling recovers a planted sigmoid and descends the NLL") {
    import spark.implicits._
    // y drawn by md5-uniform threshold at P(y=1|f) = 1/(1+exp(2f+1)):
    // Newton must recover (a, b) ≈ (2, 1) (smoothed targets shrink the
    // fit slightly toward the prior; 0.15 absolute covers n=4000)
    val rows = (0 until 4000).map { i =>
      val f = (i % 81 - 40) / 10.0 // f ∈ [−4, 4]
      val h = java.lang.Long.parseLong(
        java.security.MessageDigest.getInstance("MD5")
          .digest(s"platt_$i".getBytes("UTF-8"))
          .take(8).map(b => f"$b%02x").mkString.take(15), 16)
      val u = (h % 1000000L + 1000000L) % 1000000L / 1000000.0
      (f, u < 1.0 / (1.0 + math.exp(2.0 * f + 1.0)))
    }.toDF("f", "y")
    val steps = graft.stats.Platt.fit(rows, col("f"), col("y"), iters = 8)
      .orderBy("iter").collect()
    val last = steps.last
    assert(math.abs(last.getDouble(last.fieldIndex("a")) - 2.0) < 0.15, last.toString)
    assert(math.abs(last.getDouble(last.fieldIndex("b")) - 1.0) < 0.15, last.toString)
    // the recorded NLL (pre-update per step) must descend overall
    val nlls = steps.map(r => r.getDouble(r.fieldIndex("avg_nll")))
    assert(nlls.last < nlls.head, nlls.mkString(", "))
  }
}
