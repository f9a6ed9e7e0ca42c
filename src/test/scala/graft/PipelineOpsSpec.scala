package graft

import graft.text.TextOps
import org.scalatest.funsuite.AnyFunSuite
import scala.math.abs

/** Gopher-style repetition/filter metrics and domain-mixing weights. */
class PipelineOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("repetition metrics: looped phrase scores high, distinct text scores 0") {
    import spark.implicits._
    val loop = Seq.fill(10)("the cat sat").mkString(" ")        // heavy repeats
    val fresh = (1 to 30).map(i => s"w$i").mkString(" ")        // all distinct
    val df = Seq((1L, loop), (2L, fresh)).toDF("doc_id", "text")
    val r = TextOps.repetitionFeatures(df, "text", "doc_id")
      .collect().map(x => x.getLong(0) -> (x.getDouble(1), x.getDouble(2))).toMap
    // "the cat sat the ..." over 30 tokens: every 3-gram recurs -> dup3 = 1.0
    assert(r(1L)._2 == 1.0, s"loop dup3 ${r(1L)._2}")
    assert(r(1L)._1 > 0.3, s"loop top2 ${r(1L)._1}")
    assert(r(2L) == (0.0345, 0.0), s"fresh ${r(2L)}")  // top2 = 1/29 grams
  }

  test("gopher filters: each planted violation fails exactly its rule") {
    import spark.implicits._
    val ok = (1 to 20).map(i => s"tok$i").mkString(" ")
    val tooShort = "just three words"
    val numeric = ((1 to 12).map(_.toString) :+ "word").mkString(" ")   // 12/13 numeric
    val repeat = Seq.fill(25)("same").mkString(" ")                     // uniq ratio 1/25
    val df = Seq((1L, ok), (2L, tooShort), (3L, numeric), (4L, repeat))
      .toDF("doc_id", "text")
    val r = TextOps.gopherFilters(df, "text", "doc_id").head()
    assert(r.getLong(0) == 4)                 // n_docs
    assert(r.getLong(1) == 1, "word count")   // tooShort
    assert(r.getLong(3) == 1, "numeric")      // numeric
    assert(r.getLong(4) == 1, "uniq ratio")   // repeat
    assert(r.getLong(5) == 1, "keepers")      // only `ok`
  }

  test("mix weights: feasible max total and per-domain rates") {
    import spark.implicits._
    // en:100, de:50, zh:10 with targets 0.5/0.4/0.1 -> M = min(200, 125, 100) = 100
    val df = (Seq.fill(100)("en") ++ Seq.fill(50)("de") ++ Seq.fill(10)("zh"))
      .zipWithIndex.map { case (l, i) => (i.toLong, l) }.toDF("doc_id", "lang")
    val r = TextOps.mixWeights(df, "lang", Seq("de" -> 0.4, "en" -> 0.5, "zh" -> 0.1))
      .collect().map(x => x.getString(0) -> (x.getLong(1), x.getLong(3), x.getDouble(4))).toMap
    assert(r("en") == ((100L, 50L, 0.5)), r("en").toString)
    assert(r("de") == ((50L, 40L, 0.8)), r("de").toString)
    assert(r("zh") == ((10L, 10L, 1.0)), r("zh").toString)
  }
}
