package graft.tools
object SmoProfMain {
  def main(args: Array[String]): Unit = {
    val rnd = new scala.util.Random(42)
    val n = 200; val p = 7
    val x = Array.fill(n)(Array.fill(p)(rnd.nextGaussian()))
    val y = Array.fill(n)(if (rnd.nextBoolean()) 1.0 else -1.0)
    graft.svm.SMO.fit(x, y, 1.0, 0.5, 1e-3)
    val t0 = System.nanoTime()
    val m = graft.svm.SMO.fit(x, y, 1.0, 0.5, 1e-3)
    println(f"SMO.fit: ${(System.nanoTime()-t0)/1e6}%.1f ms, nSv=${m.nSupport}, kkt=${m.maxKktViolation}%.4f")
    val t1 = System.nanoTime()
    val obj = m.dualObjective
    println(f"dualObjective: ${(System.nanoTime()-t1)/1e6}%.1f ms ($obj%.3f)")
    val t2 = System.nanoTime()
    val v = m.maxKktViolation
    println(f"maxKktViolation: ${(System.nanoTime()-t2)/1e6}%.1f ms ($v%.5f)")
  }
}
