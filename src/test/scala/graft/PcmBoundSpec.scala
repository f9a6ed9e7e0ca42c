package graft
import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.Mp3
class PcmBoundSpec extends AnyFunSuite {
  // the gate oracle hardcodes pcm_ok = TRUE, so the Spark-side bound must
  // hold for EVERY possible document byte pattern — this spec measures the
  // adversarial envelope (all-ones pattern: 423) under the 1000 guard
  test("pcm bound over adversarial gate frames") {
    def mk(byte: Int): Array[Int] = Array.tabulate(576) { l =>
      val bit = (byte >> (7 - (l & 7))) & 1
      if (bit == 0) 0 else if (l % 2 == 1) -1 else 1
    }
    val pats = Seq(0xFF, 0xAA, 0x55, 0x0F, 0xF0, 0xC3, 0x81, 0x7E)
    val maxes = pats.map { p =>
      val d = Mp3.decode(Mp3.encodeScaled(mk(p))).get
      d.pcm.map(math.abs).max
    }
    // also 200 random byte patterns
    val rnd = new scala.util.Random(99)
    val rmax = (1 to 200).map { _ =>
      val raw = Array.fill(72)(rnd.nextInt(256))
      val lines = Array.tabulate(576) { l =>
        val bit = (raw(l >> 3) >> (7 - (l & 7))) & 1
        if (bit == 0) 0 else if (l % 2 == 1) -1 else 1
      }
      Mp3.decode(Mp3.encodeScaled(lines)).get.pcm.map(math.abs).max
    }.max
    info(s"pattern maxes: ${maxes.map(m => f"$m%.1f").mkString(", ")}; random max: $rmax%.1f")
    assert((maxes :+ rmax).max <= 1000.0,
      "gate pcm bound (Multimodal.mp3DecodeSummary) would misfire")
  }
}
