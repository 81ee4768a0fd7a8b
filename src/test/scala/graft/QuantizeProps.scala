package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** The arithmetic law behind the scalar-quantized search paths
  * (v9/v10): symmetric int8 codes q_i = floor(x_i·127/amax + 0.5)
  * must stay inside [-127, 127] and reconstruct each coordinate to
  * within amax/254 (half a quantization step). That bound is what
  * justifies a bounded rerank pool — stage-1 ranking error per
  * coordinate is capped, so the true top-k lives inside a modest
  * rerankK with high probability. Checked as a pure property over
  * arbitrary vectors; the Spark-side plumbing of the same formula is
  * cell-level oracle-checked by v9/v10.
  */
object QuantizeProps extends Properties("Quantize") {

  private val genVec: Gen[List[Double]] =
    Gen.nonEmptyListOf(Gen.chooseNum(-1000.0, 1000.0))
      .suchThat(_.exists(x => math.abs(x) > 1e-9))

  property("int8 codes are in range and reconstruct within amax/254") =
    forAll(genVec) { xs =>
      val amax = xs.map(math.abs).max
      xs.forall { x =>
        val q = math.floor(x * 127.0 / amax + 0.5)
        q >= -127 && q <= 127 &&
          math.abs(q * amax / 127.0 - x) <= amax / 254.0 + 1e-9 * amax
      }
    }
}
