package graft

import scala.util.Random

import graft.functions.VectorOps

/** Property-style pinning of the cosine semantics (SURVEY §5.2 item 3) —
  * deterministic seeded sampling (no scalatestplus bridge in the offline
  * dependency cache, so the loop is hand-rolled).
  */
class CosinePropsSpec extends SparkSpec {

  private def vec(rnd: Random): Array[Float] = {
    val n = 2 + rnd.nextInt(15)
    Array.fill(n)((rnd.nextFloat() - 0.5f) * 200f)
  }

  private def cases(n: Int): Seq[Random] = (1 to n).map(i => new Random(i * 7919))

  test("cosine is symmetric") {
    cases(200).foreach { rnd =>
      val a = vec(rnd); val b = a.map(x => x + rnd.nextFloat())
      assert(math.abs(VectorOps.cosine(a, b) - VectorOps.cosine(b, a)) < 1e-12)
    }
  }

  test("cosine is invariant under positive scaling") {
    cases(200).foreach { rnd =>
      val a = vec(rnd)
      val b = a.map(x => x * 2f + 1f)
      val k = 0.1f + rnd.nextFloat() * 50f
      assert(math.abs(VectorOps.cosine(a, b) - VectorOps.cosine(a, b.map(_ * k))) < 1e-6)
    }
  }

  test("cosine is bounded in [-1, 1] (within float tolerance)") {
    cases(500).foreach { rnd =>
      val a = vec(rnd); val b = vec(new Random(rnd.nextInt()))
      if (a.length == b.length) {
        val c = VectorOps.cosine(a, b)
        assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9)
      }
      val c2 = VectorOps.cosine(a, a.reverse)
      assert(c2 >= -1.0 - 1e-9 && c2 <= 1.0 + 1e-9)
    }
  }

  test("cosine(v, v) = 1 for nonzero v; zero-norm pairs → 0.0 exactly") {
    cases(200).foreach { rnd =>
      val a = vec(rnd)
      if (a.exists(_ != 0f)) assert(math.abs(VectorOps.cosine(a, a) - 1.0) < 1e-9)
      val zeros = Array.fill(a.length)(0f)
      assert(VectorOps.cosine(a, zeros) == 0.0) // vectolite.py:159-162
      assert(VectorOps.cosine(zeros, zeros) == 0.0)
    }
  }

  test("top-k of k is a prefix of top-(k+1) (ranking consistency)") {
    val scored = (1 to 50).map(i => (i.toLong, VectorOps.cosine(
      Array(i.toFloat, 1f, 2f), Array(1f, 2f, 3f))))
    def topk(k: Int) = scored.sortBy { case (id, s) => (-s, id) }.take(k).map(_._1)
    (1 until 10).foreach(k => assert(topk(k) == topk(k + 1).take(k)))
  }
}
