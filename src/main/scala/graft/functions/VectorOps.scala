package graft.functions

import org.apache.spark.sql.catalyst.util.ArrayData

/** Tight loops shared by interpreted eval, codegen, and plain-Scala callers.
  *
  * Semantics mirror the reference's cosine (`/root/reference/vectolite.py:155-166`):
  * `dot(a,b) / (||a||*||b||)` with the exact zero-norm-product → 0.0 guard.
  * Math is performed in double precision over float32 inputs with a fixed
  * sequential reduction order, so results are deterministic regardless of
  * partitioning (SURVEY §7.4). A null array element reads as 0.0 on every
  * path (codegen ArrayData, boxed UDF, plain arrays can't hold nulls).
  */
object VectorOps {

  /** Cosine over two Catalyst float arrays — called from codegen'd code,
    * so it must stay a simple public method on a singleton.
    */
  def cosineF(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    require(n == b.numElements(),
      s"cosine_sim: dimension mismatch ${n} vs ${b.numElements()}")
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = if (a.isNullAt(i)) 0.0 else a.getFloat(i).toDouble
      val y = if (b.isNullAt(i)) 0.0 else b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    val normProduct = math.sqrt(na) * math.sqrt(nb)
    if (normProduct == 0.0) 0.0 else dot / normProduct  // zero-norm guard, vectolite.py:159-162
  }

  /** Dot product over two Catalyst float arrays (codegen-callable). */
  def dotF(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    require(n == b.numElements(),
      s"dot: dimension mismatch ${n} vs ${b.numElements()}")
    var dot = 0.0
    var i = 0
    while (i < n) {
      val x = if (a.isNullAt(i)) 0.0 else a.getFloat(i).toDouble
      val y = if (b.isNullAt(i)) 0.0 else b.getFloat(i).toDouble
      dot += x * y
      i += 1
    }
    dot
  }

  /** L2 norm of a Catalyst float array (codegen-callable). */
  def normF(a: ArrayData): Double = {
    var s = 0.0
    var i = 0
    val n = a.numElements()
    while (i < n) {
      val x = if (a.isNullAt(i)) 0.0 else a.getFloat(i).toDouble
      s += x * x; i += 1
    }
    math.sqrt(s)
  }

  /** Cosine of BYTE-PACKED int8 codes against a float query (round-15:
    * the packed quantized-index hot path). `codes` is one signed byte
    * per component — the true 4×-smaller storage of the int8 scheme
    * (an `array<int>` column stores 4-byte elements; parquet BINARY
    * stores the vector as dim bytes). Cosine is invariant under the
    * vector's positive dequantization scale, so scoring raw codes ranks
    * identically to scoring the reconstruction — no scale read, no
    * dequantize arithmetic. Same double-precision sequential reduction
    * and zero-norm guard as [[cosineF]]. Codegen-callable.
    */
  def cosineI8(codes: Array[Byte], q: ArrayData): Double = {
    val n = codes.length
    require(n == q.numElements(),
      s"cosine_sim_i8: dimension mismatch ${n} vs ${q.numElements()}")
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = codes(i).toDouble
      val y = if (q.isNullAt(i)) 0.0 else q.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    val normProduct = math.sqrt(na) * math.sqrt(nb)
    if (normProduct == 0.0) 0.0 else dot / normProduct
  }

  /** [[cosineI8]] over a boxed query seq (UDF fallback path). */
  def cosineI8Boxed(codes: Array[Byte], q: Seq[java.lang.Float]): Double = {
    val qi = q.toIndexedSeq
    val n = codes.length
    require(n == qi.length, s"cosine_sim_i8: dimension mismatch $n vs ${qi.length}")
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = codes(i).toDouble
      val y = if (qi(i) == null) 0.0 else qi(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    val normProduct = math.sqrt(na) * math.sqrt(nb)
    if (normProduct == 0.0) 0.0 else dot / normProduct
  }

  /** Cosine over boxed seqs (UDF fallback path — mirrors [[cosineF]]'s
    * null-element-is-zero contract).
    */
  def cosineBoxed(a: Seq[java.lang.Float], b: Seq[java.lang.Float]): Double = {
    val ai = a.toIndexedSeq; val bi = b.toIndexedSeq
    val n = ai.length
    require(n == bi.length, s"cosine_sim: dimension mismatch $n vs ${bi.length}")
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xe = ai(i); val ye = bi(i)
      val x = if (xe == null) 0.0 else xe.toDouble
      val y = if (ye == null) 0.0 else ye.toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    val np = math.sqrt(na) * math.sqrt(nb)
    if (np == 0.0) 0.0 else dot / np
  }

  /** Dot product over boxed seqs (UDF fallback path). */
  def dotBoxed(a: Seq[java.lang.Float], b: Seq[java.lang.Float]): Double = {
    val ai = a.toIndexedSeq; val bi = b.toIndexedSeq
    require(ai.length == bi.length, "dot: dimension mismatch")
    var d = 0.0; var i = 0
    while (i < ai.length) {
      val xe = ai(i); val ye = bi(i)
      d += (if (xe == null) 0.0 else xe.toDouble) * (if (ye == null) 0.0 else ye.toDouble)
      i += 1
    }
    d
  }

  /** L2 norm over a boxed seq (UDF fallback path). */
  def normBoxed(a: Seq[java.lang.Float]): Double = {
    val ai = a.toIndexedSeq
    var s = 0.0; var i = 0
    while (i < ai.length) {
      val xe = ai(i)
      val x = if (xe == null) 0.0 else xe.toDouble
      s += x * x; i += 1
    }
    math.sqrt(s)
  }

  /** Plain-Scala cosine for driver-side / test use. */
  def cosine(a: Array[Float], b: Array[Float]): Double = {
    require(a.length == b.length, "cosine: dimension mismatch")
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    val np = math.sqrt(na) * math.sqrt(nb)
    if (np == 0.0) 0.0 else dot / np
  }

  /** In-place L2 normalization; zero vectors stay zero (matches the
    * reference's "score 0 for zero norms" posture).
    */
  def l2Normalize(v: Array[Float]): Array[Float] = {
    var s = 0.0
    var i = 0
    while (i < v.length) { s += v(i).toDouble * v(i).toDouble; i += 1 }
    val n = math.sqrt(s)
    if (n > 0) { i = 0; while (i < v.length) { v(i) = (v(i) / n).toFloat; i += 1 } }
    v
  }
}
