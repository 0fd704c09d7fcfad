package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Symmetric per-vector int8 embedding quantization — the storage-side
  * companion of the ANN family: a 100 TB embedding corpus is 4× smaller
  * (and its scans 4× cheaper) stored as `array<tinyint>` + one float
  * scale per vector, at a bounded reconstruction cost the spec pins
  * (per-element error ≤ scale/2 = max|x|/254; cosine against the
  * reconstruction stays ≳0.99 at the fixtures' dim-64 geometry).
  *
  * Everything is higher-order-function column arithmetic
  * (`transform`/`aggregate`/`array_max`) — native Catalyst expressions,
  * no UDF, so the quantization pass composes with pruned scans and the
  * whole pipeline stays declarative. The scheme is the standard
  * symmetric one (e.g. FAISS `ScalarQuantizer` QT_8bit_direct /
  * ONNX-style symmetric int8): q_i = round(x_i · 127 / max|x|),
  * dequant x̂_i = q_i · scale with scale = max|x| / 127.
  *
  * Determinism: round is `floor(v + 0.5)` (half-up) in DOUBLE math over
  * the float32 inputs — bit-reproducible across engines, which is what
  * lets the `embed_quantize` row hash-check against a DuckDB twin.
  * A zero vector has scale 0 and quantizes to all zeros (the guard
  * mirrors the cosine zero-norm discipline).
  */
object Quantize {

  /** Per-vector scale: max|x| / 127 (0.0 for a zero vector). */
  def scaleOf(emb: Column): Column =
    array_max(transform(emb, x => abs(x.cast("double")))) / lit(127d)

  /** Round-half-up in double math — the one rounding both Spark and
    * DuckDB express identically (`FLOOR(v + 0.5)`).
    */
  private def halfUp(v: Column): Column = floor(v + lit(0.5d))

  /** Quantize against a precomputed [[scaleOf]] column: array<int> in
    * [-127, 127] (no clamp needed — |x|/scale ≤ 127 by construction).
    */
  def quantize(emb: Column, scale: Column): Column =
    transform(emb, x =>
      when(scale === 0d, lit(0L)).otherwise(halfUp(x.cast("double") / scale))
        .cast("int"))

  /** Reconstruct float32 from (quantized, scale). */
  def dequantize(quant: Column, scale: Column): Column =
    transform(quant, q => (q.cast("double") * scale).cast("float"))

  /** BYTE-PACK the quantized codes: BINARY of exactly dim bytes — the
    * true 4×-smaller storage (an `array<int>` column stores each code as
    * 4 bytes; parquet BINARY stores the whole vector as dim bytes).
    * Same half-up rounding as [[quantize]] in the same double math, so
    * the packed codes are bit-identical to the array form's values —
    * `cosine_sim_i8` over them ranks exactly like cosine over the array
    * form (scale-invariance). A UDF is fine here: packing runs ONCE at
    * index build/append (offline); the PROBE side reads the bytes
    * through the codegen [[graft.functions.VectorFunctions.cosine_sim_i8]].
    */
  def packI8(emb: Column, scale: Column): Column = packI8Udf(emb, scale)

  private val packI8Udf =
    org.apache.spark.sql.functions.udf { (v: Seq[Float], scale: Double) =>
      if (v == null) null
      else {
        val out = new Array[Byte](v.length)
        var i = 0
        while (i < v.length) {
          out(i) =
            if (scale == 0d) 0
            else math.floor(v(i).toDouble / scale + 0.5d).toInt.toByte
          i += 1
        }
        out
      }
    }

  /** L2 norm of the quantized code vector, ‖c‖ (0.0 for a zero vector)
    * — persisted alongside packed codes so probes can turn the
    * quantization-error THEOREM into a per-row prescreen bound without
    * touching the bytes twice. The theorem (QuantizeSpec property-checks
    * it across dims 2…1024 and distributions, including adversarial
    * one-spike vectors): for nonzero x with codes c (half-up rounding,
    * scale s = max|x|/127) and ANY query y,
    *
    *   |cos(c, y) − cos(x, y)| ≤ √d / ‖c‖.
    *
    * Proof sketch: x̂ = s·c is parallel to c, so cos(c,y) = cos(x̂,y);
    * half-up gives ‖x̂ − x‖ ≤ s√d/2 elementwise, and ‖x̂‖ = s‖c‖; the
    * unit-normalization perturbation lemma ‖a/‖a‖ − b/‖b‖‖ ≤
    * 2‖a−b‖/max(‖a‖,‖b‖) then bounds the unit-vector drift by
    * 2(s√d/2)/(s‖c‖) = √d/‖c‖, and a dot with the unit query moves by
    * at most that. Dense vectors have ‖c‖ ≈ 127√(d/3), so the bound
    * sits near √3/127 ≈ 0.014 INDEPENDENT of dim; a one-spike vector
    * degrades it to √d/127 — exactly the shape quantization genuinely
    * hurts, and the per-row bound widens the prescreen there instead of
    * silently dropping matches.
    */
  def codeNorm(emb: Column, scale: Column): Column =
    when(scale === 0d, lit(0d)).otherwise(
      sqrt(aggregate(emb, lit(0d), (acc, x) =>
        acc + halfUp(x.cast("double") / scale) * halfUp(x.cast("double") / scale))))

  /** The per-row prescreen bound √d/‖c‖ of [[codeNorm]]'s theorem (0.0
    * for a zero-vector row, whose cosine is exactly 0 in both forms).
    */
  def cosineErrorBound(dim: Column, codeNorm: Column): Column =
    when(codeNorm === 0d, lit(0d))
      .otherwise(sqrt(dim.cast("double")) / codeNorm)

  /** Exact integer checksum of the quantized vector (Σ q_i) — the
    * hash-checkable signature the declared row emits: any change to the
    * rounding, the scale, or a single element moves it.
    */
  def quantSum(emb: Column, scale: Column): Column =
    when(scale === 0d, lit(0L)).otherwise(
      aggregate(emb, lit(0L),
        (acc, x) => acc + halfUp(x.cast("double") / scale).cast("long")))

  /** Max per-element reconstruction error |x − q·scale| (0 for a zero
    * vector). Bounded by scale/2 by construction of half-up rounding.
    */
  def maxReconstructionError(emb: Column, scale: Column): Column =
    when(scale === 0d, lit(0d)).otherwise(
      array_max(transform(emb, x =>
        abs(x.cast("double") - halfUp(x.cast("double") / scale) * scale))))
}
