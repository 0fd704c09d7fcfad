package graft

import java.awt.image.BufferedImage

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** Round-13: the REAL multimodal decode path (VERDICT r12 stretch #7).
  * The JDK's ImageIO decodes PNG/BMP/GIF/JPEG with zero native deps, so
  * decode → feature → resize is driven on REAL pixels here — generated
  * in-test (BufferedImage → PNG bytes), decoded back, and checked against
  * closed-form pixel math. The fake/stub path stays the fallback for
  * unrecognized payloads and its digest rows stay byte-identical
  * (OperatorsSpec pins those).
  */
class MultimodalImageSpec extends SparkSpec {
  import spark.implicits._

  /** PNG bytes of a w×h image colored by (x, y) ⇒ RGB. */
  private def png(w: Int, h: Int)(color: (Int, Int) => Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, color(x, y))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private val Black = 0x000000
  private val White = 0xffffff

  test("decodeImage: PNG roundtrip preserves dimensions and pixels; non-images decode to None") {
    val bytes = png(8, 6)((x, _) => if (x < 4) Black else White)
    val img = Multimodal.decodeImage(bytes).getOrElse(fail("PNG did not decode"))
    assert(img.getWidth == 8 && img.getHeight == 6)
    assert((img.getRGB(0, 0) & 0xffffff) == Black)
    assert((img.getRGB(7, 5) & 0xffffff) == White)
    assert(Multimodal.decodeImage("not an image".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.decodeImage(Array.emptyByteArray).isEmpty)
    assert(Multimodal.decodeImage(null).isEmpty)
  }

  test("imageFeatures: luminance histogram matches closed-form pixel math") {
    // 24 black pixels (luma 0 → bucket 0) + 24 white (luma 255 → bucket
    // 15 of 16): normalized histogram is 1/√2 at both ends, 0 elsewhere
    val bytes = png(8, 6)((x, _) => if (x < 4) Black else White)
    val feats = Multimodal.decodeFeaturesReal(bytes, 16)
    val inv = (1.0 / math.sqrt(2.0)).toFloat
    assert(math.abs(feats(0) - inv) < 1e-6f && math.abs(feats(15) - inv) < 1e-6f,
      s"end buckets: ${feats(0)}, ${feats(15)}")
    assert((1 to 14).forall(feats(_) == 0f), s"interior buckets not empty: ${feats.toSeq}")
  }

  test("decodeFeaturesReal dispatch: images take the pixel path, other payloads the stub") {
    val imgBytes = png(4, 4)((_, _) => White)
    val txtBytes = "plain text payload, definitely not a PNG".getBytes("UTF-8")
    assert(Multimodal.decodeFeaturesReal(imgBytes, 16).toSeq !=
      Multimodal.fakeDecodeFeatures(imgBytes, 16).toSeq,
      "image payload fell through to the stub")
    assert(Multimodal.decodeFeaturesReal(txtBytes, 16).toSeq ==
      Multimodal.fakeDecodeFeatures(txtBytes, 16).toSeq,
      "non-image payload did not use the stub fallback")
  }

  test("resizeImageBytes: real bilinear resize — target dims, solid color preserved, lossless re-encode") {
    val solidRed = png(8, 8)((_, _) => 0xff0000)
    val resized = Multimodal.resizeImageBytes(solidRed, 4, 4)
    val img = Multimodal.decodeImage(resized).getOrElse(fail("resized PNG did not decode"))
    assert(img.getWidth == 4 && img.getHeight == 4)
    for (y <- 0 until 4; x <- 0 until 4)
      assert((img.getRGB(x, y) & 0xffffff) == 0xff0000,
        f"pixel ($x,$y) = ${img.getRGB(x, y) & 0xffffff}%06x after solid-color resize")
    // non-image payload: deterministic stride sampler caps at the budget
    val txt = ("x" * 100).getBytes("UTF-8")
    assert(Multimodal.resizeImageBytes(txt, 4, 4).length == 16)
    val short = "tiny".getBytes("UTF-8")
    assert(Multimodal.resizeImageBytes(short, 4, 4).toSeq == short.toSeq,
      "within-budget non-image payload must pass through unchanged")
  }

  test("decodeImagesPartitioned: distributed mixed-media decode matches the scalar calls") {
    val imgBytes = png(8, 6)((x, _) => if (x < 4) Black else White)
    val txtBytes = "row two is text".getBytes("UTF-8")
    val df = Seq((1L, imgBytes), (2L, txtBytes)).toDF("id", "asset_bytes")
      .repartition(2)
    val got = Multimodal.decodeImagesPartitioned(df, "id", "asset_bytes", dim = 16)
      .select(col("id"), col("is_image"), col("features"))
      .as[(Long, Boolean, Seq[Float])].collect().sortBy(_._1)
    assert(got.map(r => (r._1, r._2)).toSeq == Seq((1L, true), (2L, false)))
    assert(got(0)._3 == Multimodal.decodeFeaturesReal(imgBytes, 16).toSeq)
    assert(got(1)._3 == Multimodal.fakeDecodeFeatures(txtBytes, 16).toSeq)
  }
}
