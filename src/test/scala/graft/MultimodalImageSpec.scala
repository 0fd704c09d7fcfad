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

  test("dHash + banding near-dup: recall floor vs exact pixel distance; banding complete on real images (r18)") {
    import graft.operators.Dedup
    // 12 distinct block-noise patterns (4×4 blocks of seeded noise — no
    // cross-seed gradient-sign correlation, unlike smooth sin fields,
    // where phase-shifted patterns share every gradient SIGN and
    // legitimately collide under a gradient hash); each gets a
    // near-copy (+6 uniform brightness, clip-free by construction —
    // every BYTE of the re-encoded PNG changes, the exact near-dup the
    // sha family can never see)
    def pattern(seed: Int, delta: Int): Array[Byte] = png(32, 32) { (x, y) =>
      val h = scala.util.hashing.MurmurHash3.productHash((seed, x >> 2, y >> 2))
      val v = math.max(0, math.min(255, math.floorMod(h, 200) + 28 + delta))
      (v << 16) | (v << 8) | v
    }
    val images = ((0 until 12).map(s => (s.toLong, pattern(s, 0))) ++
      (0 until 12).map(s => ((s + 100).toLong, pattern(s, 6)))).toMap
    assert(images.values.toSeq.distinct.size == 24, "payloads must all be byte-distinct")

    val found = Dedup.imageNearDupPairs(
        images.toSeq.toDF("id", "bytes"), "id", "bytes", maxHamming = 10)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet

    // (a) banding COMPLETENESS on real pixels: the banded pair set must
    // equal the brute-force hamming filter over the same signatures
    // NOTE .toSeq: a for-comprehension over a Map builds a Map and
    // silently collapses the pairs per left key
    val sigs = images.toSeq.map { case (id, b) => id -> Multimodal.dHash64(b) }
    val brute = (for {
      (a, sa) <- sigs; (b, sb) <- sigs if a < b
      if java.lang.Long.bitCount(sa ^ sb) <= 10
    } yield (a, b)).toSet
    assert(found == brute, s"banded $found vs brute-force $brute")

    // (b) RECALL floor vs exact pixel distance: ground truth = pairs with
    // mean |pixel luma delta| below 16 (the planted copies sit ~6, the
    // cross-pattern pairs far above)
    def lumas(b: Array[Byte]): Array[Int] = {
      val img = Multimodal.decodeImage(b).get
      (for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) yield {
        val rgb = img.getRGB(x, y)
        (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 + (rgb & 0xff) * 114) / 1000
      }).toArray
    }
    val lum = images.map { case (id, b) => id -> lumas(b) }
    def meanDiff(a: Long, b: Long): Double = {
      val (la, lb) = (lum(a), lum(b))
      la.indices.map(i => math.abs(la(i) - lb(i))).sum.toDouble / la.length
    }
    val truth = (for {
      a <- images.keys; b <- images.keys if a < b && meanDiff(a, b) < 16.0
    } yield (a, b)).toSet
    assert(truth.size >= 12, s"ground truth lost the planted copies: $truth")
    val recall = found.intersect(truth).size.toDouble / truth.size
    assert(recall >= 0.9, s"recall $recall over ${truth.size} true pairs; found $found")
    // (c) no hallucinated pair joins two genuinely different patterns
    found.foreach { case (a, b) =>
      assert(meanDiff(a, b) < 40.0,
        s"pair ($a,$b) at mean pixel distance ${meanDiff(a, b)} — hash matched unrelated images")
    }

    // (d) pairs → groups → survivor through the SHARED dedup machinery:
    // every near-copy drops, every min-id base survives
    val df = images.toSeq.toDF("id", "bytes")
    val survivors = Dedup.dedupNear(df, "id",
        Dedup.imageNearDupPairs(df, "id", "bytes", maxHamming = 10))
      .select("id").as[Long].collect().toSet
    assert(survivors == (0L until 12L).toSet, s"survivors: $survivors")
  }

  test("incremental image dedup: within-batch twin drops, indexed near-copy drops, append closes the loop (r18)") {
    import graft.operators.Dedup
    def pattern(seed: Int, delta: Int): Array[Byte] = png(32, 32) { (x, y) =>
      val h = scala.util.hashing.MurmurHash3.productHash((seed, x >> 2, y >> 2))
      val v = math.max(0, math.min(255, math.floorMod(h, 200) + 28 + delta))
      (v << 16) | (v << 8) | v
    }
    val idxPath = graft.core.SessionCache.newTempDir("spec-mmdedup") + "/idx"
    Dedup.buildDHashIndex(
      (0 until 4).map(s => (s.toLong, pattern(s, 0))).toDF("id", "bytes"),
      "id", "bytes", idxPath)
    // batch: re-encoded copy of indexed #1 (drops via the index), novel
    // #7 (survives), brightness-shifted twin of #7 (within-batch pair —
    // min-id keeps 51, drops 52)
    val batch = Seq(
      (50L, pattern(1, 6)), (51L, pattern(7, 0)), (52L, pattern(7, 6))
    ).toDF("id", "bytes")
    val survivors = Dedup.imageNearDupIncremental(batch, "id", "bytes",
        Dedup.readDHashIndex(spark, idxPath), maxHamming = 10)
      .localCheckpoint() // consumed twice: assertion + the append below
    assert(survivors.select("id").as[Long].collect().toSet == Set(51L),
      s"survivors: ${survivors.collect().toSeq}")
    // append the survivors' signatures: the NEXT drop's copy of #7 now
    // gates against them — the closed daily loop
    Dedup.appendDHashIndex(survivors, "id", "bytes", idxPath)
    val next = Dedup.imageNearDupIncremental(
        Seq((60L, pattern(7, 3))).toDF("id", "bytes"), "id", "bytes",
        Dedup.readDHashIndex(spark, idxPath), maxHamming = 10)
      .select("id").as[Long].collect()
    assert(next.isEmpty, s"re-delivered #7 survived the appended index: ${next.toSeq}")
  }

  test("BANDED dHash index: verdict parity with the flat form at every serving radius; guards are loud (r19)") {
    import graft.operators.{Dedup, Multimodal}
    // deterministic opaque payloads (stride-sampler fallback): parity is
    // a property of the banding math, not the pixel decode
    val corpus = (0 until 40).map(i => (i.toLong,
      s"banded parity payload number $i with some trailing entropy $i$i".getBytes("UTF-8")))
      .toDF("id", "bytes")
    val bandedPath = graft.core.SessionCache.newTempDir("spec-banded") + "/bidx"
    val flatPath = graft.core.SessionCache.newTempDir("spec-banded") + "/fidx"
    Dedup.buildBandedDHashIndex(corpus, "id", "bytes", bandedPath, maxHamming = 10)
    Dedup.buildDHashIndex(corpus, "id", "bytes", flatPath)

    // the flat view of the banded tree == the flat index, exactly
    val flatView = Dedup.readBandedDHashFlat(spark, bandedPath)
      .as[(Long, Long)].collect().toSet
    val flatIdx = Dedup.readDHashIndex(spark, flatPath)
      .as[(Long, Long)].collect().toSet
    assert(flatView == flatIdx && flatView.size == 40)

    // batch: exact re-deliveries of every 3rd asset + novel payloads
    val batch = ((0 until 40 by 3).map(i => (1000L + i,
        s"banded parity payload number $i with some trailing entropy $i$i".getBytes("UTF-8"))) ++
      (0 until 6).map(i => (2000L + i, s"genuinely novel payload $i".getBytes("UTF-8"))))
      .toDF("id", "bytes")
    val batchSigs = batch.select(col("id"),
      Multimodal.dHashCol(col("bytes")).as("sig")).localCheckpoint()

    // verdict parity at the built radius AND at tighter serving radii
    // (banding at R is complete for every r <= R)
    for (r <- Seq(10, 4, 0)) {
      val viaBanded = Dedup.sigDupIdsVsBandedIndex(batchSigs, bandedPath, r)
        .as[Long].collect().toSet
      val viaFlat = Dedup.sigDupIdsVsIndex(batchSigs,
          Dedup.readDHashIndex(spark, flatPath), r)
        .as[Long].collect().toSet
      assert(viaBanded == viaFlat, s"radius $r: banded $viaBanded vs flat $viaFlat")
      if (r == 10) assert(viaBanded.size >= 10, s"re-deliveries not caught: $viaBanded")
    }

    // a WIDER serving radius than the build's would silently miss pairs
    // that disagree on every band — refused loudly
    val e = intercept[graft.core.EngineError](
      Dedup.sigDupIdsVsBandedIndex(batchSigs, bandedPath, maxHamming = 11))
    assert(e.getMessage.contains("radius"), e.getMessage)
    // a non-banded artifact has no banding constants to validate — loud
    intercept[graft.core.EngineError](
      Dedup.sigDupIdsVsBandedIndex(batchSigs, flatPath, maxHamming = 10))
    intercept[graft.core.EngineError](Dedup.readBandedDHashFlat(spark, flatPath))

    // append parity: the same survivors land in both forms (banded: one
    // flat tail file), verdicts stay equal
    val novel = batch.filter(col("id") >= 2000L)
    Dedup.appendBandedDHashIndex(novel, "id", "bytes", bandedPath)
    Dedup.appendDHashIndex(novel, "id", "bytes", flatPath)
    assert(Dedup.bandedTailFileCount(spark, bandedPath) == 1)
    assert(Dedup.readBandedDHashFlat(spark, bandedPath).count() == 46)
    val reBatch = Seq((3000L, "genuinely novel payload 2".getBytes("UTF-8")))
      .toDF("id", "bytes")
    def gateB() = Dedup.imageNearDupIncrementalBanded(reBatch, "id", "bytes",
      bandedPath, maxHamming = 10).select("id").as[Long].collect().toSet
    val gotF = Dedup.imageNearDupIncremental(reBatch, "id", "bytes",
      Dedup.readDHashIndex(spark, flatPath), maxHamming = 10)
      .select("id").as[Long].collect().toSet
    assert(gateB() == gotF && gotF.isEmpty,
      s"appended novel payload did not gate its re-delivery: banded ${gateB()} flat $gotF")

    // compact folds the tail into the banded main: verdicts and the flat
    // view are unchanged, the tail is empty
    Dedup.compactBandedDHashIndex(spark, bandedPath)
    assert(Dedup.bandedTailFileCount(spark, bandedPath) == 0)
    assert(Dedup.readBandedDHashFlat(spark, bandedPath).count() == 46)
    assert(gateB().isEmpty, "post-compact gate verdict changed")

    // a FOREIGN bucket modulus (simulated via the sidecar) is refused at
    // the gate — pruning under the wrong modulus would silently skip
    // colliding buckets — and MIGRATED by compact, which re-derives the
    // dirs with this build's constant and stamps what it wrote (the
    // flat band-0 read it rewrites from is modulus-independent)
    val mp = new org.apache.hadoop.fs.Path(s"$bandedPath/_meta")
    val out = mp.getFileSystem(spark.sparkContext.hadoopConfiguration).create(mp, true)
    try out.write("formatVersion=1\nmaxHamming=10\nkeyBuckets=32\n".getBytes("UTF-8"))
    finally out.close()
    intercept[graft.core.EngineError](
      Dedup.sigDupIdsVsBandedIndex(batchSigs, bandedPath, 10))
    Dedup.compactBandedDHashIndex(spark, bandedPath)
    assert(gateB().isEmpty, "post-migration gate verdict changed")
    assert(Dedup.readBandedDHashFlat(spark, bandedPath).count() == 46)
  }

  test("DELETE lifecycle: a deleted asset stops suppressing its near-dups, down both read paths; compact folds it physically (r20)") {
    import graft.operators.{Dedup, Multimodal}
    // VERDICT r19 "missing" #1 — the takedown semantics: after a DMCA
    // removal of asset A, a near-copy of A must be ADMITTED by every
    // future gate (its ghost signature is gone), while near-copies of
    // surviving assets keep dropping.
    // MD5-hex payloads: stride-sampled dHash grids are pseudo-random, so
    // unrelated assets sit ~32 bits apart (near-identical literal texts
    // would land within the serving radius of each other)
    def payload(i: Int): Array[Byte] =
      (0 until 8).map(j => java.security.MessageDigest.getInstance("MD5")
        .digest(s"dhdel-$i:$j".getBytes("UTF-8")).map("%02x".format(_)).mkString)
        .mkString(" ").getBytes("UTF-8")
    val corpus = (0 until 30).map(i => (i.toLong, payload(i))).toDF("id", "bytes")
    val path = graft.core.SessionCache.newTempDir("spec-dhdel") + "/idx"
    Dedup.buildBandedDHashIndex(corpus, "id", "bytes", path, maxHamming = 10)
    // a TAIL-resident asset too: deletion must reach rows the compact
    // hasn't banded yet
    Dedup.appendBandedDHashIndex(
      Seq((100L, payload(100))).toDF("id", "bytes"), "id", "bytes", path)

    // near-copies (first byte flipped ≤ 1 sig bit) of assets 3 (main),
    // 100 (tail), and 7 (stays) + one novel payload
    def flip(b: Array[Byte]): Array[Byte] = { val c = b.clone(); c(0) = 'Z'.toByte; c }
    val probe = Seq((1003L, flip(payload(3))), (1100L, flip(payload(100))),
        (1007L, flip(payload(7))), (5000L, "wholly novel takedown probe".getBytes("UTF-8")))
      .toDF("id", "bytes")
    def probeSigs(df: org.apache.spark.sql.DataFrame) = df.select(col("id"),
      Multimodal.dHashCol(col("bytes")).as("sig"))
    def dups(df: org.apache.spark.sql.DataFrame): Set[Long] =
      Dedup.sigDupIdsVsBandedIndex(probeSigs(df), path, maxHamming = 10)
        .as[Long].collect().toSet
    // pre-delete: every near-copy suppressed, down BOTH cost-based
    // paths (2-row probe → pruned main; full probe → at the small cell
    // space of radius 10, the batch decides per its touched cells)
    assert(dups(probe) == Set(1003L, 1100L, 1007L), s"pre-delete: ${dups(probe)}")
    assert(dups(probe.filter(col("id").isin(1003L, 1100L))) == Set(1003L, 1100L))

    Dedup.deleteFromDHashIndex(spark, path, Seq(3L, 100L))
    // the takedown point: near-copies of the deleted assets are now
    // ADMITTED; the surviving asset still suppresses — on the full
    // probe AND the small pruned-path probe
    assert(dups(probe) == Set(1007L), s"post-delete: ${dups(probe)}")
    assert(dups(probe.filter(col("id").isin(1003L, 1100L))).isEmpty,
      "pruned-path gate still sees a deleted ghost signature")
    // the flat view excludes tombstoned ids from main AND tail
    val flatIds = Dedup.readBandedDHashFlat(spark, path)
      .select("id").as[Long].collect().toSet
    assert(!flatIds.contains(3L) && !flatIds.contains(100L) && flatIds.size == 29,
      s"flat view: $flatIds")

    // compact folds the deletions physically: sidecar gone, verdicts
    // and the flat view unchanged, tail folded
    Dedup.compactBandedDHashIndex(spark, path)
    val tomb = new org.apache.hadoop.fs.Path(s"$path/_tombstones")
    assert(!tomb.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(tomb),
      "compact left the tombstone sidecar behind")
    assert(Dedup.bandedTailFileCount(spark, path) == 0)
    assert(dups(probe) == Set(1007L), "post-compact verdicts changed")
    assert(Dedup.readBandedDHashFlat(spark, path).count() == 29)
    // post-compact, the deleted id may return under its own id
    Dedup.appendBandedDHashIndex(
      Seq((3L, payload(3))).toDF("id", "bytes"), "id", "bytes", path)
    assert(dups(probe) == Set(1003L, 1007L), "re-ingested id not serving")

    // guards: empty id list, non-banded artifact, all-deleted compact
    intercept[IllegalArgumentException](
      Dedup.deleteFromDHashIndex(spark, path, Seq.empty))
    val flatPath = graft.core.SessionCache.newTempDir("spec-dhdel") + "/flat"
    Dedup.buildDHashIndex(corpus, "id", "bytes", flatPath)
    intercept[graft.core.EngineError](
      Dedup.deleteFromDHashIndex(spark, flatPath, Seq(1L)))
    Dedup.deleteFromDHashIndex(spark, path, (0L until 30L) :+ 3L :+ 100L)
    val e = intercept[graft.core.EngineError](Dedup.compactBandedDHashIndex(spark, path))
    assert(e.getMessage.contains("every signature is deleted"), e.getMessage)
  }

  test("banded gate == flat gate on randomized signature corpora, all radii and both read paths (property, r19)") {
    import graft.operators.Dedup
    // Deterministic pseudo-random 64-bit signatures (seeded) — exercises
    // the gate at radii whose banding geometry differs (width 16/9/5,
    // 4/8/13 bands) and at batch sizes on BOTH sides of the cost-based
    // path threshold. Ground truth is the flat gate over the identical
    // signature set; verdict equality must be exact.
    val rnd = new scala.util.Random(7)
    def flipBits(sig: Long, n: Int): Long =
      (0 until n).foldLeft(sig)((s, _) => s ^ (1L << rnd.nextInt(64)))
    for (radius <- Seq(3, 6, 10)) {
      val corpus = Seq.tabulate(120)(i => (i.toLong, rnd.nextLong()))
      val path = graft.core.SessionCache.newTempDir(s"spec-bprop$radius") + "/idx"
      Dedup.buildBandedDHashIndexFromSigs(corpus.toDF("id", "sig"), path, radius)
      // batch: near-copies within radius, borderline cases at radius ± 1
      // bit, and fresh randoms (Hamming ~32 from everything)
      val batch = (
        corpus.take(10).map { case (id, s) => (1000 + id, flipBits(s, rnd.nextInt(radius + 1))) } ++
        corpus.slice(10, 20).map { case (id, s) => (2000 + id, flipBits(s, radius + 1)) } ++
        Seq.tabulate(10)(i => (3000L + i, rnd.nextLong()))
      )
      for (take <- Seq(2, batch.size)) { // below/above the path threshold
        val bdf = batch.take(take).toDF("id", "sig")
        val viaBanded = Dedup.sigDupIdsVsBandedIndex(bdf, path, radius)
          .as[Long].collect().toSet
        val viaFlat = Dedup.sigDupIdsVsIndex(bdf, corpus.toDF("id", "sig"), radius)
          .as[Long].collect().toSet
        assert(viaBanded == viaFlat,
          s"radius $radius take $take: banded $viaBanded vs flat $viaFlat")
        if (take == batch.size) {
          // sanity: the planted near-copies ARE within radius (the ±1-bit
          // arm may fall either way when flips collide on one bit)
          assert((1000L until 1010L).forall(viaBanded.contains),
            s"radius $radius: planted in-radius copies missed: $viaBanded")
        }
      }
    }
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
