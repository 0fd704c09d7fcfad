package graft

import org.apache.spark.sql.functions._

import graft.operators.Sketches

/** Misra–Gries heavy hitters: the update/merge rules against brute-force
  * exact counts (both MG guarantees, on adversarial merge trees), and the
  * distributed pass end-to-end on a skewed corpus with the partial-agg
  * plan shape pinned.
  */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  /** Both MG guarantees vs exact counts of `stream` under capacity k. */
  private def checkGuarantees(sketch: Map[String, Long],
                              stream: Seq[String], k: Int): Unit = {
    val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val bound = Sketches.mgErrorBound(stream.size.toLong, k)
    exact.foreach { case (t, f) =>
      if (f > bound)
        assert(sketch.contains(t), s"'$t' (f=$f > $bound) missing from sketch")
    }
    sketch.foreach { case (t, est) =>
      val f = exact.getOrElse(t, 0L)
      assert(est <= f && est >= f - bound,
        s"'$t': est=$est outside [${f - bound}, $f]")
    }
    assert(sketch.size <= k)
  }

  /** Deterministic skewed stream: token i appears ~N/(i+1) times. */
  private def zipfish(n: Int): Seq[String] =
    (0 until n).map(i => "t" + java.lang.Long.numberOfTrailingZeros(i + 1))

  test("mgUpdate: sequential sketch honors both guarantees at several capacities") {
    for (k <- Seq(1, 3, 8, 32); n <- Seq(10, 500, 4096)) {
      val stream = zipfish(n)
      val m = stream.foldLeft(Map.empty[String, Long])(
        (acc, x) => Sketches.mgUpdate(acc, x, k))
      checkGuarantees(m, stream, k)
    }
  }

  test("mgUpdateInPlace (the aggregation hot path) == the immutable update, step for step") {
    for (k <- Seq(1, 3, 8)) {
      val stream = zipfish(2000)
      var ref = Map.empty[String, Long]
      val hot = scala.collection.mutable.HashMap.empty[String, Long]
      stream.foreach { x =>
        ref = Sketches.mgUpdate(ref, x, k)
        Sketches.mgUpdateInPlace(hot, x, k)
        assert(hot.toMap == ref, s"divergence at k=$k after '$x'")
      }
    }
  }

  test("mgMerge: guarantees survive adversarial merge trees") {
    val k = 5
    val stream = zipfish(3000)
    // uneven chunking + left-deep AND balanced merge orders
    val chunks = Seq(stream.take(7), stream.slice(7, 1000),
      stream.slice(1000, 1001), stream.slice(1001, 2500), stream.drop(2500))
    val sketches = chunks.map(_.foldLeft(Map.empty[String, Long])(
      (acc, x) => Sketches.mgUpdate(acc, x, k)))
    val leftDeep = sketches.reduceLeft((a, b) => Sketches.mgMerge(a, b, k))
    checkGuarantees(leftDeep, stream, k)
    val balanced = Sketches.mgMerge(
      Sketches.mgMerge(sketches(0), sketches(1), k),
      Sketches.mgMerge(sketches(2), Sketches.mgMerge(sketches(3), sketches(4), k), k), k)
    checkGuarantees(balanced, stream, k)
  }

  test("heavyHitterTokens: distributed pass finds the planted dominator; partial agg pinned") {
    // 'dominant' holds ~30% of the token mass across many partitions;
    // it MUST surface (f >> N/(k+1)) with a near-exact estimate
    val docs = spark.range(400).select(
      concat_ws(" ", lit("dominant dominant dominant"),
        concat(lit("rare"), col("id"))).as("text"))
      .repartition(8)
    val df = Sketches.heavyHitterTokens(docs, "text", k = 10)
    val got = df.as[(String, Long)].collect()
    val n = 400L * 4L
    val bound = Sketches.mgErrorBound(n, 10)
    val dom = got.find(_._1 == "dominant")
    assert(dom.nonEmpty, s"dominant missing from ${got.toSeq}")
    assert(dom.get._2 <= 1200L && dom.get._2 >= 1200L - bound,
      s"dominant estimate ${dom.get._2} outside [${1200 - bound}, 1200]")
    assert(got.length <= 10)
    // the typed Aggregator must plan with partial aggregation (the
    // exchange carries <= k counters per task, never the token stream)
    val plan = df.queryExecution.executedPlan.toString.toLowerCase
    assert(plan.contains("partial_heavyhittersagg"),
      s"partial MG agg missing from plan:\n$plan")
  }

  test("validation: capacity floor") {
    intercept[IllegalArgumentException] { new Sketches.HeavyHittersAgg(0) }
  }
}
