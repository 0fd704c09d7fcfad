package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.{AnnIndex, Dedup, TemporalJoins}

class TemporalJoinsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asofJoin: latest right row at-or-before, nulls when none, same-instant visible") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")),
      (2L, 10L, ts("2024-01-01 12:00:00")),
      (3L, 20L, ts("2024-01-01 09:00:00")), // user 20 has no prior purchase
      (4L, 30L, ts("2024-01-01 10:00:00")) // exactly at the purchase instant
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, ts("2024-01-01 09:30:00"), 100.0),
      (10L, ts("2024-01-01 11:00:00"), 200.0),
      (20L, ts("2024-01-01 23:00:00"), 300.0), // after every left row of user 20
      (30L, ts("2024-01-01 10:00:00"), 400.0)
    ).toDF("user_id", "p_ts", "purchase_value")

    val out = TemporalJoins.asofJoin(left, right, "user_id", "ts", "p_ts",
        Seq("purchase_value"))
      .select("event_id", "purchase_value")
      .as[(Long, Option[Double])].collect().toMap

    assert(out == Map(
      1L -> Some(100.0), // 09:30 is the latest ≤ 10:00
      2L -> Some(200.0), // 11:00 supersedes 09:30
      3L -> None,        // left-outer: no purchase yet
      4L -> Some(400.0)  // same-instant right row counts (ts <=)
    ))
  }

  test("asofJoin: multi-column payload comes from ONE right row; nulls in the latest row stay null") {
    val left = Seq((1L, 10L, ts("2024-01-01 12:00:00"))).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, ts("2024-01-01 10:00:00"), Option(10.0), Option(5L)),
      (10L, ts("2024-01-01 11:00:00"), None: Option[Double], Option(7L))
    ).toDF("user_id", "p_ts", "px", "qty")
    val out = TemporalJoins.asofJoin(left, right, "user_id", "ts", "p_ts", Seq("px", "qty"))
      .select("px", "qty").as[(Option[Double], Option[Long])].head()
    // latest right row is (null, 7): px must NOT resurrect the older 10.0
    assert(out == (None, Some(7L)))
  }

  test("asofJoin matches brute-force per-row maximum on randomized data") {
    val rnd = new scala.util.Random(1234)
    def t(n: Int) = new Timestamp(1700000000000L + n * 1000L)
    val left = (1 to 300).map(i => (i.toLong, (i % 9).toLong, t(rnd.nextInt(5000))))
      .toDF("event_id", "user_id", "ts")
    val right = (1 to 200).map(i => (((i * 7) % 9).toLong, t(rnd.nextInt(5000)), i.toDouble))
      .toDF("user_id", "p_ts", "pv")

    val got = TemporalJoins.asofJoin(left, right, "user_id", "ts", "p_ts", Seq("pv"))
      .select("event_id", "pv").as[(Long, Option[Double])].collect().toMap

    val rightRows = right.as[(Long, Timestamp, Double)].collect()
    val leftRows = left.as[(Long, Long, Timestamp)].collect()
    val expect = leftRows.map { case (eid, uid, ts) =>
      val candidates = rightRows.filter(r => r._1 == uid && !r._2.after(ts))
      // brute-force pick: max ts; ties broken by max pv (matches the
      // window's last-in-order semantics only when ts is unique per user —
      // dedupe ts collisions below to keep the oracle well-defined
      eid -> candidates.sortBy(r => (r._2.getTime, r._3)).lastOption.map(_._3)
    }.toMap

    // restrict the comparison to rows whose winning ts is unique per user
    val ambiguous = leftRows.flatMap { case (eid, uid, ts) =>
      val cs = rightRows.filter(r => r._1 == uid && !r._2.after(ts))
      val best = cs.map(_._2.getTime).sorted.lastOption
      if (best.exists(b => cs.count(_._2.getTime == b) > 1)) Some(eid) else None
    }.toSet
    got.filterNot { case (eid, _) => ambiguous(eid) }.foreach { case (eid, pv) =>
      assert(pv == expect(eid), s"event $eid")
    }
    assert((got.keySet -- ambiguous).nonEmpty)
  }

  test("rangeJoin (bucketized equi) matches the brute-force theta join") {
    val rnd = new scala.util.Random(42)
    val points = (1 to 300).map { i =>
      (i.toLong, (i % 7).toLong, rnd.nextInt(100000).toLong)
    }.toDF("p_id", "k", "x")
    val intervals = (1 to 40).map { i =>
      val s = rnd.nextInt(90000).toLong
      (i.toLong, (i % 7).toLong, s, s + rnd.nextInt(8000).toLong)
    }.toDF("iv_id", "k", "lo", "hi")

    val fast = TemporalJoins.rangeJoin(points, intervals, "x", "lo", "hi",
        bucketWidth = 5000L, extraKeys = Seq("k"))
      .select("p_id", "iv_id").as[(Long, Long)].collect().toSet

    val slow = points.as("p").join(intervals.as("iv"),
        $"p.k" === $"iv.k" && $"p.x" >= $"iv.lo" && $"p.x" <= $"iv.hi")
      .select($"p.p_id", $"iv.iv_id").as[(Long, Long)].collect().toSet

    assert(fast == slow)
    assert(slow.nonEmpty)
  }

  test("nearDupPairsLSH: subset of exact pairs, catches every strong pair") {
    val embs = spark.read.parquet(s"$Sf0001/embeddings.parquet")
      .filter(col("vec_id") < 200)
    val cfg = AnnIndex.Config(dim = 64, nBits = 4, nTables = 12)
    val lsh = AnnIndex.nearDupPairsLSH(embs, "vec_id", "embedding", 0.3, cfg)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val exact = Dedup.nearDupPairsExact(embs, "vec_id", "embedding", 0.3)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(lsh.subsetOf(exact))
    assert(lsh.nonEmpty)
    // recall over the verified-threshold pair set should be substantial
    assert(lsh.size.toDouble / exact.size >= 0.5, s"recall ${lsh.size}/${exact.size}")
  }
}
