package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.streaming.Streams

class StreamsSpec extends SparkSpec {
  import spark.implicits._

  test("sessionize: gap > threshold starts a new session") {
    def ts(s: String) = Timestamp.valueOf(s)
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L),
      (2L, ts("2024-01-01 10:10:00"), 1L), // 10 min gap → same session
      (3L, ts("2024-01-01 11:00:00"), 1L), // 50 min gap → new session
      (4L, ts("2024-01-01 10:00:00"), 2L)
    ).toDF("event_id", "ts", "user_id")
    val sess = Streams.sessionize(events, gapMinutes = 30, tieCols = Seq("event_id"))
      .select("event_id", "session_seq").as[(Long, Long)].collect().toMap
    assert(sess == Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 1L))
  }

  test("startStatefulAwait sizes state partitions from conf and restores the session setting") {
    val key = "spark.sql.shuffle.partitions"
    val before = spark.conf.get(key)
    // conf override wins over the min(parallelism, 8) default
    spark.conf.set("spark.graft.stream.statePartitions", "2")
    try {
      var seen = -1L
      val sinkName = "spec_stateful_tuned"
      val w = Streams.dedupExactStream(Tables.documentsStream(spark, Sf0001), "text")
        .select("text_sha")
        .writeStream.format("memory").queryName(sinkName).outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
        override def onQueryStarted(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
        override def onQueryProgress(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit =
          e.progress.stateOperators.foreach(so => seen = so.numShufflePartitions)
        override def onQueryTerminated(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      }
      spark.streams.addListener(listener)
      try Streams.startStatefulAwait(spark, w, "spec_stateful_tuned")
      finally spark.streams.removeListener(listener)
      // listener delivery is async; bounded wait for the progress event
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (seen < 0 && System.nanoTime() < deadline) Thread.sleep(100)
      assert(seen == 2L, s"state partitions should honor the conf, saw $seen")
      assert(spark.conf.get(key) == before, "session shuffle partitions must be restored")
      // emitted rows are partition-count-independent: the distinct sha set
      val streamed = spark.table(sinkName).as[String].collect().toSet
      val batch = Tables.documents(spark, Sf0001)
        .select(sha2(col("text"), 256)).as[String].collect().toSet
      assert(streamed == batch)
    } finally spark.conf.unset("spark.graft.stream.statePartitions")
  }

  test("streaming exact dedup keeps one row per distinct text and matches batch dedup") {
    val sinkName = "spec_stream_dedup"
    // union the arrival stream with itself: every text arrives (at least)
    // twice, so the dedup state genuinely suppresses rows.
    val doubled = Tables.documentsStream(spark, Sf0001)
      .union(Tables.documentsStream(spark, Sf0001))
    val sq = Streams.dedupExactStream(doubled, "text")
      .select("text_sha")
      .writeStream.format("memory").queryName(sinkName).outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    assert(sq.awaitTermination(120000), "stream did not finish")
    val streamed = spark.table(sinkName).as[String].collect().toSet
    val batch = Tables.documents(spark, Sf0001)
      .select(sha2(col("text"), 256)).as[String].collect().toSet
    assert(streamed == batch) // exactly the distinct-sha set…
    assert(spark.table(sinkName).count() == streamed.size) // …each ONCE,
    // though every text arrived twice (2 × 500 input rows)
  }

  test("streaming PII scrub equals the batch scrub and carries no state operators") {
    val sinkName = "spec_stream_pii"
    val sq = Streams.piiScrubStream(Tables.documentsStream(spark, Sf0001), "text")
      .select(col("doc_id"), col("scrubbed"), col("n_pii"))
      .writeStream.format("memory").queryName(sinkName).outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    assert(sq.awaitTermination(120000), "stream did not finish")
    // stateless: no state operators in any progress
    assert(sq.recentProgress.forall(_.stateOperators.isEmpty),
      "PII scrub must not allocate state store")
    val streamed = spark.table(sinkName)
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    val batch = Tables.documents(spark, Sf0001)
      .select(col("doc_id"),
        graft.operators.TextAnalysis.scrubPii(col("text")).as("s"),
        graft.operators.TextAnalysis.piiCount(col("text")).as("n"))
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    assert(streamed == batch)
  }

  test("streaming line cleaning equals the batch pass and carries no state operators") {
    val sinkName = "spec_stream_line_clean"
    val aug = concat_ws("\n", lit("Subscribe now"), col("text"),
      lit("tiny"), lit("a good long closing line here"))
    val sq = Streams.lineCleanStream(
        Tables.documentsStream(spark, Sf0001)
          .select(col("doc_id"), aug.as("text")),
        "text", minWords = 4, boilerplateRe = "(?i)subscribe")
      .select(col("doc_id"), col("n_lines"), col("n_kept"), col("cleaned"))
      .writeStream.format("memory").queryName(sinkName).outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    assert(sq.awaitTermination(120000), "stream did not finish")
    assert(sq.recentProgress.forall(_.stateOperators.isEmpty),
      "line cleaning must not allocate state store")
    val streamed = spark.table(sinkName)
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    val batch = graft.operators.TextAnalysis.lineClean(
        Tables.documents(spark, Sf0001).select(col("doc_id"), aug.as("text")),
        "text", minWords = 4, boilerplateRe = "(?i)subscribe")
      .select(col("doc_id"), col("n_lines"), col("n_kept"), col("cleaned"))
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(streamed.nonEmpty && streamed == batch)
  }

  test("streaming BM25 routing equals the batch projection and carries no state operators") {
    val docs = Tables.documents(spark, Sf0001)
    val idxPath = java.nio.file.Files.createTempDirectory("spec-bm25-route").toString
    graft.operators.IndexedBm25.build(docs, "doc_id", "text", idxPath)
    val terms = Seq("vector", "stream")
    val (ts, n, total) =
      graft.operators.IndexedBm25.frozenStats(spark, idxPath, terms)
    assert(n == docs.count() && ts.forall(_._2 > 0))

    val sinkName = "spec_stream_bm25_route"
    val sq = Streams.bm25RouteStream(
        Tables.documentsStream(spark, Sf0001), "text", ts, n, total, 0.5)
      .select(col("doc_id"), col("score"))
      .writeStream.format("memory").queryName(sinkName).outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    assert(sq.awaitTermination(120000), "stream did not finish")
    assert(sq.recentProgress.forall(_.stateOperators.isEmpty),
      "BM25 routing must not allocate state store")
    val streamed = spark.table(sinkName)
      .as[(Long, Double)].collect().sortBy(_._1).toSeq
    val batch = docs
      .select(col("doc_id"),
        graft.operators.Bm25.scoreColumn(col("text"), ts, n, total).as("score"))
      .filter(round(col("score"), 6) >= 0.5) // the stream's rounded cut (round-14)
      .as[(Long, Double)].collect().sortBy(_._1).toSeq
    assert(streamed.nonEmpty && streamed == batch)
  }

  test("streaming count-table maintenance: foreachBatch appends converge to the full recount") {
    // the deployment shape: each arriving micro-batch appends its partial
    // counts (linear in the batch); the maintained table must equal a
    // from-scratch recount once the stream drains
    val path = graft.core.SessionCache.newTempDir("spec-stream-count-table")
    val sq = Tables.documentsStream(spark, Sf0001)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        graft.operators.CountTable.append(batch, "text", n = 1, path)
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    assert(sq.awaitTermination(120000), "stream did not finish")
    val maintained = graft.operators.CountTable.read(spark, path)
    val recount = graft.operators.CountTable.counts(
      Tables.documents(spark, Sf0001), "text", n = 1)
    assert(maintained.except(recount).isEmpty && recount.except(maintained).isEmpty,
      "streamed appends drifted from the recount")
  }

  test("streaming index-delete maintenance: foreachBatch deletes converge to batch deletes") {
    // the retention-pipeline shape: a stream of takedown/expiry ids drives
    // IndexedBm25.delete per micro-batch; once drained, probing the index
    // must equal a direct scan over the surviving docs
    val docs = Tables.documents(spark, Sf0001)
    val idxPath = java.nio.file.Files.createTempDirectory("spec-stream-del").toString
    graft.operators.IndexedBm25.build(docs, "doc_id", "text", idxPath)
    val terms = Seq("vector", "stream")
    // delete-id stream: every doc_id < 100, via the documents file stream
    val sq = Tables.documentsStream(spark, Sf0001)
      .filter(col("doc_id") < 100).select(col("doc_id"))
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val ids = batch.collect().map(_.getLong(0)).toSeq
        if (ids.nonEmpty) graft.operators.IndexedBm25.delete(spark, idxPath, ids)
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    assert(sq.awaitTermination(120000), "stream did not finish")
    val probed = graft.operators.IndexedBm25.topK(spark, idxPath, terms, 10)
      .as[(Long, Double)].collect().toSeq
    val direct = graft.operators.Bm25.topK(
        docs.filter(col("doc_id") >= 100), "doc_id", "text", terms, 10)
      .as[(Long, Double)].collect().toSeq
    assert(probed == direct, s"$probed vs $direct")
  }

  test("watermark-bounded dedup variant runs and dedups within the horizon") {
    val sinkName = "spec_stream_dedup_wm"
    val ev = Tables.eventsStream(spark, Sf0001)
      .select(col("ts"), col("event_type").as("text"))
    val sq = Streams.dedupExactStreamWithinWatermark(ev, "text", "ts", "1 hour")
      .select("text_sha")
      .writeStream.format("memory").queryName(sinkName).outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    assert(sq.awaitTermination(120000), "stream did not finish")
    // one AvailableNow pass over one file = one dedup horizon: the few
    // distinct event_type strings collapse to one row each.
    val n = spark.table(sinkName).count()
    val distinct = Tables.events(spark, Sf0001).select("event_type").distinct().count()
    assert(n == distinct, s"got $n rows, want $distinct")
  }

  test("streaming windowed agg equals its batch twin on the events fixture") {
    val batchEvents = Tables.events(spark, Sf0001)
    val expected = Streams.eventsWindowAgg(batchEvents)
      .orderBy("window_start", "event_type")
      .collect().map(_.toSeq).toSeq

    // Stream the same rows from a micro-batch-friendly copy (the fixture's
    // NANOS timestamps can't flow through readStream's parquet source, so
    // re-write the already-truncated frame).
    val dir = java.nio.file.Files.createTempDirectory("graft-stream").toString
    batchEvents.write.mode("overwrite").parquet(dir)
    val stream = Streams.eventsWindowAggStream(spark, dir, batchEvents.schema)
    val q = Streams.toMemorySink(stream, "win_agg_test").trigger(
      org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.table("win_agg_test")
      .orderBy("window_start", "event_type")
      .collect().map(_.toSeq).toSeq
    assert(got == expected)
  }

  test("streaming ANN probe equals the batch bucket-join on the same index") {
    import graft.operators.AnnIndex
    val cfg = AnnIndex.Config(dim = 64, nBits = 4, nTables = 8)
    val thr = 0.4
    val embs = spark.read.parquet(s"$Sf0001/embeddings.parquet")
    val index = AnnIndex.buildIndex(embs, "vec_id", "embedding", cfg)

    val sq = Streams.annProbeStream(
        Tables.embeddingsStream(spark, Sf0001).filter(col("vec_id") < 15),
        "vec_id", "embedding", index, thr, cfg)
      .writeStream.format("memory").queryName("ann_probe_test").outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    assert(sq.awaitTermination(300000), "stream did not finish")
    val got = spark.table("ann_probe_test")
      .select(col("q_id"), col("c_id"), round(col("score"), 6).as("s"))
      .as[(Long, Long, Double)].collect().toSet

    // batch twin: identical bucket join + threshold over the same frames
    val qb = embs.filter(col("vec_id") < 15)
      .select(col("vec_id").cast("long").as("q_id"), col("embedding").as("q_emb"))
      .withColumn("b", AnnIndex.bucketsOf(col("q_emb"), cfg))
      .select(posexplode(col("b")).as(Seq("table", "bucket")), col("q_id"), col("q_emb"))
    val expected = qb.join(index, Seq("table", "bucket"))
      .select(col("q_id"), col("id").as("c_id"),
        graft.functions.VectorFunctions.cosine_sim(col("embedding"), col("q_emb")).as("score"))
      .filter(col("score") > thr)
      .select(col("q_id"), col("c_id"), round(col("score"), 6).as("s"))
      .distinct()
      .as[(Long, Long, Double)].collect().toSet
    assert(got == expected, "stream and batch probe disagree")
    // every query is a corpus member — its self-match must be served
    assert((0L until 15L).forall(i => got.contains((i, i, 1.0))),
      "missing self-matches")
  }

  test("watermarked ANN probe stream equals the unwatermarked pair set") {
    import graft.operators.AnnIndex
    val cfg = AnnIndex.Config(dim = 64, nBits = 4, nTables = 8)
    val thr = 0.4
    val embs = spark.read.parquet(s"$Sf0001/embeddings.parquet")
    val index = AnnIndex.buildIndex(embs, "vec_id", "embedding", cfg)
    val queries = Tables.embeddingsStream(spark, Sf0001).filter(col("vec_id") < 15)
      .withColumn("arrival_ts", timestamp_seconds(lit(1704067200L) + col("vec_id")))
    val sq = Streams.annProbeStreamWithinWatermark(queries, "vec_id", "embedding",
        index, thr, cfg, tsCol = "arrival_ts", delay = "30 days")
      .writeStream.format("memory").queryName("ann_probe_wm_test").outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    assert(sq.awaitTermination(300000), "stream did not finish")
    // the dedup operator must be the WATERMARKED state store (state rows
    // expire), not the unbounded dropDuplicates
    assert(sq.lastProgress != null && sq.lastProgress.stateOperators.nonEmpty,
      "expected a dedup state operator in the plan")
    val got = spark.table("ann_probe_wm_test")
      .select(col("q_id"), col("c_id"), round(col("score"), 6).as("s"))
      .as[(Long, Long, Double)].collect().toSet

    // the unwatermarked form is mode-agnostic — run it on the batch frame
    val expected = Streams.annProbeStream(embs.filter(col("vec_id") < 15),
        "vec_id", "embedding", index, thr, cfg)
      .select(col("q_id"), col("c_id"), round(col("score"), 6).as("s"))
      .as[(Long, Long, Double)].collect().toSet
    assert(got == expected, "watermarked stream and batch probe disagree")
    assert((0L until 15L).forall(i => got.contains((i, i, 1.0))),
      "missing self-matches")
  }

  test("expiring sessionizer flushes an idle user's final session and frees its state") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import Streams.{ClosedSession, Ev}
    def ts(s: String) = Timestamp.valueOf(s)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[Ev]
    val sessions = Streams.sessionizeStatefulExpiring(
      ms.toDS().withWatermark("ts", "0 seconds"), gapMinutes = 30)
    val q = sessions.writeStream.format("memory").queryName("sess_exp_test")
      .outputMode("append").start()
    try {
      // batch 1: user 1 opens a session (2 events, 10 min apart)
      ms.addData(Ev(1L, ts("2024-01-01 10:00:00")), Ev(1L, ts("2024-01-01 10:10:00")))
      q.processAllAvailable()
      assert(spark.table("sess_exp_test").isEmpty,
        "no session may close before the gap boundary passes")
      // batch 2 advances the watermark to 12:00 — past user 1's 10:40
      // gap boundary; batch 3 gives the engine a trigger in which the
      // armed timeout fires (timeouts are evaluated against the
      // watermark computed at the previous batch's end).
      ms.addData(Ev(2L, ts("2024-01-01 12:00:00")))
      q.processAllAvailable()
      ms.addData(Ev(2L, ts("2024-01-01 12:05:00")))
      q.processAllAvailable()
      val got = spark.table("sess_exp_test").as[ClosedSession].collect().toSet
      // user 1's FINAL session emitted without any further user-1 event —
      // the NoTimeout form would hold it forever; user 2's session is
      // still inside its gap horizon and must NOT emit.
      assert(got == Set(ClosedSession(1L, 1L, 2L)), s"got $got")
      // the flushed key's state is gone: numRowsTotal counts only user 2
      val stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      assert(stateRows == 1L, s"expected 1 live state row (user 2), got $stateRows")
    } finally q.stop()
  }

  test("expiring sessionizer on a bounded replay = closed sessions + watermark-flushed finals") {
    import Streams.Ev
    val evs = Tables.eventsStream(spark, Sf0001)
      .select(col("user_id"), col("ts")).as[Ev]
      .withWatermark("ts", "0 seconds")
    val sq = Streams.sessionizeStatefulExpiring(evs, gapMinutes = 30).toDF()
      .writeStream.format("memory").queryName("sess_exp_replay").outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    assert(sq.awaitTermination(300000), "stream did not finish")
    val got = spark.table("sess_exp_replay")
      .select("user_id", "session_seq", "n_events")
      .as[(Long, Long, Long)].collect().toSet

    // expected: batch window sessionization; keep non-final sessions, plus
    // finals whose ms-floored gap boundary precedes the final watermark
    // (global max event time at delay 0) — the engine's alarm arithmetic.
    val batchEvents = Tables.events(spark, Sf0001)
    val maxTsUs = batchEvents.agg(max(unix_micros(col("ts")))).head.getLong(0)
    val rows = Streams.sessionize(batchEvents, gapMinutes = 30)
      .groupBy(col("user_id"), col("session_seq"))
      .agg(count(lit(1)).as("n_events"), max(unix_micros(col("ts"))).as("last_us"))
      .select(col("user_id").cast("long"), col("session_seq").cast("long"),
        col("n_events").cast("long"), col("last_us"))
      .as[(Long, Long, Long, Long)].collect()
    val maxSeq = rows.groupBy(_._1).map { case (u, rs) => u -> rs.map(_._2).max }
    val expected = rows.filter { case (u, seq, _, lastUs) =>
      seq < maxSeq(u) || lastUs / 1000L + 30L * 60000L < maxTsUs / 1000L
    }.map(t => (t._1, t._2, t._3)).toSet
    assert(got == expected, s"stream=${got.size} rows, expected=${expected.size} rows")
    // and it must emit strictly more than the NoTimeout form (the flushed
    // finals are the whole point)
    assert(expected.exists { case (u, seq, _) => seq == maxSeq(u) },
      "fixture produced no flushed final — test is vacuous")
  }

  test("streaming IVF probe is stateless and equals the batch cluster-join") {
    import graft.operators.IvfIndex
    val thr = 0.4
    val embs = spark.read.parquet(s"$Sf0001/embeddings.parquet")
    val model = IvfIndex.fit(embs, "embedding", k = 8)
    val index = IvfIndex.buildIndex(embs, "vec_id", "embedding", model)
    val nProbe = IvfIndex.defaultNProbe(8)

    val streamDf = Streams.ivfProbeStream(
      Tables.embeddingsStream(spark, Sf0001).filter(col("vec_id") < 15),
      "vec_id", "embedding", index, model, thr, nProbe)
    val sq = streamDf
      .writeStream.format("memory").queryName("ivf_probe_test").outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    assert(sq.awaitTermination(300000), "stream did not finish")
    // statelessness: the streaming plan must run zero state operators
    assert(sq.lastProgress != null && sq.lastProgress.stateOperators.isEmpty,
      s"unexpected state operators: ${sq.lastProgress}")
    val got = spark.table("ivf_probe_test")
      .select(col("q_id"), col("c_id"), round(col("score"), 6).as("s"))
      .as[(Long, Long, Double)].collect().toSet

    // the probe is mode-agnostic DataFrame code — run it on the BATCH
    // frame and require the streaming execution to agree exactly
    val expected = Streams.ivfProbeStream(embs.filter(col("vec_id") < 15),
        "vec_id", "embedding", index, model, thr, nProbe)
      .select(col("q_id"), col("c_id"), round(col("score"), 6).as("s"))
      .as[(Long, Long, Double)].collect().toSet
    assert(got == expected, "stream and batch probe disagree")
    assert((0L until 15L).forall(i => got.contains((i, i, 1.0))),
      "missing self-matches")
  }

  test("streaming hot-lines maintenance: per-batch deltas converge to the full recompute") {
    import graft.operators.{HotLinesIndex, TextAnalysis}
    val path = graft.core.SessionCache.newTempDir("spec-stream-hotlines")
    val aug = (d: org.apache.spark.sql.DataFrame) => d.select(col("doc_id"),
      concat_ws("\n", lit("hdr shared by all"), col("text")).as("text"))
    Streams.hotLinesMaintainAvailableNow(
      aug(Tables.documentsStream(spark, Sf0001)), "text", path)
    val maintained = HotLinesIndex.hotLines(spark, path, maxDocFreq = 100L)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val recomputed = TextAnalysis.hotLines(
        aug(Tables.documents(spark, Sf0001)), "text", maxDocFreq = 100L)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(maintained == recomputed && maintained.nonEmpty,
      s"stream-maintained $maintained vs recomputed $recomputed")
  }

  test("checkpoint RESET mints a fresh exactly-once scope: appends land, never silently skipped (r18)") {
    // ADVICE r17 medium: a PATH-derived run tag made a deleted-and-
    // recreated checkpoint replay batchIds onto the dead run's epochs —
    // the appender saw those markers committed and silently DROPPED the
    // new run's deltas. The tag now comes from the checkpoint's
    // persisted query id, which a reset regenerates; reprocessed data
    // must land VISIBLY (honest at-least-once on reset), never vanish.
    import graft.operators.HotLinesIndex
    val path = graft.core.SessionCache.newTempDir("spec-ckptreset-idx")
    val arrival = graft.core.SessionCache.newTempDir("spec-ckptreset-src")
    val ckpt = graft.core.SessionCache.newTempDir("spec-ckptreset-ckpt")
    val docs = Seq((1L, "shared line\nonly one"), (2L, "shared line\nonly two"))
      .toDF("doc_id", "text")
    docs.coalesce(1).write.mode("append").parquet(arrival)
    def drain(): Unit = Streams.hotLinesMaintainAvailableNow(
      spark.readStream.schema(docs.schema).parquet(arrival), "text", path,
      checkpoint = Some(ckpt))
    def sharedFreq(): Long = HotLinesIndex.hotLines(spark, path, maxDocFreq = 1L)
      .filter(col("line") === "shared line").select("n_docs")
      .as[Long].collect().headOption.getOrElse(0L)

    drain()
    assert(graft.store.EpochCommit.committedCount(spark, path) == 1)
    assert(sharedFreq() == 2L, s"first drain: freq ${sharedFreq()}")

    // restart over the INTACT checkpoint, no new files: same scope, no
    // new batch — exactly-once across restarts still holds
    drain()
    assert(graft.store.EpochCommit.committedCount(spark, path) == 1,
      "intact-checkpoint restart must not re-append")

    // "start fresh": delete the checkpoint, keep index + path. The new
    // query id scopes batch 0's epoch away from the dead run's — the
    // reprocessed delta must LAND (doubled freq), not be skipped.
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(ckpt))
    drain()
    assert(graft.store.EpochCommit.committedCount(spark, path) == 2,
      "reset-checkpoint drain was silently skipped (stale exactly-once scope)")
    assert(sharedFreq() == 4L, s"post-reset: freq ${sharedFreq()} (expected honest double-count)")
  }

  test("streaming jaccard gate equals the batch gate against the same persisted index") {
    import graft.operators.Dedup
    val docs = spark.read.parquet(s"$Sf0001/documents.parquet")
    val idxPath = java.nio.file.Files.createTempDirectory("graft-jgate-idx").toString
    Dedup.buildPostingsIndex(docs.filter(col("doc_id") < 300),
      "doc_id", "text", n = 2, idxPath)
    val postings = Dedup.readPostingsIndex(spark, idxPath)

    val outDir = java.nio.file.Files.createTempDirectory("graft-jgate-out").toString + "/surv"
    Streams.jaccardGateAvailableNow(
      Tables.documentsStream(spark, Sf0001)
        .filter(col("doc_id") >= 250 && col("doc_id") < 325),
      "doc_id", "text", n = 2, threshold = 0.2, postings, outDir)
    val got = spark.read.parquet(outDir)
      .select("doc_id").as[Long].collect().toSet

    val expected = Dedup.jaccardGate(
        docs.filter(col("doc_id") >= 250 && col("doc_id") < 325),
        "doc_id", "text", n = 2, threshold = 0.2, postings)
      .select("doc_id").as[Long].collect().toSet
    assert(got == expected, s"stream $got vs batch $expected")
    // re-delivered docs (250-299 are already indexed) must all drop
    assert(got.forall(_ >= 300), s"re-delivered doc survived: $got")
    assert(got.nonEmpty, "gate dropped everything — fixture drift?")
  }

  test("gate-then-append CLOSES the ingest loop: wave-2 near-dups of wave-1 survivors drop (r17)") {
    import graft.operators.Dedup
    // hand-built corpus so every jaccard relation is designed:
    //   indexed #1;  wave1: #10 novel, #11 near-dup of #1 (drops at gate);
    //   wave2: #20 near-dup of #10 — drops ONLY because the loop appended
    //   wave 1's survivor — and #21 novel.
    def df(rows: (Long, String)*) = rows.toDF("doc_id", "text")
    val indexed = df(1L -> "red fox jumps over lazy dog tonight")
    val w1 = df(10L -> "alpha beta gamma delta epsilon zeta",
                11L -> "red fox jumps over lazy dog today")
    val w2 = df(20L -> "alpha beta gamma delta epsilon eta",
                21L -> "one two three four five six")

    def runWaves(compactEvery: Int): (Set[Long], Int) = {
      val idx = graft.core.SessionCache.newTempDir("spec-jgatem-idx")
      val arrival = graft.core.SessionCache.newTempDir("spec-jgatem-src")
      val ckpt = graft.core.SessionCache.newTempDir("spec-jgatem-ckpt")
      val out = graft.core.SessionCache.newTempDir("spec-jgatem-out") + "/surv"
      Dedup.buildPostingsIndex(indexed, "doc_id", "text", n = 2, idx)
      for (w <- Seq(w1, w2)) {
        // two sequential AvailableNow drains over one checkpoint: the
        // second run processes ONLY the new files — a deterministic
        // two-micro-batch arrival (the daily-drop resume shape)
        w.coalesce(1).write.mode("append").parquet(arrival)
        Streams.jaccardGateMaintainAvailableNow(
          spark.readStream.schema(w.schema).parquet(arrival),
          "doc_id", "text", n = 2, threshold = 0.2, idx, out,
          checkpoint = Some(ckpt), compactEvery = compactEvery)
      }
      (spark.read.parquet(out).select("doc_id").as[Long].collect().toSet,
        graft.store.EpochCommit.committedCount(spark, idx))
    }

    val (got, epochs) = runWaves(compactEvery = 0)
    assert(got == Set(10L, 21L), s"closed-loop survivors: $got")
    assert(epochs == 3, s"build + 2 appends expected, saw $epochs epochs")

    // the OPEN loop (plain gate, index never maintained) admits #20 —
    // the exact daily-pipeline gap this closes
    val openGate = Dedup.jaccardGate(w2, "doc_id", "text", n = 2,
      threshold = 0.2, Dedup.shinglePostings(indexed, "doc_id", "text", 2))
      .select("doc_id").as[Long].collect().toSet
    assert(openGate == Set(20L, 21L), s"open gate admitted: $openGate")

    // batch incremental chain over the same waves == the stream
    val idxB = graft.core.SessionCache.newTempDir("spec-jgatem-idxb")
    Dedup.buildPostingsIndex(indexed, "doc_id", "text", n = 2, idxB)
    val s1 = Dedup.jaccardIncremental(w1, "doc_id", "text", 2, 0.2,
      Dedup.readPostingsIndex(spark, idxB)).localCheckpoint()
    Dedup.appendPostingsIndex(s1, "doc_id", "text", 2, idxB)
    val s2 = Dedup.jaccardIncremental(w2, "doc_id", "text", 2, 0.2,
      Dedup.readPostingsIndex(spark, idxB))
    val chain = (s1.select("doc_id").as[Long].collect() ++
      s2.select("doc_id").as[Long].collect()).toSet
    assert(chain == got, s"batch chain $chain vs stream $got")

    // with the epoch governor on, the fan-in folds back to 1 and the
    // admitted set is unchanged (compact is a no-op semantically)
    val (gotC, epochsC) = runWaves(compactEvery = 2)
    assert(gotC == got && epochsC == 1,
      s"compactEvery=2: survivors $gotC, epochs $epochsC")
  }

  test("maintainer drift signal: healthy wave stays silent, shifted wave fires refit-recommended (r18)") {
    import graft.operators.{IvfIndex, IvfPackedIndex}
    // model + OUT-OF-SAMPLE baseline on the sin-manifold geometry
    def sinRows(ids: Range) = ids.map(i =>
      (i.toLong, (0 until 8).map(j => math.sin(i * 0.7 + j).toFloat))).toDF("vec_id", "embedding")
    val model = IvfIndex.fit(sinRows(0 until 30), "embedding", k = 4)
    val baseline = IvfIndex.meanAssignedCosine(sinRows(100 until 110), "embedding", model)
    val w1 = sinRows(200 until 210) // same distribution — healthy
    val w2 = Seq.tabulate(10) { i => // axis-aligned spikes — a geometry the model never saw
      ((300 + i).toLong, (0 until 8).map(j => if (j == i % 8) 1f else 0.01f))
    }.toDF("vec_id", "embedding")

    val verdicts = scala.collection.mutable.ListBuffer.empty[IvfIndex.Drift]
    val root = graft.core.SessionCache.newTempDir("spec-ivfdrift-root")
    val arrival = graft.core.SessionCache.newTempDir("spec-ivfdrift-src")
    val ckpt = graft.core.SessionCache.newTempDir("spec-ivfdrift-ckpt")
    for (w <- Seq(w1, w2)) {
      w.coalesce(1).write.mode("append").parquet(arrival)
      Streams.ivfPackedMaintainAvailableNow(
        spark.readStream.schema(w1.schema).parquet(arrival),
        "vec_id", "embedding", model, root,
        checkpoint = Some(ckpt),
        driftBaseline = Some(baseline), onDrift = d => verdicts += d)
    }
    assert(verdicts.size == 2, s"expected one verdict per wave, got $verdicts")
    assert(!verdicts(0).refitRecommended,
      s"healthy wave flagged: ${verdicts(0)} (baseline $baseline)")
    assert(verdicts(1).refitRecommended,
      s"shifted wave not flagged: ${verdicts(1)} (baseline $baseline)")
    // the signal NEVER gates: both waves' appends landed regardless
    assert(IvfPackedIndex.readFloat(spark, root).count() == 20)

    // the batch append path carries the same opt-in check
    verdicts.clear()
    IvfPackedIndex.append(w2.select((col("vec_id") + 1000L).as("vec_id"), col("embedding")),
      "vec_id", "embedding", model, root,
      driftBaseline = Some(baseline), onDrift = d => verdicts += d)
    assert(verdicts.size == 1 && verdicts(0).refitRecommended,
      s"batch append drift check: $verdicts")
    assert(IvfPackedIndex.readFloat(spark, root).count() == 30)
  }

  test("quantized probe serves a pre-r17 packed index (no code_norm): margin-only fallback, zero margin refused (r18)") {
    import graft.operators.IvfIndex
    val emb = Seq.tabulate(30) { i =>
      (i.toLong, (0 until 8).map(j => math.sin(i * 0.7 + j).toFloat))
    }.toDF("vec_id", "embedding")
    val model = IvfIndex.fit(emb, "embedding", k = 4)
    val assigned = IvfIndex.buildIndex(emb, "vec_id", "embedding", model)
    // a pre-r18 maintained artifact: packed form without the build-time
    // code_norm column (ADVICE r17 — the unconditional read failed
    // analysis, and compact never backfills the column)
    val legacyPacked = IvfIndex.quantizeIndexPacked(assigned).drop("code_norm")
    val queries = emb.filter(col("vec_id") < 5)
    def sets(df: org.apache.spark.sql.DataFrame) =
      df.select(col("q_id"), col("c_id"), round(col("score"), 6).as("s"))
        .as[(Long, Long, Double)].collect().toSet
    val got = sets(Streams.ivfProbeStreamQuantized(queries, "vec_id", "embedding",
      legacyPacked, assigned, model, threshold = 0.5, nProbe = 2))
    val expected = sets(Streams.ivfProbeStream(queries, "vec_id", "embedding",
      assigned, model, threshold = 0.5, nProbe = 2))
    assert(got == expected && got.nonEmpty,
      s"margin-only fallback diverged: $got vs $expected")
    // with no per-row bound, a zero margin would silently drop true
    // matches — the degenerate config must be refused loudly
    intercept[IllegalArgumentException] {
      Streams.ivfProbeStreamQuantized(queries, "vec_id", "embedding",
        legacyPacked, assigned, model, threshold = 0.5, nProbe = 2, margin = 0.0)
    }
  }

  test("image gate-then-append CLOSES the multimodal loop: wave-2 copy of a wave-1 survivor drops (r18)") {
    import graft.operators.Dedup
    // deterministic distinct payloads: hex-word texts → stride-sampled
    // dHash grids are pseudo-random, so unrelated payloads sit ~32 bits
    // apart while a first-byte flip moves ≤ 1 bit
    def bytesOf(seed: String): Array[Byte] =
      (0 until 8).map(j => java.security.MessageDigest.getInstance("MD5")
        .digest(s"$seed:$j".getBytes("UTF-8")).map("%02x".format(_)).mkString)
        .mkString(" ").getBytes("UTF-8")
    def flip(b: Array[Byte]): Array[Byte] = { val c = b.clone(); c(0) = 'Z'.toByte; c }
    val (a, c, dd) = (bytesOf("A"), bytesOf("C"), bytesOf("D"))

    val idx = graft.core.SessionCache.newTempDir("spec-imgate-idx") + "/idx"
    Dedup.buildBandedDHashIndex(Seq((1L, a)).toDF("id", "bytes"), "id", "bytes", idx,
      maxHamming = 10)
    val arrival = graft.core.SessionCache.newTempDir("spec-imgate-src")
    val ckpt = graft.core.SessionCache.newTempDir("spec-imgate-ckpt")
    val out = graft.core.SessionCache.newTempDir("spec-imgate-out") + "/surv"
    // wave 1: novel C survives, re-encoded copy of indexed A drops;
    // wave 2: copy of C drops ONLY because wave 1 appended C's sig
    val w1 = Seq((10L, c), (11L, flip(a))).toDF("id", "bytes")
    val w2 = Seq((20L, flip(c)), (21L, dd)).toDF("id", "bytes")
    for (w <- Seq(w1, w2)) {
      w.coalesce(1).write.mode("append").parquet(arrival)
      Streams.imageGateMaintainAvailableNow(
        spark.readStream.schema(w1.schema).parquet(arrival),
        "id", "bytes", idx, out, maxHamming = 10, checkpoint = Some(ckpt))
    }
    val got = Streams.readGateOutput(spark, out).select("id").as[Long].collect().toSet
    assert(got == Set(10L, 21L), s"closed-loop survivors: $got")
    // the OPEN loop (index never maintained) would admit #20
    val open = Dedup.imageNearDupIncremental(w2, "id", "bytes",
        Dedup.readBandedDHashFlat(spark, idx).filter(col("id") === 1L), // A's sig only
        maxHamming = 10)
      .select("id").as[Long].collect().toSet
    assert(open == Set(20L, 21L), s"open gate admitted: $open")
  }

  test("image loop's stream-side compactEvery governor: verdict parity, tail folded, compacted index still gates (r20)") {
    import graft.operators.Dedup
    // VERDICT r19 "wrong" #3: the jaccard twin's governor had a spec,
    // the image loop's ran only at the default. Same two-wave corpus as
    // the closed-loop test; compactEvery = 1 folds the tail after every
    // appending batch.
    def bytesOf(seed: String): Array[Byte] =
      (0 until 8).map(j => java.security.MessageDigest.getInstance("MD5")
        .digest(s"$seed:$j".getBytes("UTF-8")).map("%02x".format(_)).mkString)
        .mkString(" ").getBytes("UTF-8")
    def flip(b: Array[Byte]): Array[Byte] = { val c = b.clone(); c(0) = 'Z'.toByte; c }
    val (a, c, dd) = (bytesOf("GA"), bytesOf("GC"), bytesOf("GD"))
    val w1 = Seq((10L, c), (11L, flip(a))).toDF("id", "bytes")
    val w2 = Seq((20L, flip(c)), (21L, dd)).toDF("id", "bytes")

    def runWaves(compactEvery: Int): (Set[Long], Int, String) = {
      val idx = graft.core.SessionCache.newTempDir("spec-imgov-idx") + "/idx"
      Dedup.buildBandedDHashIndex(Seq((1L, a)).toDF("id", "bytes"),
        "id", "bytes", idx, maxHamming = 10)
      val arrival = graft.core.SessionCache.newTempDir("spec-imgov-src")
      val ckpt = graft.core.SessionCache.newTempDir("spec-imgov-ckpt")
      val out = graft.core.SessionCache.newTempDir("spec-imgov-out") + "/surv"
      for (w <- Seq(w1, w2)) {
        w.coalesce(1).write.mode("append").parquet(arrival)
        Streams.imageGateMaintainAvailableNow(
          spark.readStream.schema(w1.schema).parquet(arrival),
          "id", "bytes", idx, out, maxHamming = 10, checkpoint = Some(ckpt),
          compactEvery = compactEvery)
      }
      (Streams.readGateOutput(spark, out).select("id").as[Long].collect().toSet,
        Dedup.bandedTailFileCount(spark, idx), idx)
    }

    val (plain, plainTail, _) = runWaves(compactEvery = 0)
    val (governed, governedTail, gIdx) = runWaves(compactEvery = 1)
    // admitted set is micro-batch-deterministic — the governor may not
    // change a single verdict
    assert(plain == Set(10L, 21L) && governed == plain,
      s"governed $governed vs plain $plain")
    // the ungoverned run accumulates tail files; the governed run folds
    // them inside the loop
    assert(plainTail == 2, s"ungoverned tail files: $plainTail")
    assert(governedTail == 0, s"governed tail not folded: $governedTail")
    // and the compacted index still gates: a re-delivery of every
    // survivor (indexed A + admitted C and D) drops; a novel asset passes
    val probe = Seq((30L, flip(a)), (31L, flip(c)), (32L, flip(dd)),
        (33L, bytesOf("GN"))).toDF("id", "bytes")
    val admitted = Dedup.imageNearDupIncrementalBanded(probe, "id", "bytes",
      gIdx, maxHamming = 10).select("id").as[Long].collect().toSet
    assert(admitted == Set(33L), s"post-governor gate admitted: $admitted")
  }

  /** Remove batch 0's checkpoint commit marker (and its local-FS `.crc`
    * checksum sibling, which would otherwise fail the replay's rename)
    * so the next restart reconstructs batch 0 from the offset log and
    * reprocesses it — the crash-between-append-and-offset-commit window.
    */
  private def deleteCommitMarker(ckpt: String): Unit = {
    val marker = new java.io.File(s"$ckpt/commits/0")
    assert(marker.exists, "checkpoint layout drift: commits/0 missing")
    assert(marker.delete())
    val crc = new java.io.File(s"$ckpt/commits/.0.crc")
    if (crc.exists) assert(crc.delete())
  }

  test("crash-replay of a committed batch preserves the sink's real survivors (r20; ADVICE r19 high)") {
    import graft.operators.Dedup
    // THE ADVICE r19 HIGH WINDOW: the first attempt commits the index
    // append, then crashes BEFORE the checkpoint's batch-commit marker.
    // The replay's committed-only index read now contains the batch's
    // own postings — jaccard self-similarity 1.0 — so every true
    // survivor self-gates away, and the pre-fix unconditional sink
    // overwrite replaced the real survivors with an empty partition.
    // Simulated faithfully: drain once (offsets/0 + commits/0 + the
    // index epoch all land), delete commits/0, drain again — Spark
    // reconstructs batch 0 from the offset log and reprocesses it.
    def df(rows: (Long, String)*) = rows.toDF("doc_id", "text")
    val indexed = df(1L -> "red fox jumps over lazy dog tonight")
    val w1 = df(10L -> "alpha beta gamma delta epsilon zeta",
                11L -> "red fox jumps over lazy dog today")
    val idx = graft.core.SessionCache.newTempDir("spec-replay-idx")
    val arrival = graft.core.SessionCache.newTempDir("spec-replay-src")
    val ckpt = graft.core.SessionCache.newTempDir("spec-replay-ckpt")
    val out = graft.core.SessionCache.newTempDir("spec-replay-out") + "/surv"
    Dedup.buildPostingsIndex(indexed, "doc_id", "text", n = 2, idx)
    w1.coalesce(1).write.mode("append").parquet(arrival)
    def drain(): Unit = Streams.jaccardGateMaintainAvailableNow(
      spark.readStream.schema(w1.schema).parquet(arrival),
      "doc_id", "text", n = 2, threshold = 0.2, idx, out,
      checkpoint = Some(ckpt))
    def survivors(): Set[Long] = Streams.readGateOutput(spark, out)
      .select("doc_id").as[Long].collect().toSet

    drain()
    assert(survivors() == Set(10L), s"first drain: ${survivors()}")
    assert(graft.store.EpochCommit.committedCount(spark, idx) == 2,
      "build + one append expected before the replay")

    deleteCommitMarker(ckpt)
    drain()
    assert(survivors() == Set(10L),
      s"replay clobbered the real survivors: ${survivors()}")
    // and the index side stayed exactly-once: the replay's empty
    // survivor set never re-appends (deterministic epoch unchanged)
    assert(graft.store.EpochCommit.committedCount(spark, idx) == 2,
      "replay duplicated the postings append")

    // the IMAGE twin shares writeGateSinkPartition — same window, same
    // guarantee (dHash self-distance 0 re-gates the replay to empty)
    def bytesOf(seed: String): Array[Byte] =
      (0 until 8).map(j => java.security.MessageDigest.getInstance("MD5")
        .digest(s"$seed:$j".getBytes("UTF-8")).map("%02x".format(_)).mkString)
        .mkString(" ").getBytes("UTF-8")
    val (ia, ic) = (bytesOf("RP-A"), bytesOf("RP-C"))
    val iIdx = graft.core.SessionCache.newTempDir("spec-replayimg-idx") + "/idx"
    Dedup.buildBandedDHashIndex(Seq((1L, ia)).toDF("id", "bytes"),
      "id", "bytes", iIdx, maxHamming = 10)
    val iArrival = graft.core.SessionCache.newTempDir("spec-replayimg-src")
    val iCkpt = graft.core.SessionCache.newTempDir("spec-replayimg-ckpt")
    val iOut = graft.core.SessionCache.newTempDir("spec-replayimg-out") + "/surv"
    val iw = Seq((10L, ic), (11L, ia)).toDF("id", "bytes")
    iw.coalesce(1).write.mode("append").parquet(iArrival)
    def iDrain(): Unit = Streams.imageGateMaintainAvailableNow(
      spark.readStream.schema(iw.schema).parquet(iArrival),
      "id", "bytes", iIdx, iOut, maxHamming = 10, checkpoint = Some(iCkpt))
    iDrain()
    deleteCommitMarker(iCkpt)
    iDrain()
    val iGot = Streams.readGateOutput(spark, iOut).select("id").as[Long].collect().toSet
    assert(iGot == Set(10L), s"image replay clobbered the survivors: $iGot")
  }

  test("replay guard is the _SUCCESS marker: partial self-gating preserved, crashed writes healed (r20 review)") {
    import graft.operators.Dedup
    def df(rows: (Long, String)*) = rows.toDF("doc_id", "text")

    // CASE 1 — PARTIAL self-gating: a survivor contributing no postings
    // (one token, n=2 → zero shingles) never self-matches, so the replay
    // re-verdict is NON-empty ({B} alone) and the old emptiness guard
    // would overwrite the committed {A, B} with just {B}. The marker
    // guard skips any committed partition regardless of verdict shape.
    val idx = graft.core.SessionCache.newTempDir("spec-replay2-idx")
    Dedup.buildPostingsIndex(
      df(1L -> "red fox jumps over lazy dog tonight"), "doc_id", "text", n = 2, idx)
    val arrival = graft.core.SessionCache.newTempDir("spec-replay2-src")
    val ckpt = graft.core.SessionCache.newTempDir("spec-replay2-ckpt")
    val out = graft.core.SessionCache.newTempDir("spec-replay2-out") + "/surv"
    df(10L -> "alpha beta gamma delta epsilon zeta", 11L -> "solitarytoken")
      .coalesce(1).write.mode("append").parquet(arrival)
    def drain(): Unit = Streams.jaccardGateMaintainAvailableNow(
      spark.readStream.schema(df().schema).parquet(arrival),
      "doc_id", "text", n = 2, threshold = 0.2, idx, out,
      checkpoint = Some(ckpt))
    def survivors(): Set[Long] = Streams.readGateOutput(spark, out)
      .select("doc_id").as[Long].collect().toSet
    drain()
    assert(survivors() == Set(10L, 11L), s"first drain: ${survivors()}")
    deleteCommitMarker(ckpt)
    drain() // replay: 10 self-gates, 11 re-survives (no shingles) — non-empty
    assert(survivors() == Set(10L, 11L),
      s"partial self-gating replay clobbered a committed survivor: ${survivors()}")

    // CASE 2 — CRASHED first write: a partition husk without _SUCCESS
    // (data files never committed). The old guard skipped any existing
    // dir on an empty re-verdict, leaving a footer-less sink that breaks
    // readGateOutput forever; the marker guard rewrites it.
    val idx2 = graft.core.SessionCache.newTempDir("spec-replay3-idx")
    Dedup.buildPostingsIndex(
      df(1L -> "red fox jumps over lazy dog tonight"), "doc_id", "text", n = 2, idx2)
    val arrival2 = graft.core.SessionCache.newTempDir("spec-replay3-src")
    val ckpt2 = graft.core.SessionCache.newTempDir("spec-replay3-ckpt")
    val out2 = graft.core.SessionCache.newTempDir("spec-replay3-out") + "/surv"
    // the whole batch is a near-copy of the indexed doc: verdict empty
    df(20L -> "red fox jumps over lazy dog today")
      .coalesce(1).write.mode("append").parquet(arrival2)
    def drain2(): Unit = Streams.jaccardGateMaintainAvailableNow(
      spark.readStream.schema(df().schema).parquet(arrival2),
      "doc_id", "text", n = 2, threshold = 0.2, idx2, out2,
      checkpoint = Some(ckpt2))
    drain2()
    assert(Streams.readGateOutput(spark, out2).isEmpty) // empty WITH footer
    // simulate the crash: strip the partition to a bare husk (no
    // _SUCCESS, no data files), then replay the batch
    val part = new java.io.File(out2).listFiles().filter(_.getName.startsWith("batch="))
    assert(part.length == 1, s"expected one batch partition: ${part.mkString(",")}")
    part(0).listFiles().foreach(f => assert(f.delete(), s"could not strip $f"))
    deleteCommitMarker(ckpt2)
    drain2()
    assert(Streams.readGateOutput(spark, out2).isEmpty,
      "crashed-write replay did not restore a schema-readable sink")
  }

  test("all-duplicates day: the gate sink stays schema-readable when every row drops (r19)") {
    import graft.operators.Dedup
    // the ADVICE r18 break: the sink dir appeared only on the first
    // SURVIVOR write, so a run whose every batch gated away failed the
    // documented readGateOutput with schema-inference AnalysisException
    def bytesOf(seed: String): Array[Byte] =
      (0 until 8).map(j => java.security.MessageDigest.getInstance("MD5")
        .digest(s"$seed:$j".getBytes("UTF-8")).map("%02x".format(_)).mkString)
        .mkString(" ").getBytes("UTF-8")
    val (a, b) = (bytesOf("AD1"), bytesOf("AD2"))
    val idx = graft.core.SessionCache.newTempDir("spec-adup-idx") + "/idx"
    Dedup.buildBandedDHashIndex(Seq((1L, a), (2L, b)).toDF("id", "bytes"),
      "id", "bytes", idx, maxHamming = 10)
    val arrival = graft.core.SessionCache.newTempDir("spec-adup-src")
    val ckpt = graft.core.SessionCache.newTempDir("spec-adup-ckpt")
    val out = graft.core.SessionCache.newTempDir("spec-adup-out") + "/surv"
    // exact copies of indexed assets: the whole wave drops
    val w1 = Seq((10L, a), (11L, b)).toDF("id", "bytes")
    w1.coalesce(1).write.mode("append").parquet(arrival)
    Streams.imageGateMaintainAvailableNow(
      spark.readStream.schema(w1.schema).parquet(arrival),
      "id", "bytes", idx, out, maxHamming = 10, checkpoint = Some(ckpt))
    val got = Streams.readGateOutput(spark, out)
    assert(got.columns.toSeq == Seq("id", "bytes"), got.columns.toSeq.toString)
    assert(got.count() == 0)
    // and the index gained nothing (all-dropped batches never touch it)
    assert(Dedup.readBandedDHashFlat(spark, idx).count() == 2)
    // a sink the maintainer never created at all is LOUD, not inference noise
    val e = intercept[graft.core.EngineError](
      Streams.readGateOutput(spark, out + "-never-ran"))
    assert(e.getMessage.contains("does not exist"), e.getMessage)
  }

  test("streaming packed-IVF maintenance: drained index == batch build; governor compacts (r17)") {
    import graft.operators.{IvfIndex, IvfPackedIndex}
    val emb = Seq.tabulate(40) { i =>
      (i.toLong, (0 until 8).map(j => math.sin(i * 0.7 + j).toFloat))
    }.toDF("vec_id", "embedding")
    val model = IvfIndex.fit(emb, "embedding", k = 4)
    val q = (0 until 8).map(j => math.cos(j * 0.3).toFloat).toArray

    val root = graft.core.SessionCache.newTempDir("spec-ivfpm-root")
    val arrival = graft.core.SessionCache.newTempDir("spec-ivfpm-src")
    val ckpt = graft.core.SessionCache.newTempDir("spec-ivfpm-ckpt")
    for (w <- Seq(emb.filter(col("vec_id") < 20), emb.filter(col("vec_id") >= 20))) {
      w.coalesce(1).write.mode("append").parquet(arrival)
      // works from an EMPTY root: the stream is the builder
      Streams.ivfPackedMaintainAvailableNow(
        spark.readStream.schema(emb.schema).parquet(arrival),
        "vec_id", "embedding", model, root,
        compactEvery = 2, checkpoint = Some(ckpt))
    }
    def probed(df: org.apache.spark.sql.DataFrame): Seq[(Long, Double)] =
      df.select(col("id").cast("long"), round(col("score"), 9).as("s"))
        .as[(Long, Double)].collect().toSeq
    val served = probed(IvfPackedIndex.queryTopK(spark, root, model, q, 5, 2))
    val assigned = IvfIndex.buildIndex(emb, "vec_id", "embedding", model)
    val fresh = probed(IvfIndex.queryTopKPackedRerank(
      IvfIndex.quantizeIndexPacked(assigned), assigned, model, q, 5, 2))
    assert(served == fresh, s"stream-maintained $served vs batch rebuild $fresh")
    assert(IvfPackedIndex.readFloat(spark, root).count() == 40)
    assert(graft.store.EpochCommit.committedCount(spark, root) == 1,
      "compactEvery=2 governor did not fold the epoch fan-in")
  }
}
