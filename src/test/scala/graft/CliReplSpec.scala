package graft

import java.io.{BufferedReader, ByteArrayOutputStream, StringReader}

import graft.operators.HashingEmbedder
import graft.store.GraftStore

/** The interactive session (the reference UI's counterpart): a scripted
  * command stream drives the repl loop end-to-end against a real store —
  * add, query-family, browse, manage — and error recovery keeps the
  * session alive where the one-shot CLI exits.
  */
class CliReplSpec extends SparkSpec {

  private def runScript(script: String, store: GraftStore): String = {
    val out = new ByteArrayOutputStream()
    Console.withOut(out) {
      Cli.repl(store, new BufferedReader(new StringReader(script)))
    }
    out.toString("UTF-8")
  }

  test("scripted session: add / search / phrase / stats / delete drive one live store") {
    val dir = java.nio.file.Files.createTempDirectory("graft-repl")
      .resolve("docs.parquet").toString
    val store = new GraftStore(spark, dir, HashingEmbedder(16))
    val out = runScript(
      """add "ducks like ponds and bread"
        |add "spark shuffles partitions"
        |search ponds 3
        |phrase "ponds and" 3
        |stats
        |delete 1
        |delete 1
        |stats
        |quit""".stripMargin, store)
    assert(out.contains("Document added with ID: 1"), out)
    assert(out.contains("Document added with ID: 2"), out)
    assert(out.contains("id=1") && out.contains("ducks"), out) // search hit
    assert(out.contains("hits=1 first_pos=3"), out)            // phrase hit
    assert(out.contains("Documents: 2"), out)
    assert(out.contains("Deleted document 1"), out)
    assert(out.contains("Documents: 1"), out) // session continued past the
                                              // failed second delete
    assert(store.countDocuments() == 1L)
  }

  test("stats surfaces attached-index epoch counts and stray markers (r17)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-repl-idx")
      .resolve("docs.parquet").toString
    val store = new GraftStore(spark, dir, HashingEmbedder(16))
    store.insert("ducks like ponds")
    store.insert("spark shuffles partitions")
    // no attached indexes yet: stats prints only the parity line
    assert(!runScript("stats\nquit", store).contains("Index "), "phantom index row")
    // attach a bm25 index at the conventional root and append once
    val bm25 = s"${store.indexRoot}/bm25"
    graft.operators.IndexedBm25.build(store.table(), "id", "text", bm25)
    graft.operators.IndexedBm25.append(
      store.table().filter(org.apache.spark.sql.functions.col("id") === 2L),
      "id", "text", bm25)
    val out = runScript("stats\nquit", store)
    assert(out.contains("Documents: 2"), out)
    assert(out.contains("Index bm25: 2 committed epoch(s)"), out)
    assert(!out.contains("STRAY"), out)
    assert(store.indexStats() == Seq(("bm25", 2, 0)))
    // a foreign marker is SURFACED next to the count, never swallowed
    val strayP = new org.apache.hadoop.fs.Path(s"$bm25/epochs/_editor.tmp")
    strayP.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .create(strayP, false).close()
    val out2 = runScript("stats\nquit", store)
    assert(out2.contains("Index bm25: 2 committed epoch(s)  STRAY MARKERS: 1"), out2)
  }

  test("stats surfaces the maintainer's persisted drift verdict; silent while healthy (r19)") {
    import spark.implicits._
    import graft.operators.{IvfIndex, IvfPackedIndex}
    val dir = java.nio.file.Files.createTempDirectory("graft-repl-drift")
      .resolve("docs.parquet").toString
    val store = new GraftStore(spark, dir, HashingEmbedder(16))
    store.insert("one doc so stats has a store line")
    // clustered corpus (the IndexAppendSpec drift recipe): 2 tight
    // clusters around axes, deterministic arithmetic noise
    def cluster(axis: Int, ids: Range): Seq[(Long, Seq[Float])] =
      ids.map { i =>
        (i.toLong, (0 until 16).map(d =>
          (if (d == axis) 1.0f else 0.0f) + ((i * 31 + d * 7) % 11 - 5) / 100.0f))
      }
    val corpus = (cluster(0, 0 until 30) ++ cluster(1, 30 until 60))
      .toDF("vec_id", "embedding")
    val heldOut = cluster(0, 200 until 220).toDF("vec_id", "embedding")
    val model = IvfIndex.fit(corpus, "embedding", k = 2)
    val baseline = IvfIndex.meanAssignedCosine(heldOut, "embedding", model)
    val root = s"${store.indexRoot}/ivfpacked"
    IvfPackedIndex.build(corpus, "vec_id", "embedding", model, root)

    // healthy checked wave: verdict recorded, NOTHING surfaced (no
    // behavior change for an undegraded index)
    IvfPackedIndex.append(cluster(1, 300 until 320).toDF("vec_id", "embedding"),
      "vec_id", "embedding", model, root, driftBaseline = Some(baseline))
    val healthy = runScript("stats\nquit", store)
    assert(healthy.contains("Index ivfpacked: 2 committed epoch(s)"), healthy)
    assert(!healthy.contains("DRIFT"), healthy)

    // shifted wave: the append still lands (signal-never-gate) AND the
    // verdict reaches the operator surface beside the epoch health
    IvfPackedIndex.append(cluster(9, 400 until 420).toDF("vec_id", "embedding"),
      "vec_id", "embedding", model, root, driftBaseline = Some(baseline))
    assert(IvfPackedIndex.readFloat(spark, root).count() == 100)
    val out = runScript("stats\nquit", store)
    assert(out.contains("Index ivfpacked DRIFT: 1 degraded batch(es)"), out)
    assert(out.contains("refit recommended"), out)

    // the health record survives a compact's dir swap
    IvfPackedIndex.compact(spark, root)
    val out2 = runScript("stats\nquit", store)
    assert(out2.contains("DRIFT: 1 degraded"), out2)

    // a CORRUPT health record must not break the stats surface: epoch
    // health still prints, the drift line is simply absent (the record
    // is observability, not a correctness gate)
    val dp = new org.apache.hadoop.fs.Path(s"$root/_drift")
    val fs = dp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val o = fs.create(dp, true)
    try o.write("degradedBatches=notanumber\n".getBytes("UTF-8")) finally o.close()
    val out3 = runScript("stats\nquit", store)
    assert(out3.contains("Index ivfpacked: 1 committed epoch(s)"), out3)
    assert(!out3.contains("DRIFT"), out3)
  }

  test("stats surfaces drift from the PLAIN (float-only) IVF append path too (r20)") {
    import spark.implicits._
    import graft.operators.IvfIndex
    // VERDICT r19 "missing" #3: the `_drift` record persisted only on
    // the packed family — a deployment serving the float-only index got
    // a stderr line, never the stats surface. Same clustered-corpus
    // recipe as the packed test, through IvfIndex.appendToIndex.
    val dir = java.nio.file.Files.createTempDirectory("graft-repl-fdrift")
      .resolve("docs.parquet").toString
    val store = new GraftStore(spark, dir, HashingEmbedder(16))
    store.insert("one doc so stats has a store line")
    def cluster(axis: Int, ids: Range): Seq[(Long, Seq[Float])] =
      ids.map { i =>
        (i.toLong, (0 until 16).map(d =>
          (if (d == axis) 1.0f else 0.0f) + ((i * 31 + d * 7) % 11 - 5) / 100.0f))
      }
    val corpus = (cluster(0, 0 until 30) ++ cluster(1, 30 until 60))
      .toDF("vec_id", "embedding")
    val model = IvfIndex.fit(corpus, "embedding", k = 2)
    val baseline = IvfIndex.meanAssignedCosine(
      cluster(0, 200 until 220).toDF("vec_id", "embedding"), "embedding", model)
    val root = s"${store.indexRoot}/ivffloat"
    IvfIndex.writeIndex(IvfIndex.buildIndex(corpus, "vec_id", "embedding", model), root)

    // healthy checked wave: verdict recorded, nothing surfaced
    IvfIndex.appendToIndex(cluster(1, 300 until 320).toDF("vec_id", "embedding"),
      root, "vec_id", "embedding", model, driftBaseline = Some(baseline))
    val healthy = runScript("stats\nquit", store)
    assert(!healthy.contains("DRIFT"), healthy)

    // shifted wave: the append lands (signal-never-gate) AND the verdict
    // reaches the same stats surface the packed family feeds
    IvfIndex.appendToIndex(cluster(9, 400 until 420).toDF("vec_id", "embedding"),
      root, "vec_id", "embedding", model, driftBaseline = Some(baseline))
    assert(IvfIndex.readIndex(spark, root).count() == 100)
    val out = runScript("stats\nquit", store)
    assert(out.contains("Index ivffloat DRIFT: 1 degraded batch(es)"), out)
    assert(out.contains("refit recommended"), out)
  }

  test("error recovery: bad verbs and verb errors never end the session") {
    val dir = java.nio.file.Files.createTempDirectory("graft-repl2")
      .resolve("docs.parquet").toString
    val store = new GraftStore(spark, dir, HashingEmbedder(16))
    val out = runScript(
      """nonsense-verb
        |add "   "
        |query ok 0
        |add "still alive after three failures"
        |stats
        |exit""".stripMargin, store)
    assert(out.contains("Error:"), out)             // validation error printed
    assert(out.contains("Document added with ID: 1"), out)
    assert(out.contains("Documents: 1"), out)
  }

  test("tokenizeLine: quote grouping, collapsed whitespace, empties") {
    assert(Cli.tokenizeLine("""add "two words" k=v""") ==
      Seq("add", "two words", "k=v"))
    assert(Cli.tokenizeLine("  a   b  ") == Seq("a", "b"))
    assert(Cli.tokenizeLine("") == Seq.empty)
    assert(Cli.tokenizeLine("\"\"") == Seq.empty) // bare quotes add nothing
  }
}
