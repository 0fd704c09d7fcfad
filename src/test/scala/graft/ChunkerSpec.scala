package graft

import org.apache.spark.sql.functions._

import graft.operators.Chunker

/** Pins the chunker to the reference algorithm's edge cases
  * (`/root/reference/vectolite.py:369-409`, SURVEY §5.2).
  */
class ChunkerSpec extends SparkSpec {
  import spark.implicits._

  test("empty / whitespace-only input → no chunks (vectolite.py:380-381)") {
    assert(Chunker.chunkText("") == Seq.empty)
    assert(Chunker.chunkText("   \n\n  \t ") == Seq.empty)
    assert(Chunker.chunkText(null) == Seq.empty)
  }

  test("single paragraph fits → one chunk, trimmed") {
    assert(Chunker.chunkText("  hello world  ", 100, 10) == Seq("hello world"))
  }

  test("single paragraph LONGER than maxChars is never split (greedy packs whole paragraphs)") {
    val para = "x" * 500
    assert(Chunker.chunkText(para, 100, 10) == Seq(para))
  }

  test("lengths are CODEPOINTS, not UTF-16 units (Python len parity on emoji)") {
    // 8 non-BMP chars = 8 codepoints but 16 UTF-16 units. Budget 12:
    // 1 + 8 + 2 = 11 <= 12 under codepoint counting → one packed chunk;
    // UTF-16 counting (1+16+2=19) would wrongly flush.
    val emo = "😀" * 8 // 😀 × 8
    assert(Chunker.chunkText(s"a\n\n$emo", 12, 0) == Seq(s"a\n\n$emo"))
    // Overlap slice counts codepoints and never splits a surrogate pair:
    // current = 5 emoji (5 cp), overlap 3 → seed is the LAST 3 EMOJI
    // (6 UTF-16 units), not 3 units cutting a pair in half.
    val five = "😀" * 5
    val next = "b" * 8
    val out = Chunker.chunkText(s"$five\n\n$next", 10, 3)
    assert(out == Seq(five, "😀" * 3 + "\n\n" + next))
  }

  test("greedy packing: paragraphs joined by blank line while fitting (+2 for the joiner)") {
    // a=40, b=40: 40+40+2=82 > 80 → flush; with joiner budget 84 they pack.
    val a = "a" * 40; val b = "b" * 40
    assert(Chunker.chunkText(s"$a\n\n$b", 84, 0) == Seq(s"$a\n\n$b"))
    assert(Chunker.chunkText(s"$a\n\n$b", 80, 0) == Seq(a, b))
  }

  test("overlap seeds the next chunk ONLY when len(current) > overlap (vectolite.py:395)") {
    val a = "a" * 30; val b = "b" * 30
    // overlap 10 < len(a)=30 → next chunk starts with a's 10-char tail.
    val withOverlap = Chunker.chunkText(s"$a\n\n$b", 40, 10)
    assert(withOverlap == Seq(a, "a" * 10 + "\n\n" + b))
    // overlap 50 >= len(a)=30 → no seeding, next chunk is just b.
    val noSeed = Chunker.chunkText(s"$a\n\n$b", 40, 50)
    assert(noSeed == Seq(a, b))
  }

  test("multiple flushes keep every paragraph, in order") {
    val paras = (1 to 8).map(i => s"para$i " * 5)
    val chunks = Chunker.chunkText(paras.mkString("\n\n"), 80, 0)
    assert(chunks.nonEmpty)
    val joined = chunks.mkString("\n\n")
    paras.foreach(p => assert(joined.contains(p.trim)))
  }

  test("explodeChunks keeps the source column and bookkeeping is consistent") {
    val df = Seq((1L, "p1\n\np2\n\np3"), (2L, "   ")).toDF("id", "text")
    val out = Chunker.explodeChunks(df, "text", maxChars = 4, overlap = 0)
    assert(out.columns.contains("text")) // not dropped (ADVICE r2 #5)
    val rows = out.select("id", "chunk_index", "total_chunks", "chunk")
      .as[(Long, Int, Int, String)].collect().sortBy(r => (r._1, r._2))
    assert(rows.map(_._1).forall(_ == 1L)) // whitespace row produced nothing
    assert(rows.map(_._2).toSeq == Seq(0, 1, 2))
    assert(rows.forall(_._3 == 3))
    assert(rows.map(_._4).toSeq == Seq("p1", "p2", "p3"))
  }

  test("explodeChunks output column names are remappable") {
    val df = Seq((1L, "a\n\nb")).toDF("id", "text")
    val out = Chunker.explodeChunks(df, "text", 1, 0,
      chunkCol_ = "piece", indexCol = "ix", totalCol = "n")
    assert(Seq("piece", "ix", "n").forall(out.columns.contains))
  }
}
