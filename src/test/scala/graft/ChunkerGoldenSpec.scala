package graft

import org.apache.spark.sql.functions._

import graft.operators.Chunker

/** Golden parity with the REFERENCE chunker: the fixture
  * `src/test/resources/chunker_golden.json` was produced by executing the
  * reference's own `chunk_text` (`/root/reference/vectolite.py:369-409`,
  * extracted standalone) over 15 adversarial inputs — boundary `+2`
  * packing, overlap ≥/=/< current length, empty paragraphs, trims, long
  * single paragraphs, chained overlaps. The Scala port must match
  * byte-for-byte on every case.
  */
class ChunkerGoldenSpec extends SparkSpec {
  import spark.implicits._

  test("chunkText matches the reference implementation on all golden cases") {
    val path = getClass.getResource("/chunker_golden.json").toString
    val golden = spark.read.json(path)
      .select("input", "maxChars", "overlap", "chunks")
      .as[(String, Long, Long, Seq[String])]
      .collect()
    assert(golden.length == 15)
    golden.zipWithIndex.foreach { case ((input, maxChars, overlap, expected), i) =>
      val got = Chunker.chunkText(input, maxChars.toInt, overlap.toInt)
      assert(got == expected,
        s"case $i diverged (maxChars=$maxChars overlap=$overlap): got ${got.map(_.length)} vs ${expected.map(_.length)}")
    }
  }

  test("chunkText matches the reference on 200 FUZZED cases (random paragraph soups)") {
    val path = getClass.getResource("/chunker_fuzz_golden.json").toString
    val fuzz = spark.read.json(path)
      .select("input", "maxChars", "overlap", "chunks")
      .collect()
    assert(fuzz.length == 200)
    fuzz.zipWithIndex.foreach { case (r, i) =>
      val input = r.getString(0)
      val expected = Option(r.getSeq[String](3)).getOrElse(Seq.empty)
      val got = Chunker.chunkText(input, r.getLong(1).toInt, r.getLong(2).toInt)
      assert(got == expected, s"fuzz case $i (maxChars=${r.getLong(1)} overlap=${r.getLong(2)})")
    }
  }

  test("explodeChunks agrees with the pure function on golden inputs") {
    val path = getClass.getResource("/chunker_golden.json").toString
    val golden = spark.read.json(path)
      .select("input").as[String].collect().toSeq.zipWithIndex
    val df = golden.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val exploded = Chunker.explodeChunks(df, "text", maxChars = 60, overlap = 15)
      .select("id", "chunk_index", "chunk").as[(Long, Int, String)]
      .collect().groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    golden.foreach { case (t, i) =>
      val expect = Chunker.chunkText(t, 60, 15)
      assert(exploded.getOrElse(i.toLong, Seq.empty) == expect, s"row $i")
    }
  }
}
