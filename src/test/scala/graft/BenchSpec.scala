package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench artifact must stay ONE valid JSON line even when a query
  * errors (ADVICE r6: Spark exception messages contain newlines) and the
  * canaries must measure what they claim.
  */
class BenchSpec extends AnyFunSuite {

  test("jsonEscape neutralizes every control character and JSON metachar") {
    val nasty = "line1\nline2\r\ttab \"quoted\" back\\slash " + 1.toChar + 31.toChar + " end"
    val esc = Bench.jsonEscape(nasty)
    // no raw control chars survive
    assert(esc.forall(c => c >= 0x20), s"raw control char in: $esc")
    // the canonical escapes are present
    assert(esc.contains("\\n") && esc.contains("\\r") && esc.contains("\\t"))
    assert(esc.contains("\\\"") && esc.contains("\\\\"))
    assert(esc.contains("\\u0001") && esc.contains("\\u001f"))
    // embedding it in a JSON string yields a single line
    val line = s"""{"errors":{"q":"$esc"}}"""
    assert(!line.contains('\n') && !line.contains('\r'))
  }

  test("jsonEscape is the identity on plain ASCII text") {
    val plain = "ArithmeticException: divide by zero (stage 3.0)"
    assert(Bench.jsonEscape(plain) == plain)
  }

  test("compactQueriesJson packs slowest-first within budget and stays valid JSON") {
    val rows = (1 to 147).map(i => f"query_name_number_$i%03d" -> i * 0.01).toMap
    val js = Bench.compactQueriesJson(rows, 1500)
    assert(js.length <= 1500, s"over budget: ${js.length}")
    // valid JSON object
    val parsed = org.json4s.jackson.JsonMethods.parse(js)
    val fields = parsed.asInstanceOf[org.json4s.JObject].obj
    // strictly more coverage than the r14 fixed top-8, slowest rows first
    assert(fields.size > 8, s"only ${fields.size} rows packed")
    assert(fields.head._1 == "query_name_number_147")
    val names = fields.map(_._1).toSet
    (147 to 140 by -1).foreach(i => assert(names.contains(f"query_name_number_$i%03d")))
    // tiny budget still yields a valid (possibly empty) object, never a cut
    assert(Bench.compactQueriesJson(rows, 10) == "{}")
  }

  test("parallel canary runs the fixed work on every thread (wall >= ~1 unit)") {
    // With 2 threads the wall-clock must be at least one unit of the
    // single-thread work (both threads genuinely execute the loop); a
    // broken impl that forgets to join or runs nothing returns ~0.
    val par = Bench.canaryParSeconds(2)
    assert(par > 0.05, s"parallel canary finished suspiciously fast: $par s")
  }
}
