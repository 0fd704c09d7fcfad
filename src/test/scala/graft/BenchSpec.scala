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

  test("parallel canary runs the fixed work on every thread (wall >= ~1 unit)") {
    // With 2 threads the wall-clock must be at least one unit of the
    // single-thread work (both threads genuinely execute the loop); a
    // broken impl that forgets to join or runs nothing returns ~0.
    val par = Bench.canaryParSeconds(2)
    assert(par > 0.05, s"parallel canary finished suspiciously fast: $par s")
  }
}
