package graft

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** The bench's pass-3 retime reference (VERDICT r20 "What's wrong" #2):
  * the yardstick must be the rolling per-query BEST-KNOWN minimum, not
  * last round's possibly-contended artifact — a contended sweep must
  * never become the reference that hides the next contended sweep. */
class BenchRefSpec extends AnyFunSuite {

  private def artifact(sf: String, qs: (String, Double)*): String = {
    val dir = Files.createTempDirectory("bench-ref-spec")
    val body = qs.map { case (k, v) => s""""$k":$v""" }.mkString(",")
    val p = dir.resolve("a.json")
    Files.write(p,
      s"""{"metric":"total","value":1,"queries":{$body},"sf":"$sf"}"""
        .getBytes(StandardCharsets.UTF_8))
    p.toString
  }

  test("parse reads per-query steady times for the matching sf") {
    val p = artifact("/sf0.1", "q_a" -> 1.5, "q_b" -> 0.25)
    assert(Bench.parseBenchQueries(p, "/sf0.1") ===
      Map("q_a" -> 1.5, "q_b" -> 0.25))
  }

  test("parse refuses a different-sf artifact (mass-retime guard)") {
    val p = artifact("/sf0.01", "q_a" -> 1.5)
    assert(Bench.parseBenchQueries(p, "/sf0.1").isEmpty)
  }

  test("parse drops errored (-1) entries and survives a missing file") {
    val p = artifact("/sf0.1", "q_ok" -> 2.0, "q_err" -> -1.0)
    assert(Bench.parseBenchQueries(p, "/sf0.1") === Map("q_ok" -> 2.0))
    assert(Bench.parseBenchQueries("/nonexistent/x.json", "/sf0.1").isEmpty)
  }

  test("a contended previous artifact cannot raise the yardstick") {
    // round N-1 ran contended (q_a inflated 6x); the rolling best still
    // carries the quiet number — the merged reference keeps the minimum,
    // so a 5x steady time in round N reads as suspect and retimes
    val contendedPrev = Map("q_a" -> 12.5, "q_b" -> 0.30)
    val rollingBest = Map("q_a" -> 2.1)
    val ref = Bench.minMerge(contendedPrev, rollingBest)
    assert(ref("q_a") === 2.1) // not 12.5
    assert(ref("q_b") === 0.30) // prev-only queries still covered
    val steady = 10.0
    assert(steady >= 2 * ref("q_a"), "inflated steady must trip the retime")
  }

  test("min-merge ratchets down, never up") {
    val best = Map("q_a" -> 2.0, "q_b" -> 1.0)
    val run = Map("q_a" -> 1.5, "q_b" -> 4.0, "q_new" -> 0.7)
    val merged = Bench.minMerge(best, run)
    assert(merged === Map("q_a" -> 1.5, "q_b" -> 1.0, "q_new" -> 0.7))
  }
}
