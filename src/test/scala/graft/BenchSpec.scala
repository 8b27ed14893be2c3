package graft

import org.scalatest.funsuite.AnyFunSuite

/** The DRIFT-REFERENCE parser contract (round-18 verdict item 4):
  * [[Bench.parseDriftReference]] is the one place in the gate where a
  * format change would SILENTLY disable the drift watch — a parse miss
  * just yields an empty map, the leg goes inert, and
  * `drift_ref_queries:0` is the only tell. These specs round-trip a
  * real committed BENCH_DETAIL.json plus synthetic artifacts through
  * the parser so the contract is pinned instead of assumed: full
  * coverage on the real artifact, guards firing on sf/cpus/comparable
  * mismatch, lenience on unknown future fields, and empty-map (inert
  * leg, never a crash) on a mangled artifact. */
class BenchSpec extends AnyFunSuite {

  private val synth =
    """{"metric":"total","value":1.75,"unit":"sec","runs_per_query":3,""" +
      """"future_field":{"nested":true},""" +
      """"queries":{"q_a":0.5,"q_b":1.25},""" +
      """"comparable":true,"cpus":16,"sf":"/data/sf9","total_check":1.75}"""

  test("a valid artifact parses to the full per-query map (future fields tolerated)") {
    val m = Bench.parseDriftReference(synth, "/data/sf9", "16")
    assert(m == Map("q_a" -> 0.5, "q_b" -> 1.25))
  }

  test("config guards: sf or cpus mismatch disables the drift leg") {
    assert(Bench.parseDriftReference(synth, "/data/sf8", "16").isEmpty,
      "an sf-mismatched reference would mass-flag every query as drifted")
    assert(Bench.parseDriftReference(synth, "/data/sf9", "32").isEmpty,
      "a cpus-mismatched reference is another machine-config's timings")
    // a pre-round-18 artifact carries no cpus stamp — it must still
    // parse (the guard applies only when the field is present)
    val noCpus = synth.replace(""""cpus":16,""", "")
    assert(Bench.parseDriftReference(noCpus, "/data/sf9", "32")
      == Map("q_a" -> 0.5, "q_b" -> 1.25))
  }

  test("a non-comparable or mangled artifact yields the empty map, never a crash") {
    assert(Bench.parseDriftReference(
      synth.replace("\"comparable\":true", "\"comparable\":false"),
      "/data/sf9", "16").isEmpty,
      "a non-comparable artifact must not serve as the drift reference")
    assert(Bench.parseDriftReference("{not json at all", "/data/sf9", "16").isEmpty)
    assert(Bench.parseDriftReference("", "/data/sf9", "16").isEmpty)
    val noQueries = synth.replace(""""queries":{"q_a":0.5,"q_b":1.25},""", "")
    assert(Bench.parseDriftReference(noQueries, "/data/sf9", "16").isEmpty,
      "an artifact without a queries map parses to the inert leg")
  }

  test("the committed BENCH_DETAIL.json round-trips at full query coverage") {
    // sbt runs tests from the repo root — the same relative path Bench
    // itself reads. Skip (vacuously green) only if the artifact is
    // absent or non-comparable on this checkout; when present the
    // parser must recover EVERY entry of the queries map.
    val p = java.nio.file.Paths.get("BENCH_DETAIL.json")
    assume(java.nio.file.Files.exists(p),
      "no committed BENCH_DETAIL.json on this checkout")
    val txt = new String(java.nio.file.Files.readAllBytes(p),
      java.nio.charset.StandardCharsets.UTF_8)
    assume(txt.contains("\"comparable\":true"),
      "stored artifact is not comparable — nothing to round-trip")
    val sf = {
      val m = java.util.regex.Pattern.compile("\"sf\":\"([^\"]*)\"").matcher(txt)
      assert(m.find(), "every artifact stamps its sf")
      m.group(1)
    }
    val cpus = {
      val m = java.util.regex.Pattern.compile("\"cpus\":([0-9]+)").matcher(txt)
      if (m.find()) m.group(1) else "32"
    }
    val parsed = Bench.parseDriftReference(txt, sf, cpus)
    // independent count of the map's entries: the flat map's values are
    // brace-free, so entries == top-level colons inside the braces
    val body = {
      val m = java.util.regex.Pattern
        .compile("\"queries\":\\{(.*?)\\}").matcher(txt)
      assert(m.find(), "the artifact must carry a queries map")
      m.group(1)
    }
    val expected = body.split(",").count(_.contains(":"))
    assert(parsed.size == expected && parsed.nonEmpty,
      s"parser recovered ${parsed.size} of $expected entries")
    assert(parsed.values.forall(v => v >= 0.0 && v < 3600.0),
      "per-query mins must be plausible positive seconds")
    // and the flagship is in there with a sane value
    assert(parsed.contains("q_window_count_hourly"))
  }
}
