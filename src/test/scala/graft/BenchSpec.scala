package graft

import org.scalatest.funsuite.AnyFunSuite

/** prevTimes parses per-query seconds out of a previous round's BENCH
  * wrapper file. Two hazards, both observed in round-2 artifacts:
  * the wrapper's `tail` may repeat query names in diagnostic objects
  * (medians, delta RATIOS) after the min-times object, and the tail is
  * a bounded suffix so the `"queries":{` marker itself may be cut off.
  */
class BenchSpec extends AnyFunSuite {

  private val names = Set("q1_agg", "q20_set_ops", "e1_sessionize")

  test("prevTimes scopes to the queries object; later diagnostic repeats are ignored") {
    // escaped-quote form, as embedded in the driver wrapper's tail
    val text =
      raw"""{"tail":"{\"metric\":\"total\",\"queries\":{\"q1_agg\":1.2000,\"q20_set_ops\":6.9600},""" +
      raw"""\"queries_median\":{\"q1_agg\":1.5000,\"q20_set_ops\":7.1000},""" +
      raw"""\"delta_vs_prev\":{\"q1_agg\":0.819,\"q20_set_ops\":0.027},\"sf\":\"x\"}\n"}"""
    val t = Bench.prevTimes(text, names)
    assert(t == Map("q1_agg" -> 1.2, "q20_set_ops" -> 6.96))
  }

  test("prevTimes handles unescaped plain-JSON bench lines too") {
    val text = """{"metric":"total","queries":{"q1_agg":0.5000},"failed":[],"sf":"x"}"""
    assert(Bench.prevTimes(text, names) == Map("q1_agg" -> 0.5))
  }

  test("prevTimes falls back to first-occurrence-wins when truncation cut the marker") {
    // round-2 shape: tail begins mid-queries-object, then medians repeat names
    val text =
      raw"""1155,\"q20_set_ops\":0.2066},\"queries_median\":{\"q1_agg\":1.4000,\"q20_set_ops\":0.3000},\"median_total\":33.5}"""
    val t = Bench.prevTimes(text, names)
    assert(t("q20_set_ops") == 0.2066) // the min survives; the median repeat does not override
    assert(t("q1_agg") == 1.4) // only occurrence available
  }

  test("prevTimes drops failed (-1) entries and unknown names") {
    val text = """{"queries":{"q1_agg":-1.0,"nope":2.0,"e1_sessionize":0.9}}"""
    assert(Bench.prevTimes(text, names) == Map("e1_sessionize" -> 0.9))
  }

  test("baselineTimes parses markdown table rows, ignoring prose and unknown names") {
    val text =
      """# BASELINE — numeric per-query gate
        |Produced as the per-query MIN across rounds (min-of-5 each).
        || query | baseline_sec |
        ||---|---|
        || q1_agg | 0.1234 |
        || nope_query | 1.0000 |
        || e1_sessionize | 0.6800 |
        |""".stripMargin
    assert(Bench.baselineTimes(text, names) ==
      Map("q1_agg" -> 0.1234, "e1_sessionize" -> 0.68))
  }

  test("baselineTimes against the committed BASELINE.md covers the registered set") {
    val f = new java.io.File("BASELINE.md")
    assume(f.exists())
    val t = Bench.baselineTimes(
      new String(java.nio.file.Files.readAllBytes(f.toPath)), SparkEntry.queries.keySet)
    // every baseline row names a registered query (no drifted keys)...
    assert(t.nonEmpty)
    // ...and at most the queries added after the baseline snapshot lack a row
    val missing = SparkEntry.queries.keySet -- t.keySet
    assert(missing.isEmpty, s"unexpected baseline gaps: $missing")
  }

  test("the committed BASELINE.md pins a calibration row; history rows never parse") {
    val f = new java.io.File("BASELINE.md")
    assume(f.exists())
    val text = new String(java.nio.file.Files.readAllBytes(f.toPath))
    // the machine-epoch calibration pin is present and positive
    val cal = Bench.baselineTimes(text, Set(Bench.CalibrationKey))
    assert(cal.get(Bench.CalibrationKey).exists(_ > 0), "missing _calibration row")
    // retired-epoch history rows are struck through -> invisible to the
    // parser even when their names are offered (d7's retired 1.4225 row
    // must not shadow its re-pinned value)
    val t = Bench.baselineTimes(text, Set("d7_dup_clusters"))
    assert(t("d7_dup_clusters") < 1.0, s"history row leaked into the gate: $t")
  }

}
