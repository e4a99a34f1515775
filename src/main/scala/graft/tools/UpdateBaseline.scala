package graft.tools

import java.nio.file.{Files, Paths}

/** Dev tool: fold a bench run's per-query minimums into BASELINE.md.
  * Usage: runMain graft.tools.UpdateBaseline [benchDetailPath]
  *
  * For every registered query, the new baseline is min(existing,
  * measured) — the baseline is the best-KNOWN time, so it only ever
  * ratchets down; a noisy run can add queries but never loosen the
  * gate. Queries with no row yet (new this round) get their measured
  * time.
  *
  * Rewrite discipline: edits are IN-PLACE on the active rows only.
  * Every other line — prose, the `_calibration` epoch pin, the
  * struck-through `~~history~~` rows — passes through untouched (an
  * earlier whole-table rewrite silently dropped the calibration row
  * and the history section; BenchSpec now pins both). New rows are
  * APPENDED after the last active row as a block (sorted among
  * themselves, not merge-sorted into the existing rows — the table
  * reads in rough arrival order, by design: the tail is what changed
  * recently). */
object UpdateBaseline {
  def main(args: Array[String]): Unit = {
    val detailPath = args.headOption.getOrElse("BENCH_DETAIL.json")
    val names = graft.SparkEntry.queries.keySet
    val detail = new String(Files.readAllBytes(Paths.get(detailPath)), "UTF-8")
    // scope to the queries_min object (same hazard as Bench.prevTimes)
    val scoped = {
      val m = "\"queries_min\":\\{".r.findFirstMatchIn(detail)
        .getOrElse(sys.error(s"no queries_min object in $detailPath"))
      val rest = detail.substring(m.end)
      rest.substring(0, rest.indexOf('}'))
    }
    val measured = "\"([a-z0-9_]+)\":(-?[0-9.]+)".r.findAllMatchIn(scoped)
      .map(m => m.group(1) -> m.group(2).toDouble)
      .filter { case (k, v) => names.contains(k) && v > 0 }
      .toMap

    val baselineFile = Paths.get("BASELINE.md")
    val lines = new String(Files.readAllBytes(baselineFile), "UTF-8").linesIterator.toVector
    val row = "^\\|\\s*([a-z0-9_]+)\\s*\\|\\s*([0-9.]+)\\s*\\|\\s*$".r
    def active(l: String): Option[(String, Double)] = l match {
      case row(k, v) if names.contains(k) => Some(k -> v.toDouble)
      case _ => None
    }
    val existing = lines.flatMap(active(_)).toMap
    // distinct keys, not matching lines: a (malformed) duplicated query
    // row must not double-count in the summary
    val loweredKeys = scala.collection.mutable.Set[String]()
    // in-place ratchet of existing active rows; everything else unchanged
    val updated = lines.map { l =>
      active(l) match {
        case Some((k, v)) if measured.get(k).exists(_ < v) =>
          loweredKeys += k
          f"| $k | ${measured(k)}%.4f |"
        case _ => l
      }
    }
    val lowered = loweredKeys.size
    // brand-new queries: insert after the last active row, sorted
    val fresh = (measured.keySet -- existing.keySet).toSeq.sorted
      .map(k => f"| $k | ${measured(k)}%.4f |")
    val lastActive = lines.lastIndexWhere(active(_).isDefined)
    require(lastActive >= 0, "no active baseline rows found")
    val out = (updated.take(lastActive + 1) ++ fresh ++ updated.drop(lastActive + 1))
      .mkString("", "\n", "\n")
    Files.write(baselineFile, out.getBytes("UTF-8"))
    println(s"[baseline] ${existing.size + fresh.size} rows (${fresh.size} new, $lowered lowered)")
  }
}
