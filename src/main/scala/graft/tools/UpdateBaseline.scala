package graft.tools

import java.nio.file.{Files, Paths}

/** Dev tool: fold a bench run's per-query minimums into BASELINE.md.
  * Usage: runMain graft.tools.UpdateBaseline [benchDetailPath]
  *
  * For every registered query, the new baseline is min(existing,
  * measured) — the baseline is the best-KNOWN time, so it only ever
  * ratchets down; a noisy run can add queries but never loosen the
  * gate. Queries with no row yet (new this round) get their measured
  * time. Rewrites only the table portion of BASELINE.md, preserving
  * the prose.
  */
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
    val row = "\\|\\s*([a-z0-9_]+)\\s*\\|\\s*([0-9.]+)\\s*\\|".r
    val existing = lines.flatMap {
      case row(k, v) if names.contains(k) => Some(k -> v.toDouble)
      case _ => None
    }.toMap
    val merged = (existing.keySet ++ measured.keySet).map { k =>
      k -> math.min(existing.getOrElse(k, Double.MaxValue),
                    measured.getOrElse(k, Double.MaxValue))
    }.toMap
    // header + separator don't match the numeric row pattern, so the
    // prose prefix runs up to the first data row
    val prose = lines.takeWhile(l => !row.pattern.matcher(l).matches())
    val table = merged.toSeq.sortBy(_._1).map { case (k, v) => f"| $k | $v%.4f |" }
    val out = (prose ++ table).mkString("", "\n", "\n")
    Files.write(baselineFile, out.getBytes("UTF-8"))
    val lowered = merged.count { case (k, v) => existing.get(k).exists(v < _) }
    println(s"[baseline] ${merged.size} rows (${merged.size - existing.size} new, $lowered lowered)")
  }
}
