package graft.streaming

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery
import graft.sources.CompactionPlanner

/** Streaming SMALL-FILE MAINTENANCE — the deployment loop a continuous
  * ingest needs around [[graft.sources.CompactionPlanner]]: every
  * micro-batch appends a fresh parquet file (or several), so a
  * minute-cadence stream manufactures thousands of KB-scale files per
  * day; the fix in every lakehouse deployment is an OPTIMIZE pass wired
  * to file-count pressure, serialized with the ingest commits so the
  * rewrite never races an append.
  *
  * Shape: `foreachBatch` appends the batch, then — inside the same
  * serialized callback, exactly where Delta deployments hang their
  * auto-compaction — checks the table's data-file count and, past the
  * threshold, runs the FULL loop: plan → compact (shuffle-free,
  * group-scoped) → promote (rename-commit, new live manifest) → vacuum
  * (delete the orphaned originals). Readers between batches only ever
  * see a superset (pre-vacuum) or the exact table (post-vacuum) —
  * conservation is CompactionPlanner's spec'd contract.
  *
  * Scale notes: the pressure check is one FS listing (metadata-bound);
  * the compaction itself is group-scoped narrow reads, so maintenance
  * cost is proportional to the small files it removes, not to the
  * table. State: none (no watermark, no state store) — the table
  * directory IS the state.
  */
object StreamingCompaction {

  /** One pressure check: if `tableDir` holds more than `maxFiles` data
    * files, compact into `workDir` at `targetBytes`, promote, vacuum.
    * Returns true iff a compaction ran. */
  def maintainIfPressured(s: SparkSession, tableDir: String, workDir: String,
      maxFiles: Int, targetBytes: Long): Boolean = {
    val planned = CompactionPlanner.plan(s, tableDir, targetBytes)
    if (planned.length <= maxFiles ||
        !planned.groupBy(_.group).exists(_._2.length > 1)) false
    else {
      CompactionPlanner.compact(s, tableDir, workDir, targetBytes)
      val live = CompactionPlanner.promote(s, tableDir, workDir, planned)
      CompactionPlanner.vacuum(s, tableDir, live, dryRun = false)
      true
    }
  }

  /** Start the ingest-with-maintenance loop: append each micro-batch to
    * `tableDir`, then run the pressure check (work under
    * `workDir/gen-<batchId>` so generations never collide). Returns the
    * query and a counter of compactions run. */
  def start(s: SparkSession, source: DataFrame, tableDir: String,
      workDir: String, checkpointDir: String, maxFiles: Int,
      targetBytes: Long): (StreamingQuery, AtomicInteger) = {
    val compactions = new AtomicInteger(0)
    val q = source.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.write.mode("append").parquet(tableDir)
        if (maintainIfPressured(s, tableDir, s"$workDir/gen-$batchId",
            maxFiles, targetBytes))
          compactions.incrementAndGet()
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .start()
    (q, compactions)
  }
}
