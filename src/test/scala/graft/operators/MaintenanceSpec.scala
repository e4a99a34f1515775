package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** p9: the maintenance-loop ledger against direct recomputation — the
  * integrity rows must equal aggregates over the SOURCE table (the
  * loop conserved every row through fragment→compact→promote→vacuum),
  * and the loop-shape rows their documented constants (measured from
  * real filesystem effects inside the operator). */
class MaintenanceSpec extends SparkSpec {

  test("p9 ledger: integrity rows equal source-table aggregates; loop shape as documented") {
    val got = Maintenance.p9MaintenanceLoop(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val src = graft.Tables.documents(spark, sfDir)
      .agg(count(lit(1)),
        (sum((col("doc_id") % Maintenance.P9ChecksumP).cast("decimal(38,0)"))
          % Maintenance.P9ChecksumP).cast("long"),
        (sum((col("n_chars") % Maintenance.P9ChecksumP).cast("decimal(38,0)"))
          % Maintenance.P9ChecksumP).cast("long"))
      .head()
    assert(got(("integrity", "rows")) == src.getLong(0))
    assert(got(("integrity", "id_checksum")) == src.getLong(1))
    assert(got(("integrity", "char_checksum")) == src.getLong(2))
    assert(got(("fragment", "n_files")) == Maintenance.P9Files.toLong)
    assert(got(("plan", "n_groups")) == 1L)
    assert(got(("compact", "groups_rewritten")) == 1L)
    assert(got(("promote", "live_files")) == 1L)
    assert(got(("vacuum", "orphans")) == Maintenance.P9Files.toLong)
    assert(got(("vacuum", "deleted")) == Maintenance.P9Files.toLong)
    assert(got(("schema", "n_changes")) == 2L)
    assert(got(("schema", "n_breaking")) == 1L)
    assert(got(("schema", "compatible")) == 0L)
  }
}
