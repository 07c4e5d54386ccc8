package graft

/** Registry-wide plan audit: no query may multiply scans of its inputs
  * (the semi-join-through-union and re-aggregated-totals classes of bug
  * each turned single-digit-scan queries into 11-39 scans). Bounds are the
  * intended structural scan counts + small slack.
  */
class ScanSweepSpec extends SparkSpec {
  test("sweep: every batch query stays within its scan budget") {
    val budget = Map(
      "e_near_dup_recall" -> 12, // bounded O(n²) anchor: aug(2) × 6 uses
      "e_near_dup" -> 8,         // aug(2) × (bands l/r + pair re-join ×2)
      // the changed-slice is a union of TWO partition-pruned reads (prev ∪
      // cur), so every rule pass over it counts double scans by shape
      "v_incremental_reval" -> 12
    ).withDefaultValue(7)
    Queries.registry.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (!name.startsWith("s_")) { // streaming harnesses execute eagerly
        val n = fn(spark, sf001).queryExecution.executedPlan.toString
          .linesIterator.count(_.contains("FileScan parquet"))
        assert(n <= budget(name), s"$name scans=$n > ${budget(name)}")
      }
    }
  }
}
