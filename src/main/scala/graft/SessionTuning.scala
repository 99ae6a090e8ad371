package graft

import org.apache.spark.sql.SparkSession

/** r14 optimization-round session posture, shared by every
  * evidence-producing main (Bench, Verify, the profile/plan probes) so the
  * bench, the correctness dump, and ad-hoc measurement all run the same
  * engine configuration.
  *
  * `spark.shuffle.sort.bypassMergeThreshold = 1` — never use the
  * bypass-merge shuffle writer. Rationale (guide §2.2, measured r14):
  * the bypass writer opens ONE FILE PER REDUCE PARTITION per map task and
  * then concatenates them with mmap/unmap NIO copies, so at
  * shuffle.partitions = 32 every tiny exchange pays 32×32 file
  * create/open/merge operations; jstack during the bench showed executor
  * task time sitting in `BypassMergeSortShuffleWriter.writePartitionedData`
  * (FileChannelImpl.map0/unmap0), and the 10-query shuffle-bound subset
  * measured 17.8 → 13.0 s (gr_tri 3.15 → 1.54) with the threshold at 1.
  * This is NOT a local-only trick: at production reducer counts (> 200,
  * the default threshold) the serialized sort writer is the chosen path
  * anyway — the setting simply unifies the small-reducer-count case onto
  * the same single-spill-file writer, which is cheaper whenever file
  * creation is not free (ext4 here; object-store-backed dirs at scale).
  *
  * Values are defaulted, not forced: a `-Dspark.shuffle...` system
  * property (the build.sbt GRAFT_EXTRA_JAVA_OPTS A/B hook) still wins,
  * so config experiments need no code edits.
  */
object SessionTuning {
  def tuned(b: SparkSession.Builder): SparkSession.Builder = b
    .config("spark.shuffle.sort.bypassMergeThreshold",
      sys.props.getOrElse("spark.shuffle.sort.bypassMergeThreshold", "1"))
}
