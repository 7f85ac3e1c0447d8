package graft.core

import org.apache.spark.sql.SparkSession

/** I/O-layer session tuning shared by every entrypoint (Bench, Verify,
  * Probe, JobProfile, the test harness) — guide §6, measured in round
  * 18 (OPTIMIZATION_r18.md "Cross-cutting I/O configs"):
  *
  *  - `spark.sql.sources.parallelPartitionDiscovery.threshold`
  *    (default here 8192; Spark default 32). Every MergeTable snapshot
  *    scan passes an EXPLICIT leaf-file list (the manifest's entries —
  *    typically 256..600 paths at test scale). Above the threshold
  *    Spark turns the listing into a cluster JOB, which in local mode
  *    costs 0.5–1.4 s of fixed scheduling overhead per scan versus
  *    ~ms of driver-side getFileStatus calls; q170 alone paid ~8 s/run
  *    for these jobs. The listing is pure re-derivation of metadata the
  *    manifest already holds, so the driver-side path is the right
  *    default wherever the filesystem's per-call latency is low;
  *    deployments on high-latency object stores can lower it back via
  *    SPARK_GRAFT_LIST_THRESHOLD.
  *
  *  - `fs.file.impl = graft.core.NoChecksumLocalFileSystem`
  *    (local-scheme only). Hadoop's checksummed LocalFileSystem writes
  *    a `.crc` sidecar per file — doubling file creates on every epoch
  *    write (256 bucket files per commit at the default table width)
  *    and adding checksum reads to every scan, while parquet already
  *    carries page-level checksums. A LocalFileSystem SUBCLASS with
  *    checksums off (not RawLocalFileSystem: Spark's RocksDB
  *    state-store file manager hard-casts the file:// FS to
  *    LocalFileSystem — EventsStreamSpec caught the raw variant
  *    failing that cast). Touches only the `file://` scheme, so it is
  *    inert on HDFS/S3 deployments; SPARK_GRAFT_RAW_LOCAL_FS=false
  *    restores the checksummed FS.
  *
  * Both knobs change no query result — only how file metadata and
  * bytes move on the local filesystem. Committer algorithm v2 was
  * evaluated and REJECTED: it races the changefeed source's staged
  * write-then-list pattern (files land per-task, so a lister can see
  * a partial job) — q167 failed under it; v1's job-commit atomicity
  * is load-bearing there.
  */
object SessionTuning {
  def apply(b: SparkSession.Builder): SparkSession.Builder = {
    val listThreshold =
      sys.env.getOrElse("SPARK_GRAFT_LIST_THRESHOLD", "8192")
    val rawFs =
      !sys.env.get("SPARK_GRAFT_RAW_LOCAL_FS").contains("false")
    val b1 = b.config(
      "spark.sql.sources.parallelPartitionDiscovery.threshold",
      listThreshold)
    if (rawFs)
      b1.config("spark.hadoop.fs.file.impl",
        classOf[NoChecksumLocalFileSystem].getName)
    else b1
  }
}
