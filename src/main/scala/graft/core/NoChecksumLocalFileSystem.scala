package graft.core

import java.net.URI

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.LocalFileSystem

/** The checksummed local filesystem with the checksums turned off:
  * Hadoop's default `file://` FS writes a `.crc` sidecar per file
  * (doubling file creates on every 256-bucket epoch write) and
  * verifies it on every read, while parquet already carries
  * page-level checksums. Plain `RawLocalFileSystem` would also drop
  * the CRCs, but Spark's RocksDB state-store file manager HARD-CASTS
  * the `file://` FS to `LocalFileSystem`
  * (RocksDBFileManager.saveImmutableFilesToDfs), so the no-checksum
  * behavior must come from a LocalFileSystem SUBCLASS — this one.
  * Wired via `fs.file.impl` in [[SessionTuning]]; local scheme only,
  * inert on HDFS/S3 deployments. */
class NoChecksumLocalFileSystem extends LocalFileSystem {
  override def initialize(uri: URI, conf: Configuration): Unit = {
    super.initialize(uri, conf)
    setWriteChecksum(false)
    setVerifyChecksum(false)
  }
}
