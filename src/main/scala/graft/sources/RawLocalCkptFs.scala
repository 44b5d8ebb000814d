package graft.sources

import java.net.URI
import org.apache.hadoop.fs.RawLocalFileSystem

/** Checksum-free local filesystem under its own `rawlocal://` scheme
  * (optimization r17, guide §6). Hadoop's default `file://` is
  * ChecksumFileSystem: every file create also creates, writes and
  * renames a `.crc` twin — so each streaming micro-batch's offset-log
  * entry, commit-log entry and per-store state delta pays DOUBLE the
  * file operations. For the parity harness's THROWAWAY tmpfs
  * checkpoints ([[graft.streaming.StreamParity]]) the checksums protect
  * nothing: the tree lives for one query on `/dev/shm` and is deleted
  * on completion, and a corrupted read would fail the oracle hash gate
  * anyway. A production deployment points checkpoints at durable
  * shared storage with its own integrity story (HDFS block checksums,
  * object-store ETags) — the bare-local-FS case this class covers is
  * exactly the case where the extra `.crc` files buy nothing.
  *
  * The subclass exists because `FileSystem.checkPath` requires the
  * instance's URI scheme to match the path's scheme, and
  * `RawLocalFileSystem.getUri` hardcodes `file:///` — registering the
  * parent class under `fs.rawlocal.impl` would fail `makeQualified`
  * on every `rawlocal://` path. Registered (inert until a path uses
  * the scheme) in [[graft.GraftSession.builder]]. */
class RawLocalCkptFs extends RawLocalFileSystem {
  override def getUri: URI = URI.create("rawlocal:///")
}
