package graft.util

import org.apache.hadoop.fs.{FileStatus, Path}

/**
 * A Hadoop FileSystem registered under a NON-`file` scheme that stores on
 * local disk (RawLocalFileSystem underneath) — the standard way to
 * exercise remote-scheme code paths without a cluster: the staleness
 * guards must treat `graftfs://…` as REMOTE (bounded-listing signature,
 * no java.io walk) while reads/writes still work. Registered per-spec via
 * `hadoopConf.set("fs.graftfs.impl", classOf[GraftTestFs].getName)`.
 *
 * Every returned status is repackaged with its permission MATERIALIZED:
 * RawLocalFileSystem's lazy `DeprecatedRawLocalFileStatus.getPermission`
 * loads by `new java.io.File(status.getPath.toUri)`, which rejects any
 * URI whose scheme isn't "file" — so `listFiles`' LocatedFileStatus
 * wrapper (and Spark's file index) would throw under our scheme.
 */
class GraftTestFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "graftfs"
  override def getUri: java.net.URI = java.net.URI.create("graftfs:///")

  private def solid(s: FileStatus): FileStatus =
    new FileStatus(s.getLen, s.isDirectory, s.getReplication,
      s.getBlockSize, s.getModificationTime, s.getAccessTime,
      org.apache.hadoop.fs.permission.FsPermission.getDefault,
      null, null, s.getPath)

  override def getFileStatus(f: Path): FileStatus =
    solid(super.getFileStatus(f))

  override def listStatus(f: Path): Array[FileStatus] =
    super.listStatus(f).map(solid)
}
