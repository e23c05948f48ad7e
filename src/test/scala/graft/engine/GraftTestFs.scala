package graft.engine

/** A Hadoop FileSystem with a NON-`file:` scheme (`graftfs://`) that
  * stores bytes on local disk — the standard Hadoop trick for testing
  * remote-filesystem code paths without a cluster (Hadoop's own test
  * suites wrap RawLocalFileSystem the same way). Registered in a spec
  * via `fs.graftfs.impl`; everything the engine's file layer does —
  * listing, stat, rename, delete, parquet footer reads, the COMPACT
  * swap — must route through `FileSystem.get(uri)` for this to work,
  * which is exactly what HadoopFsBackendSpec proves. RawLocal (not
  * Local/Checksum) so no `.crc` sidecar files pollute the table
  * directory listings the engine asserts on. */
class GraftTestFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "graftfs"
  override def getUri: java.net.URI = java.net.URI.create("graftfs:///")
}
