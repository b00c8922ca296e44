package graft.core

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{DelegateToFileSystem, RawLocalFileSystem}

import java.net.URI

/** `mockfs://` — a local filesystem re-registered under a non-local
  * scheme, so specs can exercise the hdfs://-style URI handling of
  * [[HadoopRegistry]] and [[graft.sources.SourceReader]] (SURVEY S8)
  * without a real cluster: scheme resolution, qualified-path handling,
  * and FileContext renames all run exactly as they would against a
  * remote FS, while bytes land on local disk.
  *
  * Register with `fs.mockfs.impl` (FileSystem API) and
  * `fs.AbstractFileSystem.mockfs.impl` (FileContext API — resolved
  * separately by Hadoop).
  */
class MockFs extends RawLocalFileSystem {
  override def getScheme: String = "mockfs"
  override def getUri: URI = URI.create("mockfs:///")
}

/** FileContext binding for the `mockfs` scheme —
  * `HadoopRegistry.save`'s rename-OVERWRITE goes through FileContext,
  * which ignores `fs.<scheme>.impl` and needs this AbstractFileSystem
  * delegate instead.
  */
class MockAbstractFs(uri: URI, conf: Configuration)
    extends DelegateToFileSystem(uri, new MockFs, conf, "mockfs", false)
