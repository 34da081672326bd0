package graft

import java.net.URI
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{DelegateToFileSystem, RawLocalFileSystem}

/** A test-only Hadoop FileSystem mounted under its OWN scheme
  * (graftfs://), delegating to local storage. Registering it for BOTH
  * lookup paths — the FileSystem API (`fs.graftfs.impl`, used by
  * FsUtil/TableIO/Spark IO) and the FileContext API
  * (`fs.AbstractFileSystem.graftfs.impl`, used by FsUtil.replaceWith's
  * atomic rename) — lets ResumeSpec run the whole manifest/resume
  * protocol against a filesystem that is NOT the default local one:
  * any residual java.io or file:-scheme assumption fails loudly instead
  * of silently passing on the default layout. This is the Iceberg-seam
  * exercise the sandbox allows (no HDFS/S3/catalog jars here).
  */
class GraftTestFs extends RawLocalFileSystem {
  override def getScheme: String = "graftfs"
  override def getUri: URI = URI.create("graftfs:///")
}

/** FileContext-side binding of the same scheme (AbstractFileSystem is a
  * separate registry from FileSystem — FsUtil.replaceWith goes through
  * it for rename-with-OVERWRITE).
  */
class GraftTestAbstractFs(uri: URI, conf: Configuration)
    extends DelegateToFileSystem(uri, new GraftTestFs, conf, "graftfs", false)
