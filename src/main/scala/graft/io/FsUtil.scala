package graft.io

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Filesystem helpers routed through the Hadoop FileSystem API so the
  * write-if-absent / reuse contracts (dumps, bench input, IVF index)
  * hold on HDFS/S3 too — a bare java.io.File check silently reports
  * "absent" for any non-local URI and the caller re-runs or mis-detects
  * (round-2 ADVICE item).
  */
object FsUtil {

  private def fs(path: Path): FileSystem =
    path.getFileSystem(SparkSession.active.sessionState.newHadoopConf())

  def exists(path: String): Boolean = {
    val p = new Path(path)
    fs(p).exists(p)
  }

  /** The committed-write marker: dir exists AND carries _SUCCESS. */
  def successExists(dir: String): Boolean = exists(s"$dir/_SUCCESS")

  def deleteRecursive(path: String): Unit = {
    val p = new Path(path)
    val f = fs(p)
    if (f.exists(p)) { f.delete(p, true); () }
  }

  def writeString(path: String, content: String): Unit = {
    val p = new Path(path)
    val out = fs(p).create(p, true)
    try out.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Replace `dst` with `src` via a single rename-with-OVERWRITE
    * (FileContext): on HDFS and local FS the destination holds either
    * the old or the new content at every instant — never neither (a
    * delete-then-rename pair would lose the committed manifest if the
    * process dies between the two calls). On S3 rename is copy+delete —
    * the documented seam where a real Iceberg catalog commit takes over
    * (TableIO scaladoc).
    */
  def replaceWith(src: String, dst: String): Unit = {
    val conf = SparkSession.active.sessionState.newHadoopConf()
    val f = fs(new Path(dst))
    val d = f.makeQualified(new Path(dst))
    val s = f.makeQualified(new Path(src))
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(d.toUri, conf)
    fc.rename(s, d, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  def readString(path: String): Option[String] = {
    val p = new Path(path)
    val f = fs(p)
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      try {
        val bytes = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        var n = in.read(buf)
        while (n >= 0) { bytes.write(buf, 0, n); n = in.read(buf) }
        Some(new String(bytes.toByteArray,
          java.nio.charset.StandardCharsets.UTF_8))
      } finally in.close()
    }
  }
}
