package graft.queries

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Content-identity fingerprint of a parquet dataset path, used to key
  * the /tmp-persisted derived artifacts (near-dup index, KN model, IVF
  * index) so a regenerated dataset is never served a stale artifact.
  *
  * A bare size+mtime of the path is wrong for DIRECTORY-shaped parquet
  * outputs (the usual Spark layout): both reflect the directory entry,
  * which does not change when a part file is rewritten in place. This
  * fingerprint instead folds (relative name, size, mtime) of every
  * regular file under the path — any rewritten, added, or removed part
  * file changes the key.
  */
object DatasetFingerprint {

  /** Stable hex fingerprint of the file tree rooted at `path`
    * ("na" if the path does not exist). */
  def of(path: String): String = {
    val p = Paths.get(path)
    if (!Files.exists(p)) return "na"
    if (Files.isRegularFile(p))
      return fold(0L, entry(p.getFileName.toString, p)).toHexString
    val walk = Files.walk(p)
    val files =
      try walk.iterator().asScala
        .filter(Files.isRegularFile(_))
        .map(f => (p.relativize(f).toString, f))
        .toArray
        .sortBy(_._1)
      finally walk.close()
    var h = files.length.toLong
    files.foreach { case (rel, f) => h = fold(h, entry(rel, f)) }
    h.toHexString
  }

  private def entry(rel: String, f: Path): Long = {
    var h = 1125899906842597L
    rel.foreach(c => h = h * 31L + c)
    h = h * 1000003L + Files.size(f)
    h * 1000003L + Files.getLastModifiedTime(f).toMillis
  }

  private def fold(acc: Long, v: Long): Long =
    (acc ^ v) * -7046029254386353131L + java.lang.Long.rotateLeft(v, 17)
}
