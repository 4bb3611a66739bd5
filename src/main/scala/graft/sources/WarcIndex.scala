package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed WARC member indexing — the random-access layer crawl
  * pipelines put over an archive: one pass builds a seekable
  * (file, offset, warc_type, target_uri) index (persist it as
  * parquet next to the archive), and a re-fetch then range-reads one
  * member's bytes and parses ONLY it ([[Warc.parseMemberAt]]) instead
  * of re-walking the file.
  *
  * Scale shape: indexing is a stateless flatMap over file blobs —
  * file-parallel like all WARC processing, no shuffle; the index rows
  * are three small columns per record, so the persisted index is a
  * tiny fraction of the archive and a lookup is a partition-pruned
  * parquet read, never an archive scan. */
object WarcIndex {

  /** Build the member index over a frame of (fileCol: String path/id,
    * bytesCol: binary WARC file). */
  def memberIndex(df: DataFrame, fileCol: String, bytesCol: String,
      maxInflate: Long = 1L << 30): DataFrame =
    df.select(col(fileCol).cast("string"), col(bytesCol))
      .flatMap { r =>
        val file = r.getString(0)
        Warc.memberIndex(r.getAs[Array[Byte]](1), maxInflate).map {
          case (off, tpe, uri) => (file, off, tpe, uri)
        }
      }(org.apache.spark.sql.Encoders.product[(String, Long, String, String)])
      .toDF("file", "offset", "warc_type", "target_uri")
}
