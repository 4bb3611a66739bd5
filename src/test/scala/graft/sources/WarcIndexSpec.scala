package graft.sources

import java.nio.charset.StandardCharsets.US_ASCII

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class WarcIndexSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("distributed index persists and drives a single-member re-fetch") {
    import spark.implicits._
    def rec(f: Int, i: Int) = Warc.encodeResponse(s"https://w/$f/$i",
      "2026-08-14T00:00:00Z", 200, "OK", s"body $f/$i".getBytes(US_ASCII))
    def file(f: Int): Array[Byte] =
      rec(f, 0) ++ Warc.gzipMember(rec(f, 1)) ++ rec(f, 2)
    val files = Map("warc/a.warc" -> file(0), "warc/b.warc" -> file(1))
    val df = files.toSeq.toDF("path", "bytes")
    val dir = java.nio.file.Files.createTempDirectory("warc_idx").toString + "/idx"
    WarcIndex.memberIndex(df, "path", "bytes").write.parquet(dir)
    val idx = spark.read.parquet(dir)
    assert(idx.count() == 6)
    // look up one uri in the PERSISTED index, range-read that member
    // from its file, and get exactly the record back
    val row = idx.filter($"target_uri" === "https://w/1/1")
      .select("file", "offset").head()
    val (path, off) = (row.getString(0), row.getLong(1))
    assert(path == "warc/b.warc")
    val got = Warc.parseMemberAt(files(path).drop(off.toInt), 0)
    assert(got.map(_.targetUri) == Seq("https://w/1/1"))
    assert(new String(got.head.body, US_ASCII) == "body 1/1")
  }
}
