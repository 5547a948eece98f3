package graft

import java.nio.file.{Files, Paths}
import java.security.MessageDigest

import org.apache.spark.sql.functions._

import graft.operators.Multimodal
import graft.sources.BinaryFilesSource

/** The multimodal ingest path over REAL bytes: BinaryFilesSource reads
  * the reference corpus files' content on executors, and the binary
  * operators (sha256 / header / frames / stub decode) agree with
  * locally-computed ground truth on the raw bytes.
  */
class MultimodalSpec extends SparkSpecBase {

  private val booksDir = "/root/reference/example/sample_data/books"

  private lazy val files = BinaryFilesSource(Seq(booksDir), glob = "*.txt")
    .load(spark).cache()

  test("binary source reads every file's bytes, size matches metadata") {
    val n = new java.io.File(booksDir)
      .listFiles().count(f => f.isFile && f.getName.endsWith(".txt"))
    assert(files.count() === n.toLong)
    assert(files.filter(length(col("content")).cast("long") =!= col("file_size"))
      .count() === 0)
  }

  test("sha256 / header / frames match local ground truth on a sample file") {
    val sample = new java.io.File(booksDir)
      .listFiles().filter(_.getName.endsWith(".txt")).map(_.getPath).min
    val bytes = Files.readAllBytes(Paths.get(sample))
    val sha = MessageDigest.getInstance("SHA-256").digest(bytes)
      .map("%02x".format(_)).mkString
    val header = bytes.take(16).map("%02x".format(_)).mkString

    val row = Multimodal.describe(
      files.filter(col("file_path").endsWith(sample.split("/").last)), "content")
      .select("byte_len", "sha256", "header_hex", "frames_hex", "decoded.width")
      .head()

    assert(row.getLong(0) === bytes.length.toLong)
    assert(row.getString(1) === sha)
    assert(row.getString(2) === header)
    val frames = row.getSeq[String](3)
    assert(frames.length === 3)
    assert(frames.head === header.take(16)) // frame0 = first 8 bytes
    // frame1 starts at byte 1 + len/3
    val off1 = bytes.length / 3
    val f1 = bytes.slice(off1, off1 + 8).map("%02x".format(_)).mkString
    assert(frames(1) === f1)
    assert(row.getLong(4) === bytes.length.toLong % 640) // stub decode width
  }
}
