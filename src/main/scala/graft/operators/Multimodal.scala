package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal-column operators — image/audio/video payloads as opaque
  * `binary` columns with typed metadata, the shape a training-data
  * pipeline uses for non-text modalities (extension beyond the
  * reference, which is text-only).
  *
  * Everything here is real, scale-correct Spark plumbing: binary
  * columns flow through scans/joins/shuffles like any other value,
  * the per-row ops are codegen'd built-ins (length / sha2 / substring
  * on BinaryType / hex), and nothing ever collects to the driver.
  * The one thing this container cannot do is run an actual codec —
  * [[stubDecode]] stands in for the image/audio decode step with a
  * DETERMINISTIC STUB (metadata derived from byte length), clearly
  * marked so a real deployment swaps in a decoder UDF/mapInPandas
  * stage with the same signature.
  */
object Multimodal {

  /** Content fingerprint: SHA-256 of the raw bytes, lowercase hex —
    * the standard exact-dedup / provenance key for binary payloads. */
  def sha256Hex(bin: Column): Column = lower(sha2(bin, 256))

  /** Payload size in bytes (NOT characters). */
  def byteLen(bin: Column): Column = length(bin).cast("long")

  /** First `n` bytes as lowercase hex — magic-number sniffing
    * (`ffd8ff` = JPEG, `89504e47` = PNG, …) without decoding. */
  def headerHex(bin: Column, n: Int = 16): Column =
    lower(hex(substring(bin, 1, n)))

  /** Evenly-spaced "frame sample": k slices of `frameBytes` bytes at
    * offsets 1 + ⌊len·i/k⌋ — the partition-friendly skeleton of a
    * video frame sampler (a real one decodes each slice; the slicing,
    * schema and batch shape are what matter to the engine). Lowercase
    * hex per frame. */
  def frameSampleHex(bin: Column, k: Int = 3, frameBytes: Int = 8): Column =
    array((0 until k).map { i =>
      val off = (lit(1) + floor(byteLen(bin) * i / k).cast("long")).cast("int")
      lower(hex(substring(bin, off, lit(frameBytes))))
    }: _*)

  /** ======= STUB ======= deterministic fake decoder: emits the typed
    * metadata struct a real image decode would (width, height,
    * channels), derived from the byte length so it is reproducible in
    * any engine. Swap for a real codec stage in deployment; the
    * schema and null-safety are the contract. */
  def stubDecode(bin: Column): Column =
    struct(
      (byteLen(bin) % 640).as("width"),
      (byteLen(bin) % 480).as("height"),
      lit(3L).as("channels"))

  /** Full metadata projection over a binary column: one narrow,
    * shuffle-free pass per payload. */
  def describe(
      df: DataFrame,
      binCol: String,
      frames: Int = 3,
      frameBytes: Int = 8): DataFrame = {
    val bin = col(binCol)
    df
      .withColumn("byte_len", byteLen(bin))
      .withColumn("sha256", sha256Hex(bin))
      .withColumn("header_hex", headerHex(bin))
      .withColumn("frames_hex", frameSampleHex(bin, frames, frameBytes))
      .withColumn("decoded", stubDecode(bin))
  }
}
