package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.api.Source

/** File-based sources — Spark-native forms of the reference's extractors
  * and file transformers (tiny_etl/extractors/files.py,
  * tiny_etl/transformers/files.py).
  *
  * The reference walks directories in a single driver process and pushes
  * one path at a time through a queue; here the DataSource scan itself is
  * the parallel walk — Spark lists files on the driver, splits them into
  * tasks, and reads them on executors. `recursiveFileLookup` +
  * `pathGlobFilter` reproduce the recursive suffix-filtered walk.
  */

/** One row per file (path + metadata, content not read) —
  * FilesListExtractor / FoldersFilesListExtractor
  * (tiny_etl/extractors/files.py:7-49). Multiple roots = varargs load.
  */
final case class FilesListSource(dirs: Seq[String], glob: String = "*.txt")
    extends Source {
  def load(spark: SparkSession): DataFrame =
    spark.read
      .format("binaryFile")
      .option("recursiveFileLookup", "true")
      .option("pathGlobFilter", glob)
      .load(dirs: _*)
      .select(col("path").as("file_path"), col("length").as("file_size"))
}

/** One row per non-blank trimmed line — FileToTextLinesTransformer
  * (tiny_etl/transformers/files.py:17-54). The reference swallows IO
  * errors with a log (files.py:53-54) → `ignoreCorruptFiles`.
  */
final case class FileLinesSource(dirs: Seq[String], glob: String = "*.txt")
    extends Source {
  def load(spark: SparkSession): DataFrame =
    spark.read
      .option("recursiveFileLookup", "true")
      .option("pathGlobFilter", glob)
      .option("ignoreCorruptFiles", "true")
      .text(dirs: _*)
      .select(
        input_file_name().as("file_path"),
        trim(col("value")).as("line"))
      .filter(length(col("line")) > 0)
}

/** One row per file with the whole UTF-8 content — FileTextReaderTransformer
  * (tiny_etl/transformers/files.py:56-88).
  *
  * Scale note: one row per file means one task holds one file's entire
  * content — right for file-granular semantics (per-file word stats)
  * over many ordinary files, wrong for multi-GB single files. For
  * those, use [[FileLinesSource]] (splittable line scan) and aggregate
  * by file_path, which computes the same per-file results without any
  * single task materializing a whole file.
  */
final case class WholeTextSource(dirs: Seq[String], glob: String = "*.txt")
    extends Source {
  def load(spark: SparkSession): DataFrame =
    spark.read
      .option("wholetext", "true")
      .option("recursiveFileLookup", "true")
      .option("pathGlobFilter", glob)
      .option("ignoreCorruptFiles", "true")
      .text(dirs: _*)
      .select(
        input_file_name().as("file_path"),
        col("value").as("content"))
}

/** One row per file WITH the raw bytes — the multimodal ingest path
  * (image/audio/video payloads as opaque binary + metadata; see
  * graft.operators.Multimodal). The reference never reads bytes
  * (extractors/files.py stops at paths); this is the extension a
  * training-data pipeline needs. Content is read executor-side per
  * split — the driver only lists paths.
  */
final case class BinaryFilesSource(dirs: Seq[String], glob: String = "*")
    extends Source {
  def load(spark: SparkSession): DataFrame =
    spark.read
      .format("binaryFile")
      .option("recursiveFileLookup", "true")
      .option("pathGlobFilter", glob)
      .load(dirs: _*)
      .select(
        col("path").as("file_path"),
        col("length").as("file_size"),
        col("content"))
}

/** Parquet table source for the fixture star schema (TESTDATA.md). */
final case class ParquetSource(path: String) extends Source {
  def load(spark: SparkSession): DataFrame = spark.read.parquet(path)
}
