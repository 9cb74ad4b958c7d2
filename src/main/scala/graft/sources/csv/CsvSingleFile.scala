package graft.sources.csv

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Parallel write of ONE `.csv` / `.csv.gz` / `.csv.zst` / `.csv.bz2` file.
  *
  * The reference's CSV deliverable is a single file and its writer is one
  * sequential encoder thread (ref: src/csv_writer.rs:85-158), which caps a
  * one-file-out job at per-core throughput. Spark's built-in CSV sink is
  * parallel but emits a directory of parts; the usual workaround,
  * `coalesce(1)`, funnels the whole job through one task — the same
  * single-writer bound (BASELINE.md K4).
  *
  * This utility keeps the expensive half parallel, mirroring the xlsx ZIP
  * stitch ([[graft.xlsx.RawZipWriter]]): every partition writes its own part
  * through Spark's codegen'd univocity writer (encode + compress — the CPU
  * cost), and the driver's commit byte-concatenates the parts into the one
  * target file. Concatenation is valid BECAUSE of the container formats:
  *  - plain text: parts are whole lines, concat is trivially a CSV;
  *  - gzip: RFC 1952 §2.2 — a gzip stream is 1+ members back-to-back, and
  *    every part is a complete member (Hadoop/JDK readers consume all);
  *  - zstd: RFC 8878 §3 — a frame sequence; [[ZstdCodec]] reads frames
  *    until underlying EOF;
  *  - bzip2: multi-stream files are the basis of Hadoop's splittable bz2.
  * ZIP and block codecs (snappy/lz4) have central state and are rejected.
  *
  * The header (when asked for) is encoded by writing the column names as a
  * one-row all-string DataFrame through the SAME writer and options, so
  * header quoting/separator behavior is exactly the engine's, then placed
  * first in the stitch. Row order = partition order, matching what a
  * directory read would reassemble from part file names.
  *
  * At 100 TB the parts stream straight to the target filesystem and the
  * commit is one sequential raw-byte copy by the driver (no decode, no
  * recompress) — the same I/O a distcp/concat would do; on a real object
  * store this step maps to multipart-upload copy. The parallel encode is
  * what was bound before.
  */
object CsvSingleFile {

  /** Codecs whose outputs concatenate into a valid single stream. */
  private val Concatenable: Map[String, String] = Map(
    "none" -> "none", "" -> "none", "uncompressed" -> "none",
    "gzip" -> "gzip", "bzip2" -> "bzip2",
    "zstd" -> "zstd", ZstdCodec.Name.toLowerCase -> "zstd")

  /** Write `df` as exactly one CSV file at `path`.
    *
    * @param options Spark CSV writer options (`sep`, `quote`, `escape`,
    *   `nullValue`, `header`, `compression`, ...). `compression` must be
    *   one of none/gzip/bzip2/zstd — formats whose members concatenate.
    */
  def write(df: DataFrame, path: String, options: Map[String, String] = Map.empty,
            overwrite: Boolean = true): Unit = {
    val spark = df.sparkSession
    val target = new Path(path)
    val fs = target.getFileSystem(spark.sessionState.newHadoopConf())
    require(overwrite || !fs.exists(target), s"target exists: $path")

    val compRaw = options.getOrElse("compression", "none")
    val comp = Concatenable.getOrElse(compRaw.toLowerCase,
      sys.error(s"compression '$compRaw' is not stitchable into one file " +
        "(members don't concatenate); use none/gzip/bzip2/zstd"))
    if (comp == "zstd") ZstdCodec.register(spark)
    val compOpt = comp match {
      case "none" => Map("compression" -> "none")
      case "zstd" => Map("compression" -> ZstdCodec.Name)
      case c      => Map("compression" -> c)
    }
    val passThrough = options - "header" - "compression" - "path"
    val wantHeader = options.get("header").exists(_.toBoolean)

    val tmp = new Path(target.getParent,
      s".${target.getName}.__graft_stitch_${java.util.UUID.randomUUID().toString.take(8)}__")
    try {
      // 1. Parallel encode: every partition writes its own complete part
      //    (the codegen'd univocity writer + codec — the CPU-bound half).
      df.write.mode("overwrite").options(passThrough).options(compOpt)
        .option("header", "false").csv(new Path(tmp, "data").toString)

      // 2. Header as a one-row frame through the same writer/options, so
      //    its quoting is exactly what the engine would have emitted.
      if (wantHeader) {
        val names = df.schema.fieldNames
        val hdr = spark.createDataFrame(
          java.util.Collections.singletonList(Row.fromSeq(names.toSeq)),
          StructType(names.map(StructField(_, StringType, nullable = false))))
        hdr.coalesce(1).write.mode("overwrite").options(passThrough).options(compOpt)
          .option("header", "false").csv(new Path(tmp, "header").toString)
      }

      // 3. Commit: raw byte concat in part order (no decode, no recompress).
      def parts(sub: String): Seq[Path] = {
        val d = new Path(tmp, sub)
        if (!fs.exists(d)) Seq.empty
        else fs.listStatus(d).map(_.getPath)
          .filter(_.getName.startsWith("part-")).sortBy(_.getName).toSeq
      }
      val ordered = parts("header") ++ parts("data")
      // stitch into the tmp dir first, rename into place last: a driver
      // failure mid-copy leaves no partial target (rename is atomic on
      // HDFS/local; on object stores it degrades to copy — same as any
      // committer there)
      val staged = new Path(tmp, "stitched")
      val out = fs.create(staged, true)
      try {
        val buf = new Array[Byte](1 << 20)
        ordered.foreach { p =>
          val in = fs.open(p)
          try {
            var n = in.read(buf)
            while (n >= 0) { if (n > 0) out.write(buf, 0, n); n = in.read(buf) }
          } finally in.close()
        }
      } finally out.close()
      // the target may be a DIRECTORY (a prior directory-of-parts CSV
      // write at the same path): a non-recursive delete would fail and
      // surface as a confusing rename error — replace it wholesale, which
      // is what overwrite=true promised (existence was gated up front)
      if (fs.exists(target)) {
        val recursive = fs.getFileStatus(target).isDirectory
        require(fs.delete(target, recursive), s"could not delete existing $path")
      }
      require(fs.rename(staged, target), s"rename to $path failed")
    } finally fs.delete(tmp, true)
  }
}
