package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video payloads travel as opaque
  * `binary` columns with a typed metadata struct. The Spark-side shape —
  * schema, partition-parallel batch processing, feature extraction — is
  * real and tested; the codec itself is STUBBED with a deterministic fake
  * (this container has no image/audio libraries), clearly marked below.
  * Swap `decodeStub` for a real decoder (e.g. javax.imageio / ffmpeg via
  * mapPartitions, or a Pandas UDF in PySpark) without touching callers.
  */
object Multimodal {

  /** media struct: payload + typed metadata, the storage contract. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("bytes", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("format", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("n_frames", IntegerType)
    )))
  ))

  /** Wrap a binary column into the media contract, inferring cheap
    * metadata from magic bytes (real logic — works on actual files). */
  def asMedia(df: DataFrame, binCol: String): DataFrame = {
    val magic = udf { (b: Array[Byte]) =>
      if (b == null || b.length < 4) "unknown"
      else if (b(0) == 0x89.toByte && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') "png"
      else if (b(0) == 0xFF.toByte && b(1) == 0xD8.toByte) "jpeg"
      else if (b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F') "riff"
      else if (b(0) == 'I' && b(1) == 'D' && b(2) == '3') "mp3"
      else "unknown"
    }
    df.withColumn("media", struct(
      col(binCol).as("bytes"),
      struct(
        magic(col(binCol)).as("format"),
        lit(null).cast(IntegerType).as("width"),
        lit(null).cast(IntegerType).as("height"),
        lit(null).cast(IntegerType).as("n_frames")).as("meta")))
  }

  /** ====== STUB ======
    * Deterministic fake "decode + feature extraction": a real
    * implementation would decode pixels/samples here. The fake derives a
    * fixed-length feature vector from a rolling hash of the payload so the
    * pipeline (schema, batching, partition parallelism, downstream
    * similarity joins) is fully exercisable and reproducible. */
  def decodeStub(bytes: Array[Byte], featureDim: Int): Array[Float] = {
    val out = new Array[Float](featureDim)
    if (bytes == null) return out
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL); h *= 0x100000001b3L
      out(i % featureDim) += ((h % 1000L).toFloat / 1000.0f)
      i += 1
    }
    out
  }

  /** Batch feature extraction over the media column: runs per-partition,
    * constant memory, parallel across the cluster. The stub stands in for
    * the decoder; the plumbing (mapPartitions over binary payloads,
    * typed output schema) is the real article. */
  def extractFeatures(df: DataFrame, featureDim: Int = 16): DataFrame = {
    val extract = udf((b: Array[Byte]) => decodeStub(b, featureDim))
    df.withColumn("features", extract(col("media.bytes")))
      .withColumn("payload_size", octet_length(col("media.bytes")))
  }

  /** Frame sampling contract for video payloads: every `stride`-th frame
    * index up to `maxFrames` — index plumbing is real; frame extraction
    * is the same stub boundary. */
  def sampleFrameIndexes(nFrames: Column, stride: Int, maxFrames: Int) =
    slice(sequence(lit(0), greatest(nFrames - 1, lit(0)), lit(stride)), 1, maxFrames)
}
