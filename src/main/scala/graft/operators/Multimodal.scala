package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * payloads plus a typed metadata struct, with decode / feature-extract
  * running per-partition in bounded batches.
  *
  * The decode step itself is STUBBED (this container has no image/audio
  * codecs): [[decodeStub]] derives a deterministic fake feature vector from
  * the payload bytes. Everything around it — schema, per-partition
  * batching, feature column shape — is the real plumbing a codec plug-in
  * would drop into.
  */
object Multimodal {

  val metaSchema: StructType = StructType(Seq(
    StructField("kind", StringType),      // image | audio | video | other
    StructField("byte_len", IntegerType),
    StructField("source", StringType)))

  /** Wrap a string/binary column as (content binary, meta struct). */
  def asMultimodal(df: DataFrame, contentCol: String, kind: String,
      sourceCol: String): DataFrame =
    df.withColumn("content", col(contentCol).cast(BinaryType))
      .withColumn("meta", struct(
        lit(kind).as("kind"),
        octet_length(col("content")).as("byte_len"),
        col(sourceCol).cast(StringType).as("source")))

  /** STUB resize: truncate the payload to `targetBytes` and refresh
    * meta.byte_len. A real implementation decodes, resamples, re-encodes;
    * the plumbing a codec drops into — binary in, binary out, meta kept
    * consistent, pure codegen'd expressions, no driver involvement — is
    * what this exercises. */
  def resizeStub(df: DataFrame, contentCol: String = "content",
      targetBytes: Int = 64): DataFrame = {
    val resized = expr(s"substring($contentCol, 1, $targetBytes)")
    val d1 = df.withColumn(contentCol, resized)
    if (d1.columns.contains("meta"))
      d1.withColumn("meta", struct(
        col("meta.kind").as("kind"),
        octet_length(col(contentCol)).as("byte_len"),
        col("meta.source").as("source")))
    else d1
  }

  /** STUB frame sampling: split the payload into `frames` contiguous byte
    * slices and emit one row per (frame_idx, frame) — the row-fan-out shape
    * of real video frame extraction (a codec would decode and pick I-frames
    * instead of slicing bytes). posexplode keeps lineage to the source row;
    * partitioning is inherited, no shuffle. */
  def frameSampleStub(df: DataFrame, contentCol: String = "content",
      frames: Int = 4): DataFrame = {
    val fl = s"greatest(octet_length($contentCol) div $frames, 1)"
    val slices = expr(
      s"transform(sequence(0, $frames - 1), i -> substring($contentCol, i * ($fl) + 1, $fl))")
    df.select(df.columns.map(col) :+
      posexplode(slices).as(Seq("frame_idx", "frame")): _*)
  }

  /** STUB decode: deterministic pseudo-feature from payload bytes (md5 of
    * the bytes, folded into `dims` floats in [0,1)). A real deployment
    * replaces the body with a codec call; the signature — binary in,
    * float-array out, executed per partition in one pass — stays.
    */
  def decodeStub(df: DataFrame, contentCol: String = "content",
      dims: Int = 4): DataFrame = {
    require(dims <= 8, s"decodeStub folds a 16-byte md5 digest into byte " +
      s"pairs — at most 8 dims (got $dims)")
    val outSchema = df.schema.add(StructField("features", ArrayType(FloatType)))
    val contentIdx = df.schema.fieldIndex(contentCol)
    val rdd = df.rdd.mapPartitions { rows =>
      val digest = java.security.MessageDigest.getInstance("MD5")
      rows.map { r =>
        val bytes = r.get(contentIdx) match {
          case b: Array[Byte] => b
          case other => String.valueOf(other).getBytes("UTF-8")
        }
        digest.reset()
        val h = digest.digest(bytes)
        val feats = (0 until dims).map { i =>
          // ??? real codec goes here; fake: byte pairs -> [0,1)
          (((h(2 * i) & 0xff) << 8 | (h(2 * i + 1) & 0xff)).toFloat / 65536.0f)
        }.toArray
        Row.fromSeq(r.toSeq :+ feats)
      }
    }
    df.sparkSession.createDataFrame(rdd, outSchema)
  }
}
