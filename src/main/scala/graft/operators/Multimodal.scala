package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, plus decode / feature-extract / frame-sample stages.
  *
  * The actual codec step is STUBBED (no image/audio libraries in this
  * container — the "decode" is a deterministic fake), but the Spark-side
  * plumbing is real and tested: schema shape, binary handling, batch-wise
  * `mapPartitions` (the Scala analogue of `mapInPandas`), and the
  * partition-preserving pipeline layout a real codec UDF would slot into.
  *
  * Scale posture: media payloads stay opaque bytes end-to-end; nothing
  * shuffles them except the user's own repartition. Feature extraction is
  * mapPartitions (no shuffle, no driver collect); metadata extraction is a
  * pure projection.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("media", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("format", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("n_bytes", LongType))))))

  /** Wrap a text corpus as a fake media table: payload = utf-8 bytes,
    * metadata derived deterministically from the payload size. Stands in
    * for `spark.read.format("binaryFile")` over an object store. */
  def asMediaTable(docs: DataFrame, textCol: String = "text",
                   idCol: String = "doc_id"): DataFrame = {
    val bytes = encode(col(textCol), "UTF-8")
    docs.select(
      col(idCol).cast("long").as("media_id"),
      bytes.as("media"),
      struct(
        lit("fake/raw").as("format"),
        (octet_length(bytes) % 64 + 16).cast("int").as("width"),
        (octet_length(bytes) % 48 + 12).cast("int").as("height"),
        octet_length(bytes).cast("long").as("n_bytes")).as("meta"))
  }

  /** Metadata projection (no decode needed — pure codegen). */
  def extractMeta(media: DataFrame): DataFrame =
    media.select(
      col("media_id"),
      col("meta.format").as("format"),
      col("meta.width").as("width"),
      col("meta.height").as("height"),
      col("meta.n_bytes").as("n_bytes"))

  /** "Decode + feature-extract": batch-wise mapPartitions producing a
    * fixed-size feature vector per media item.
    *
    * STUB: a real pipeline would decode the image/audio here (e.g. JNI
    * codec) — this fake computes a 16-bin byte histogram, which is
    * deterministic and exercises the identical dataflow: binary in,
    * float-array out, partition-local, no shuffle.
    */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("features", ArrayType(FloatType))))
    val rdd = media.select("media_id", "media").rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val hist = new Array[Float](16)
        var i = 0
        while (i < bytes.length) { hist((bytes(i) & 0xFF) >> 4) += 1f; i += 1 }
        val n = math.max(1, bytes.length).toFloat
        Row(id, hist.map(_ / n).toSeq)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** "Frame sampling" for fake video payloads: every `stride`-th chunk of
    * `chunk` bytes, as an array of binary frames — array-native, no UDF. */
  def sampleFrames(media: DataFrame, chunk: Int = 32, stride: Int = 4): DataFrame =
    media.select(
      col("media_id"),
      transform(
        sequence(lit(0),
          greatest(((octet_length(col("media")) - 1) / (chunk * stride)).cast("int"),
            lit(0))),
        i => substring(col("media"), (i * chunk * stride + 1).cast("int"), lit(chunk)))
        .as("frames"))
      .select(col("media_id"), col("frames"),
        size(col("frames")).cast("long").as("n_frames"))

  /** "Resize": metadata-level transform (a real resize would be another
    * mapPartitions codec stage; the bookkeeping — new dims, same payload
    * identity — is what downstream stages consume). */
  def resizeMeta(media: DataFrame, w: Int, h: Int): DataFrame =
    media.select(
      col("media_id"), col("media"),
      struct(col("meta.format").as("format"),
        lit(w).cast("int").as("width"), lit(h).cast("int").as("height"),
        col("meta.n_bytes").as("n_bytes")).as("meta"))
}
