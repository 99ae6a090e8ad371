package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, plus decode / feature-extract / frame-sample stages.
  *
  * Eight REAL codecs ship — RIFF/WAVE (PCM16) and BMP (24 bpp) as of r6;
  * PNG (8-bit RGB/RGBA, zlib + all five scanline filters, CRC-verified),
  * GIF89a (indexed color, variable-width 9→12-bit LZW), baseline TIFF
  * (little-endian IFD walk, out-of-line BitsPerSample, single strip) and
  * G.711 µ-law/A-law WAV as of r7; baseline JPEG (SOF0: marker walk,
  * canonical Huffman from DHT, dequant, real 2-D IDCT, fixed-point
  * YCbCr→RGB) as of r8 — pure-JVM byte-level parsers in [[MediaCodec]]
  * with encoder round-trips and analytic oracle rows (`mm_wav`/`mm_bmp`/
  * `mm_png`/`mm_gif`/`mm_tiff`/`mm_ulaw`/`mm_alaw`/`mm_jpeg`).
  * Formats that genuinely need native libraries (MP3, H.264, …)
  * remain stubbed behind the same dataflow: the
  * `asMediaTable`/`extractFeatures` fake exercises the identical
  * batch-wise `mapPartitions` shape (the Scala analogue of `mapInPandas`)
  * a JNI codec stage would slot into.
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

  // ---- REAL codecs (r6): RIFF/WAVE + BMP, pure JVM — see [[MediaCodec]] ----

  /** Synthesize a VALID PCM16 WAV per document: duration scales with the
    * token count, samples from a deterministic LCG seeded by the id (a
    * reproducible stand-in for real recordings — the parse side cannot
    * tell the difference). */
  def asWavTable(docs: DataFrame, idCol: String = "doc_id",
                 textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("media", BinaryType),
      StructField("meta", StructType(Seq(
        StructField("format", StringType),
        StructField("n_bytes", LongType))))))
    val rdd = docs.select(col(idCol).cast("long"),
        TextAnalysis.tokenCount(col(textCol))).rdd
      .mapPartitions { it =>
        it.map { r =>
          val id = r.getLong(0); val nTok = r.getLong(1)
          val n = (nTok * 16).toInt.max(16)
          val samples = new Array[Short](n)
          var s = id * 6364136223846793005L + 1442695040888963407L
          var i = 0
          while (i < n) {
            s = s * 6364136223846793005L + 1442695040888963407L
            samples(i) = ((s >>> 48).toShort)
            i += 1
          }
          val bytes = MediaCodec.wavBytes(samples, 16000)
          Row(id, bytes, Row("audio/wav", bytes.length.toLong))
        }
      }
    spark.createDataFrame(rdd, outSchema)
  }

  /** REAL decode: parse the RIFF chunk list, validate PCM16, fold samples
    * to RMS/peak — one `mapPartitions` pass, binary in, features out, the
    * exact dataflow a JNI codec stage would use. */
  def decodeWav(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("sample_rate", IntegerType),
      StructField("channels", IntegerType),
      StructField("n_samples", IntegerType),
      StructField("duration_ms", DoubleType),
      StructField("rms", DoubleType),
      StructField("peak", IntegerType)))
    val rdd = media.select("media_id", "media").rdd.mapPartitions { it =>
      it.map { r =>
        val info = MediaCodec.parseWav(r.getAs[Array[Byte]](1))
        Row(r.getLong(0), info.sampleRate, info.channels, info.nSamples,
          info.durationMs, info.rms, info.peak)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Synthesize a VALID 24 bpp BMP per document: dimensions and a smooth
    * deterministic gradient derived from the id. */
  def asBmpTable(docs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("media", BinaryType),
      StructField("meta", StructType(Seq(
        StructField("format", StringType),
        StructField("n_bytes", LongType))))))
    val rdd = docs.select(col(idCol).cast("long")).rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val w = 16 + (id % 17).toInt; val h = 12 + (id % 11).toInt
        val bytes = MediaCodec.bmpBytes(w, h, (x, y) => {
          val v = (x * 255 / math.max(1, w - 1) + id).toInt & 0xFF
          val u = (y * 255 / math.max(1, h - 1) + id * 3).toInt & 0xFF
          (v << 16) | (u << 8) | ((v + u) / 2)
        })
        Row(id, bytes, Row("image/bmp", bytes.length.toLong))
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Synthesize a VALID 8-bit PNG per document: even ids encode RGBA
    * (color type 6), odd ids RGB (color type 2); pixel channels are
    * integer functions of (x, y, id) the oracle reproduces in SQL, and
    * the encoder cycles through all five PNG scanline filters, so the
    * decode exercises zlib + un-filtering on every image. */
  def asPngTable(docs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("media", BinaryType),
      StructField("meta", StructType(Seq(
        StructField("format", StringType),
        StructField("n_bytes", LongType))))))
    val rdd = docs.select(col(idCol).cast("long")).rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val w = 8 + (id % 13).toInt; val h = 6 + (id % 7).toInt
        val withAlpha = id % 2 == 0
        val bytes = MediaCodec.pngBytes(w, h, (x, y) => {
          val rC = ((x.toLong * 255 / (w - 1) + id) % 256).toInt
          val gC = ((y.toLong * 255 / (h - 1) + id * 3) % 256).toInt
          val bC = (rC + gC) / 2
          val aC = ((x + y + 7 * id) % 256).toInt
          (aC << 24) | (rC << 16) | (gC << 8) | bC
        }, withAlpha)
        Row(id, bytes, Row("image/png", bytes.length.toLong))
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** REAL PNG decode + resize: chunk walk (CRC-verified), zlib inflate,
    * scanline un-filter, per-channel means, and a nearest-neighbor
    * grayscale thumbnail — the embedding-model preprocessing shape. */
  def decodePng(media: DataFrame, thumbW: Int = 4, thumbH: Int = 4): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("color_type", IntegerType),
      StructField("mean_r", DoubleType),
      StructField("mean_g", DoubleType),
      StructField("mean_b", DoubleType),
      StructField("mean_a", DoubleType),
      StructField("thumb", ArrayType(FloatType))))
    val rdd = media.select("media_id", "media").rdd.mapPartitions { it =>
      it.map { r =>
        val bytes = r.getAs[Array[Byte]](1)
        val info = MediaCodec.parsePng(bytes)
        val thumb = MediaCodec.pngResizeGray(bytes, thumbW, thumbH)
        Row(r.getLong(0), info.width, info.height, info.colorType,
          info.meanR, info.meanG, info.meanB, info.meanA, thumb.toSeq)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Synthesize a VALID GIF89a per document: 256-entry global color table
    * with palette(i) = (i, 2i mod 256, 3i mod 256), pixel indices
    * (x·7 + y·11 + id) mod 256 — integer functions the oracle reproduces
    * in SQL. Dimensions up to 40×30 push the LZW dictionary past 512
    * entries, so the variable-width 9→10-bit code growth is exercised on
    * real catalog data, not just in the spec. */
  def asGifTable(docs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("media", BinaryType),
      StructField("meta", StructType(Seq(
        StructField("format", StringType),
        StructField("n_bytes", LongType))))))
    val rdd = docs.select(col(idCol).cast("long")).rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val w = 10 + (id % 31).toInt; val h = 8 + (id % 23).toInt
        val bytes = MediaCodec.gifBytes(w, h,
          i => (i << 16) | (((2 * i) % 256) << 8) | ((3 * i) % 256),
          (x, y) => ((x * 7 + y * 11 + id) % 256).toInt)
        Row(id, bytes, Row("image/gif", bytes.length.toLong))
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** REAL GIF decode + resize: header/descriptor walk, sub-block
    * reassembly, variable-width LZW decompression, palette lookup,
    * per-channel means and a nearest-neighbor grayscale thumbnail. */
  def decodeGif(media: DataFrame, thumbW: Int = 4, thumbH: Int = 4): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("gct_size", IntegerType),
      StructField("mean_r", DoubleType),
      StructField("mean_g", DoubleType),
      StructField("mean_b", DoubleType),
      StructField("thumb", ArrayType(FloatType))))
    val rdd = media.select("media_id", "media").rdd.mapPartitions { it =>
      it.map { r =>
        val bytes = r.getAs[Array[Byte]](1)
        val info = MediaCodec.parseGif(bytes)
        val thumb = MediaCodec.gifResizeGray(bytes, thumbW, thumbH)
        Row(r.getLong(0), info.width, info.height, info.gctSize,
          info.meanR, info.meanG, info.meanB, thumb.toSeq)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Synthesize a VALID baseline JPEG (SOF0, 4:4:4) per document:
    * block-aligned dimensions, each 8×8 block a constant (Y, Cb, Cr)
    * triple that is an integer function of (bx, by, id) — the DC-only
    * construction where the decode (Huffman, dequant, IDCT, fixed-point
    * color transform) is integer-exact, so the oracle predicts the
    * decoded RGB content analytically. Even ids are color, odd ids
    * grayscale (1-component frames). */
  def asJpegTable(docs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("media", BinaryType),
      StructField("meta", StructType(Seq(
        StructField("format", StringType),
        StructField("n_bytes", LongType))))))
    val rdd = docs.select(col(idCol).cast("long")).rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val w = 8 * (2 + (id % 4).toInt); val h = 8 * (1 + (id % 3).toInt)
        val gray = id % 2 == 1
        val bytes = MediaCodec.jpegBytes(w, h, (bx, by) => (
          ((bx * 17 + by * 29 + id) % 256).toInt,
          ((bx * 5 + by * 3 + 2 * id) % 256).toInt,
          ((bx * 11 + by * 7 + 3 * id) % 256).toInt), gray)
        Row(id, bytes, Row("image/jpeg", bytes.length.toLong))
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** REAL baseline JPEG decode + resize: marker walk, canonical Huffman
    * rebuild from DHT, DC-diff + AC run-length entropy decode, dezigzag,
    * dequant, 2-D IDCT, fixed-point YCbCr→RGB, per-channel means and a
    * nearest-neighbor grayscale thumbnail. */
  def decodeJpeg(media: DataFrame, thumbW: Int = 4, thumbH: Int = 4): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("n_components", IntegerType),
      StructField("mean_r", DoubleType),
      StructField("mean_g", DoubleType),
      StructField("mean_b", DoubleType),
      StructField("thumb", ArrayType(FloatType))))
    val rdd = media.select("media_id", "media").rdd.mapPartitions { it =>
      it.map { r =>
        val bytes = r.getAs[Array[Byte]](1)
        val info = MediaCodec.parseJpeg(bytes)
        val thumb = MediaCodec.jpegResizeGray(bytes, thumbW, thumbH)
        Row(r.getLong(0), info.width, info.height, info.nComponents,
          info.meanR, info.meanG, info.meanB, thumb.toSeq)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Synthesize a VALID G.711 µ-law WAV per document (format code 7,
    * 8 kHz mono): companded bytes are a deterministic integer function of
    * (i, id), so — unlike the PCM16 LCG synth — the oracle can expand
    * them through the exact G.711 bit formula and predict the decoded
    * CONTENT (mean |PCM|, peak), not just the header fields. */
  def asUlawTable(docs: DataFrame, idCol: String = "doc_id",
                  textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("media", BinaryType),
      StructField("meta", StructType(Seq(
        StructField("format", StringType),
        StructField("n_bytes", LongType))))))
    val rdd = docs.select(col(idCol).cast("long"),
        TextAnalysis.tokenCount(col(textCol))).rdd
      .mapPartitions { it =>
        it.map { r =>
          val id = r.getLong(0); val nTok = r.getLong(1)
          val n = math.min(2048L, math.max(16L, nTok * 4)).toInt
          val ulaw = new Array[Byte](n)
          var i = 0
          while (i < n) { ulaw(i) = ((i * 7 + id) % 256).toByte; i += 1 }
          val bytes = MediaCodec.ulawWavBytes(ulaw, 8000)
          Row(id, bytes, Row("audio/basic", bytes.length.toLong))
        }
      }
    spark.createDataFrame(rdd, outSchema)
  }

  /** REAL µ-law decode: RIFF walk, G.711 expansion of every byte, decoded
    * content features. */
  def decodeUlaw(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("sample_rate", IntegerType),
      StructField("channels", IntegerType),
      StructField("n_samples", IntegerType),
      StructField("mean_abs", DoubleType),
      StructField("peak", IntegerType)))
    val rdd = media.select("media_id", "media").rdd.mapPartitions { it =>
      it.map { r =>
        val info = MediaCodec.parseUlawWav(r.getAs[Array[Byte]](1))
        Row(r.getLong(0), info.sampleRate, info.channels, info.nSamples,
          info.meanAbs, info.peak)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Synthesize a VALID FLAC stream per document (r9): mono 16-bit
    * 8 kHz, PCM samples a deterministic integer function of (i, id) —
    * every fifth document a CONSTANT signal (exercising CONSTANT
    * subframes), the rest a sawtooth whose fixed-predictor residuals
    * Rice-code (FIXED subframes). FLAC is LOSSLESS, so the decode must
    * return these samples bit-exactly and the oracle predicts the decoded
    * CONTENT (mean |pcm|, peak) from the formula alone. */
  def asFlacTable(docs: DataFrame, idCol: String = "doc_id",
                  textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("media", BinaryType),
      StructField("meta", StructType(Seq(
        StructField("format", StringType),
        StructField("n_bytes", LongType))))))
    val rdd = docs.select(col(idCol).cast("long"),
        TextAnalysis.tokenCount(col(textCol))).rdd
      .mapPartitions { it =>
        it.map { r =>
          val id = r.getLong(0); val nTok = r.getLong(1)
          val n = math.min(2048L, math.max(16L, nTok * 4)).toInt
          val pcm = new Array[Int](n)
          var i = 0
          while (i < n) {
            pcm(i) =
              if (id % 5 == 0) (((id % 100) - 50) * 100).toInt
              else ((((i * 7 + id) % 256) - 128) * 64).toInt
            i += 1
          }
          val bytes = MediaCodec.flacBytes(pcm, 8000)
          Row(id, bytes, Row("audio/flac", bytes.length.toLong))
        }
      }
    spark.createDataFrame(rdd, outSchema)
  }

  /** REAL FLAC decode: metadata walk, frame/subframe parse, Rice residual
    * decode, fixed-predictor reconstruction, both CRCs verified — decoded
    * content features. */
  def decodeFlac(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("sample_rate", IntegerType),
      StructField("channels", IntegerType),
      StructField("bits", IntegerType),
      StructField("n_samples", IntegerType),
      StructField("mean_abs", DoubleType),
      StructField("peak", IntegerType)))
    val rdd = media.select("media_id", "media").rdd.mapPartitions { it =>
      it.map { r =>
        val info = MediaCodec.parseFlac(r.getAs[Array[Byte]](1))
        Row(r.getLong(0), info.sampleRate, info.channels,
          info.bitsPerSample, info.nSamples, info.meanAbs, info.peak)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** A-law sibling of [[asUlawTable]] (format code 6; same deterministic
    * byte synth, shifted so the two signals differ). */
  def asAlawTable(docs: DataFrame, idCol: String = "doc_id",
                  textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("media", BinaryType),
      StructField("meta", StructType(Seq(
        StructField("format", StringType),
        StructField("n_bytes", LongType))))))
    val rdd = docs.select(col(idCol).cast("long"),
        TextAnalysis.tokenCount(col(textCol))).rdd
      .mapPartitions { it =>
        it.map { r =>
          val id = r.getLong(0); val nTok = r.getLong(1)
          val n = math.min(2048L, math.max(16L, nTok * 4)).toInt
          val alaw = new Array[Byte](n)
          var i = 0
          while (i < n) { alaw(i) = ((i * 11 + 3 * id) % 256).toByte; i += 1 }
          val bytes = MediaCodec.alawWavBytes(alaw, 8000)
          Row(id, bytes, Row("audio/alaw", bytes.length.toLong))
        }
      }
    spark.createDataFrame(rdd, outSchema)
  }

  /** REAL A-law decode (format code 6) — decoded content features. */
  def decodeAlaw(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("sample_rate", IntegerType),
      StructField("channels", IntegerType),
      StructField("n_samples", IntegerType),
      StructField("mean_abs", DoubleType),
      StructField("peak", IntegerType)))
    val rdd = media.select("media_id", "media").rdd.mapPartitions { it =>
      it.map { r =>
        val info = MediaCodec.parseAlawWav(r.getAs[Array[Byte]](1))
        Row(r.getLong(0), info.sampleRate, info.channels, info.nSamples,
          info.meanAbs, info.peak)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Synthesize a VALID baseline little-endian TIFF per document (8-bit
    * RGB, single strip, out-of-line BitsPerSample) — the IFD tag walk is
    * the part a TIFF reader genuinely exercises. Pixel channels are
    * integer functions of (x, y, id) the oracle reproduces in SQL. */
  def asTiffTable(docs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("media", BinaryType),
      StructField("meta", StructType(Seq(
        StructField("format", StringType),
        StructField("n_bytes", LongType))))))
    val rdd = docs.select(col(idCol).cast("long")).rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val w = 9 + (id % 19).toInt; val h = 7 + (id % 13).toInt
        val bytes = MediaCodec.tiffBytes(w, h, (x, y) => {
          val rC = ((x * 5 + id) % 256).toInt
          val gC = ((y * 7 + 2 * id) % 256).toInt
          val bC = ((x + y + 3 * id) % 256).toInt
          (rC << 16) | (gC << 8) | bC
        })
        Row(id, bytes, Row("image/tiff", bytes.length.toLong))
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** REAL TIFF decode + resize: IFD walk (out-of-line BitsPerSample,
    * strip checks), per-channel means, grayscale thumbnail. */
  def decodeTiff(media: DataFrame, thumbW: Int = 4, thumbH: Int = 4): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("samples_per_pixel", IntegerType),
      StructField("mean_r", DoubleType),
      StructField("mean_g", DoubleType),
      StructField("mean_b", DoubleType),
      StructField("thumb", ArrayType(FloatType))))
    val rdd = media.select("media_id", "media").rdd.mapPartitions { it =>
      it.map { r =>
        val bytes = r.getAs[Array[Byte]](1)
        val info = MediaCodec.parseTiff(bytes)
        val thumb = MediaCodec.tiffResizeGray(bytes, thumbW, thumbH)
        Row(r.getLong(0), info.width, info.height, info.samplesPerPixel,
          info.meanR, info.meanG, info.meanB, thumb.toSeq)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** REAL image decode + resize: parse the BMP header, per-channel means,
    * and a nearest-neighbor grayscale thumbnail — the embedding-model
    * preprocessing shape (decode → resize → float tensor). */
  def decodeBmp(media: DataFrame, thumbW: Int = 4, thumbH: Int = 4): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("mean_r", DoubleType),
      StructField("mean_g", DoubleType),
      StructField("mean_b", DoubleType),
      StructField("thumb", ArrayType(FloatType))))
    val rdd = media.select("media_id", "media").rdd.mapPartitions { it =>
      it.map { r =>
        val bytes = r.getAs[Array[Byte]](1)
        val info = MediaCodec.parseBmp(bytes)
        val thumb = MediaCodec.bmpResizeGray(bytes, thumbW, thumbH)
        Row(r.getLong(0), info.width, info.height,
          info.meanR, info.meanG, info.meanB, thumb.toSeq)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }
}
