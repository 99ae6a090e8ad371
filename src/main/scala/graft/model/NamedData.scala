package graft.model

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Named-data registry (SURVEY.md §1.1).
  *
  * The reference's "catalog" is a flat `dict[str, DataFrame | Series]`
  * (reference: coeff_maker.py:592, 600-604). Ours is `Map[String, NamedData]`
  * with two realizations:
  *
  *  - [[Matrix]]: a distributed 2-D table. pandas' row index becomes an
  *    explicit `rowId` key column (SURVEY §1.3 — the single most load-bearing
  *    translation); column labels map to physical columns of a backing
  *    DataFrame. Several matrices may share one backing DataFrame (`base eq`),
  *    in which case formula compilation needs NO join at all — a pure
  *    single-scan projection. This is the 100 TB fast path.
  *
  *  - [[Vec]]: a 1-D vector. The reference converts Series to bare positional
  *    ndarrays before eval (coeff_maker.py:752-763), so vectors combine with
  *    matrices by COLUMN POSITION, not by label (SURVEY §2.3 A2/A3
  *    [verified]). Vectors are tiny (one entry per matrix column) and live on
  *    the driver; they compile to literals in the projection — no shuffle, no
  *    broadcast join needed.
  */
sealed trait NamedData

/** A 2-D matrix view over a backing DataFrame.
  *
  * @param base      backing DataFrame (may be shared between matrices)
  * @param rowId     physical column holding the row label (the pandas index)
  * @param cols      (label → physical column) in pandas column order
  */
final case class Matrix(base: DataFrame, rowId: String, cols: Seq[(String, String)])
    extends NamedData {
  def labels: Seq[String] = cols.map(_._1)
  require(cols.nonEmpty, "Matrix must have at least one value column")
}

object Matrix {
  /** Matrix whose labels are the physical column names. */
  def of(base: DataFrame, rowId: String, labels: Seq[String]): Matrix =
    Matrix(base, rowId, labels.map(l => (l, l)))
}

/** A driver-resident 1-D vector (pandas Series → positional ndarray). */
final case class Vec(values: IndexedSeq[Double], labels: IndexedSeq[String])
    extends NamedData {
  require(values.length == labels.length, "Vec values/labels length mismatch")
  def length: Int = values.length
}

object Vec {
  def apply(values: Seq[Double]): Vec =
    Vec(values.toIndexedSeq, values.indices.map(_.toString).toIndexedSeq)
}

/** Session-level numeric mode (SURVEY §1.2).
  *
  * Standard mode = DoubleType (bit-parity with numpy float64 incl. NaN/Inf).
  * ADP mode = DecimalType(38, scale) — the Spark-native analogue of the
  * reference's arbitrary-decimal-precision mpmath mode
  * (coeff_maker.py:647-671); divergences documented in SURVEY §7.4(5).
  * Unbounded ADP mode (`adpEnabled && unbounded`) = canonical decimal
  * STRING cells computed by the [[graft.functions.BigDecMath]] Catalyst
  * family — `java.math.BigDecimal` arithmetic with an unbounded exponent,
  * covering the reference's mpf 1e-30/1e30 extreme-magnitude regime that
  * the fixed DecimalType geometry cannot represent (`+ - *` exact, `/` at
  * `decimalPrecision` significant digits).
  */
final case class NumericMode(adpEnabled: Boolean, decimalPrecision: Int,
                             unbounded: Boolean = false) {
  require(decimalPrecision > 0, "decimal_precision must be > 0") // F5 contract
  /** Spark decimal cell geometry (bounded ADP). Spark's division rule gives
    * the result scale max(6, 38 - (p1 - s1 + s2)); a (24,12) cell keeps 14
    * fractional digits through division while allowing 12 integer digits.
    * The extreme-exponent regime beyond this geometry is covered by the
    * unbounded mode (SURVEY §7.4(5)).
    */
  val decimalCellPrecision: Int = math.min(24, math.max(6, decimalPrecision))
  val decimalScale: Int = decimalCellPrecision / 2
  val ubp: Boolean = adpEnabled && unbounded
  val cellType: DataType =
    if (ubp) StringType
    else if (adpEnabled) DecimalType(decimalCellPrecision, decimalScale)
    else DoubleType
}

object NumericMode {
  val Standard: NumericMode = NumericMode(adpEnabled = false, 35)
}

/** Ingest: the Spark analogue of the reference's construction-time cast
  * (S1/S2, coeff_maker.py:633-671). Non-numeric input raises at construction
  * (quirk Q10); null cells become NaN (pandas has no null/NaN distinction —
  * SURVEY §7.4(2): `null` never escapes the engine in standard mode).
  */
object Ingest {

  private val numericTypes: Set[DataType] =
    Set(DoubleType, FloatType, LongType, IntegerType, ShortType, ByteType)

  /** Cast a single physical column to the session cell type, strictly.
    * Unbounded ADP additionally accepts STRING columns holding exact
    * decimal text (the mpf-literal ingest path, e.g. "1e-30") — parsed and
    * canonicalized by BdNorm, which raises on non-numeric content. */
  def castCell(df: DataFrame, phys: String, mode: NumericMode): Column = {
    val dt = df.schema(phys).dataType
    val ok = numericTypes.contains(dt) || dt.isInstanceOf[DecimalType] ||
      (mode.ubp && dt == StringType)
    if (!ok)
      throw new IllegalArgumentException(
        s"could not convert column '$phys' of type ${dt.simpleString} to " +
          s"${mode.cellType.simpleString}: non-numeric input data " +
          "(the engine casts every cell at construction; see reference " +
          "coeff_maker.py:633-638)")
    if (mode.ubp)
      // numeric → shortest-decimal string (Spark's double→string cast),
      // then canonicalize/parse-check; exact for every physical type
      graft.functions.BigDec.norm(col(phys).cast(StringType))
    else if (mode.adpEnabled) col(phys).cast(mode.cellType)
    else coalesce(col(phys).cast(DoubleType), lit(Double.NaN))
  }

  /** Build a Matrix from a DataFrame, casting value columns strictly. The
    * result's matrices share ONE projected base, so formulas over them
    * compile join-free.
    */
  def matrix(df: DataFrame, rowId: String, valueCols: Seq[String],
             mode: NumericMode = NumericMode.Standard): Matrix = {
    val projected = df.select(
      (col(rowId) +: valueCols.map(c => castCell(df, c, mode).as(c))): _*)
    Matrix.of(projected, rowId, valueCols)
  }

  /** Read a parquet file as a Matrix (driver-harness ingest path). */
  def parquetMatrix(spark: SparkSession, path: String, rowId: String,
                    valueCols: Seq[String],
                    mode: NumericMode = NumericMode.Standard): Matrix = {
    val df = spark.read.parquet(path)
    matrix(df, rowId, valueCols, mode)
  }

  /** Read a header CSV as a Matrix. Standard/bounded-ADP modes infer
    * numeric types from the text; unbounded ADP deliberately KEEPS cells
    * as text so decimal literals ("1e-30", 40-digit mantissas) ingest
    * EXACTLY — `BdNorm` parses the string straight to BigDecimal with no
    * double round-trip, the mpf-literal parity path the reference gets
    * from python floats-in-CSV only approximately. Malformed numerics
    * fail the construction-time strict cast either way. */
  def csvMatrix(spark: SparkSession, path: String, rowId: String,
                valueCols: Seq[String],
                mode: NumericMode = NumericMode.Standard): Matrix = {
    val reader = spark.read.option("header", "true")
    val df =
      if (mode.ubp) reader.csv(path)
      else reader.option("inferSchema", "true").csv(path)
    matrix(df, rowId, valueCols, mode)
  }

  /** Read JSON-lines as a Matrix (schema inferred; same strict cast). */
  def jsonMatrix(spark: SparkSession, path: String, rowId: String,
                 valueCols: Seq[String],
                 mode: NumericMode = NumericMode.Standard): Matrix = {
    matrix(spark.read.json(path), rowId, valueCols, mode)
  }

  /** Read ORC as a Matrix (the second typed columnar format Spark ships
    * natively; same construction-time strict cast as parquet — ORC
    * carries real column types, so no inference step is involved). */
  def orcMatrix(spark: SparkSession, path: String, rowId: String,
                valueCols: Seq[String],
                mode: NumericMode = NumericMode.Standard): Matrix =
    matrix(spark.read.orc(path), rowId, valueCols, mode)

  /** Persist a matrix backing bucketed+sorted by its row id. Two matrices
    * written this way with the SAME bucket count co-locate: the alignment
    * full-outer join (SURVEY §2.3 A1) plans with ZERO Exchange — at 100 TB
    * this turns the only shuffle in the engine into a local merge per
    * bucket. Read back with [[bucketedMatrix]].
    */
  def writeBucketed(m: Matrix, table: String, buckets: Int): Unit = {
    val spark = m.base.sparkSession
    // a fresh in-memory catalog doesn't know about a previous session's
    // table, but its warehouse directory survives and blocks saveAsTable
    // (LOCATION_ALREADY_EXISTS) — drop both before writing
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    m.base.write.mode("overwrite")
      .bucketBy(buckets, m.rowId).sortBy(m.rowId)
      .saveAsTable(table)
  }

  /** Matrix over a bucketed table written by [[writeBucketed]]. */
  def bucketedMatrix(spark: SparkSession, table: String, rowId: String,
                     valueCols: Seq[String]): Matrix =
    Matrix.of(spark.table(table), rowId, valueCols)

  /** Ingest-time transpose: the sanctioned route for the reference's
    * matrix `.T` (pd.eval python-engine attribute access, SURVEY §8 Q8),
    * which the formula compiler rejects — a distributed row↔column
    * transpose would turn data-scaled row ids into schema columns. Here
    * the constraint is explicit: the SOURCE must be schema-small in rows
    * (its row ids become the result's column set, and a Spark schema is
    * driver-side metadata), so the collect is bounded by `cap` and a
    * too-large frame fails loudly instead of materializing. Column order
    * of the result = row-id order of the source (the engine's ordering
    * contract); source column labels become the result's row ids, in
    * pandas column order; null/NaN cells stay NaN.
    */
  def transposedMatrix(m: Matrix, cap: Int = 10000): Matrix = {
    // order by the row id in its NATIVE type BEFORE the string cast —
    // casting first would sort numeric ids lexicographically
    // (0,1,10,11,…,2) once there are ≥10 rows, breaking "column order =
    // row-id order of the source"
    val taken = m.base
      .orderBy(col(m.rowId))
      .select((col(m.rowId).cast(StringType) +:
        m.cols.map { case (_, p) => col(p).cast(DoubleType) }): _*)
      .limit(cap + 1).collect()
    if (taken.length > cap)
      throw new IllegalArgumentException(
        s"cannot transpose a matrix with more than $cap rows: its row ids " +
          "would become schema columns (driver-side metadata). Raise `cap` " +
          "only if the frame is genuinely schema-small.")
    val ids = taken.map(_.getString(0)).toSeq
    require(ids.distinct.length == ids.length,
      "cannot transpose: duplicate row ids would collide as column names")
    val schema = StructType(StructField("__row_id__", StringType) +:
      ids.map(id => StructField(id, DoubleType)))
    val data = m.cols.zipWithIndex.map { case ((lbl, _), i) =>
      org.apache.spark.sql.Row.fromSeq(lbl +: taken.map(r =>
        if (r.isNullAt(i + 1)) Double.NaN else r.getDouble(i + 1)).toSeq)
    }
    val df = m.base.sparkSession.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(data).asJava), schema)
    Matrix.of(df, "__row_id__", ids)
  }

  /** Collect a tiny 2-column DataFrame (label, value) into a Vec. Vectors are
    * one-entry-per-matrix-column; collecting them is the reference's own
    * semantics (Series → ndarray on the driver).
    */
  def vec(df: DataFrame, labelCol: String, valueCol: String): Vec = {
    val rows = df.select(col(labelCol).cast(StringType),
                         col(valueCol).cast(DoubleType)).collect()
    Vec(rows.map(r => if (r.isNullAt(1)) Double.NaN else r.getDouble(1)).toIndexedSeq,
        rows.map(_.getString(0)).toIndexedSeq)
  }
}
