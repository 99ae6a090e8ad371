package graft.compile

import graft.SparkSpec
import graft.api.FormulaEvaluator
import graft.model.Matrix

/** r11 axis=1 fuzz: the row-wise projection family (reductions, rank
  * with every method, cumulatives) against literal driver references on
  * seeded random frames with NaN holes. The projections are width-wise
  * expression folds, so this pins the fold order, skipna guards and the
  * ddof-1 edge behavior across shapes no hand-picked fixture covers. */
class AxisReducePropSpec extends SparkSpec {

  private val rnd = new scala.util.Random(421107)

  private def randMatrix(rows: Int, cols: Int): (Matrix, Seq[Seq[Double]]) = {
    val data = Seq.fill(rows)(Seq.fill(cols) {
      val r = rnd.nextInt(10)
      if (r == 0) Double.NaN else (rnd.nextInt(9) - 4).toDouble
    })
    (mat3(data, labels = (0 until cols).map(i => s"c$i")), data)
  }

  private def evalRows(m: Matrix, f: String): Seq[Seq[Double]] = {
    val ev = new FormulaEvaluator(reg("s" -> m), fillInvalid = false)
    val MatrixResult(df, rowId, labels, _) =
      ev.evaluateFormula(f): @unchecked
    val byId = cells(df, rowId, labels)
    byId.keys.toSeq.sorted.map(i => labels.map(l => byId(i)(l)))
  }

  private def chk(tag: String, got: Seq[Seq[Double]],
                  exp: Seq[Seq[Double]]): Unit =
    got.zip(exp).zipWithIndex.foreach { case ((gr, er), ri) =>
      gr.zip(er).zipWithIndex.foreach { case ((a, e), ci) =>
        if (e.isNaN) assert(a.isNaN, s"$tag [$ri][$ci]: expected NaN, got $a")
        else assert(math.abs(a - e) <= 1e-9,
          s"$tag [$ri][$ci]: expected $e, got $a")
      }
    }

  private def refReduce(row: Seq[Double], k: String): Double = {
    val ok = row.filter(!_.isNaN)
    k match {
      case "sum"   => ok.sum
      case "count" => ok.length.toDouble
      case "prod"  => ok.product
      case "nunique" => ok.distinct.length.toDouble
      case _ if ok.isEmpty => Double.NaN
      case "mean"  => ok.sum / ok.length
      case "min"   => ok.min
      case "max"   => ok.max
      case "median" =>
        val s = ok.sorted; val n = s.length
        if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
      case "var" | "std" | "sem" =>
        if (ok.length < 2) Double.NaN
        else {
          val m = ok.sum / ok.length
          val v = ok.map(x => (x - m) * (x - m)).sum / (ok.length - 1)
          k match {
            case "var" => v
            case "std" => math.sqrt(v)
            case _     => math.sqrt(v) / math.sqrt(ok.length.toDouble)
          }
        }
    }
  }

  private def refRank(row: Seq[Double], meth: String, asc: Boolean,
                      pct: Boolean): Seq[Double] = {
    val key: Double => Double = if (asc) identity else (x => -x)
    val ok = row.filter(!_.isNaN).map(key)
    val denom =
      (if (meth == "dense") ok.distinct.length else ok.length).toDouble
    row.zipWithIndex.map { case (x, j) =>
      if (x.isNaN) Double.NaN
      else {
        val kx = key(x)
        val less = ok.count(_ < kx).toDouble
        val eq = ok.count(_ == kx).toDouble
        val r = meth match {
          case "average" => less + (eq + 1) / 2
          case "min"     => less + 1
          case "max"     => less + eq
          case "first" =>
            less + row.take(j).count(v => !v.isNaN && key(v) == kx) + 1
          case _ => ok.distinct.count(_ < kx).toDouble + 1
        }
        if (pct) r / denom else r
      }
    }
  }

  private def refCum(row: Seq[Double], cm: String): Seq[Double] = {
    val fold: (Double, Double) => Double = cm match {
      case "cumsum" => _ + _; case "cumprod" => _ * _
      case "cummax" => math.max; case "cummin" => math.min
    }
    var acc = Double.NaN
    row.map { x =>
      if (x.isNaN) Double.NaN
      else { acc = if (acc.isNaN) x else fold(acc, x); acc }
    }
  }

  test("axis=1 reductions fuzz vs driver reference (40 frames)") {
    val kinds = Seq("sum", "mean", "min", "max", "count", "std", "var",
      "sem", "median", "prod", "nunique")
    for (_ <- 1 to 40) {
      val (m, data) = randMatrix(3 + rnd.nextInt(6), 1 + rnd.nextInt(5))
      val k = kinds(rnd.nextInt(kinds.length))
      val exp = data.map(r => Seq(refReduce(r, k)))
      if (exp.forall(_.forall(_.isNaN)))
        // e.g. sem(axis=1) on a 1-column frame: every row NaN → the
        // validator's V5 all-invalid contract raises by design
        intercept[graft.validate.AllInvalidResultException](
          evalRows(m, s"s.$k(axis=1)"))
      else chk(k, evalRows(m, s"s.$k(axis=1)"), exp)
    }
  }

  test("rank(axis=1) fuzz: every (method, ascending, pct) (60 frames)") {
    val methods = Seq("average", "min", "max", "first", "dense")
    for (_ <- 1 to 60) {
      val (m, data) = randMatrix(2 + rnd.nextInt(4), 2 + rnd.nextInt(4))
      val meth = methods(rnd.nextInt(methods.length))
      val asc = rnd.nextBoolean(); val pct = rnd.nextBoolean()
      val f = s"s.rank(axis=1, method='$meth', " +
        s"ascending=${if (asc) 1 else 0}, pct=${if (pct) 1 else 0})"
      chk(f, evalRows(m, f), data.map(refRank(_, meth, asc, pct)))
    }
  }

  test("cum*(axis=1) fuzz vs driver reference (40 frames)") {
    val kinds = Seq("cumsum", "cummax", "cummin", "cumprod")
    for (_ <- 1 to 40) {
      val (m, data) = randMatrix(3 + rnd.nextInt(5), 2 + rnd.nextInt(4))
      val cm = kinds(rnd.nextInt(kinds.length))
      chk(cm, evalRows(m, s"s.$cm(axis=1)"), data.map(refCum(_, cm)))
    }
  }
}
