package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{DotProduct, DotProductExact, Md5Long60, MinHashSig,
  PortableRollingHash, SimHash60, WordShingles}

/** SparkSessionExtensions entry point: registers graft's compiled Catalyst
  * expressions as native SQL functions, so `spark.sql` users (and pure-SQL
  * tooling layered on the session) get the same fast paths as the Column
  * API in `graft.functions.ArrayOps` — callable as `dot_product(a, b)`,
  * `dot_product_exact(a, b)`, `rolling_hash_portable(arr)`.
  *
  * Wire-up (either mechanism works):
  * {{{
  *   SparkSession.builder()
  *     .withExtensions(new GraftExtensions)                       // in-code
  *     .config("spark.sql.extensions", classOf[GraftExtensions].getName)
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  private def reg(ext: SparkSessionExtensions, name: String, arity: Int,
                  usage: String)(build: Seq[Expression] => Expression): Unit =
    ext.injectFunction((FunctionIdentifier(name), info(name, usage),
      (args: Seq[Expression]) => {
        require(args.length == arity,
          s"$name expects $arity argument(s), got ${args.length}")
        build(args)
      }))

  override def apply(ext: SparkSessionExtensions): Unit = {
    // optimizer rules: interpreted HOF dot products → compiled DotProduct;
    // row_number()-over-window top-k filters → the custom TopK operator
    ext.injectOptimizerRule(_ => CompiledDotProductRule)
    ext.injectOptimizerRule(_ => WindowTopKRule)
    // physical strategy for the grouped top-k operator (TopKPerKeyNode →
    // partial heaps → exchange → final heaps)
    ext.injectPlannerStrategy(_ => TopKPerKeyStrategy)
    reg(ext, "dot_product", 2,
      "dot_product(a, b) - compiled double dot product of two numeric arrays") {
      args => DotProduct(args(0), args(1))
    }
    reg(ext, "dot_product_exact", 2,
      "dot_product_exact(a, b) - order-independent decimal-summed dot product") {
      args => DotProductExact(args(0), args(1))
    }
    reg(ext, "rolling_hash_portable", 1,
      "rolling_hash_portable(arr) - engine-portable rolling hash of a string array") {
      args => PortableRollingHash(args(0))
    }
    reg(ext, "md5_long60", 1,
      "md5_long60(s) - first 15 hex digits of md5(s) as a long (portable 60-bit hash)") {
      args => Md5Long60(args(0))
    }
    def litInt(e: Expression, what: String): Int = e match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
      case _ => throw new IllegalArgumentException(s"$what must be an int literal")
    }
    reg(ext, "minhash_sig", 3,
      "minhash_sig(words, n, k) - portable k-slot MinHash signature of a token array") {
      args => MinHashSig(args(0), litInt(args(1), "n"),
        graft.operators.Dedup.uhParams(litInt(args(2), "k")))
    }
    reg(ext, "simhash60", 1,
      "simhash60(words) - portable 60-bit SimHash of a token array") {
      args => SimHash60(args(0))
    }
    reg(ext, "word_shingles", 2,
      "word_shingles(words, n) - word n-gram shingle array (first-occurrence distinct)") {
      args => WordShingles(args(0), litInt(args(1), "n"))
    }
    reg(ext, "heavy_hitters", 2,
      "heavy_hitters(s, capacity) - Misra-Gries frequent-items sketch: " +
        "map<item, lower-bound count> (+ '__err__' -> error bound)") {
      args => graft.functions.MisraGries(args(0), litInt(args(1), "capacity"))
    }
  }
}
