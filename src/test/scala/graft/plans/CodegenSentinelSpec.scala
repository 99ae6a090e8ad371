package graft.plans

import org.scalatest.funsuite.AnyFunSuite

/** Pins the codegen-fallback tripwire's wiring (r12, hardened r13): an
  * ERROR carrying the codegen-failure signature from a CodeGenerator
  * logger — the exact (logger, level, message) triple Spark emits on a
  * Janino 64 KB fallback, through the same additivity path Spark's own
  * loggers take — increments the counter; unrelated errors, WARN-level
  * events, and the SAME message from a NON-CodeGenerator logger (the r12
  * overcount hole) do not. CodegenGateSpec proves a REAL overflow trips
  * it end-to-end. */
class CodegenSentinelSpec extends AnyFunSuite {
  test("codegen-failure errors increment the counter; others don't") {
    CodegenFallbackCounter.install()
    val log = org.apache.logging.log4j.LogManager.getLogger(
      "org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator")
    val before = CodegenFallbackCounter.count.get()
    log.error("Failed to compile the generated Java code.")
    assert(CodegenFallbackCounter.count.get() == before + 1)
    log.error("some unrelated failure")
    log.warn("Failed to compile")  // WARN level is below the appender gate
    assert(CodegenFallbackCounter.count.get() == before + 1)
    // the r13 filter: the failure phrase from an unrelated logger is NOT
    // a codegen fallback (previously overcounted via the root appender)
    org.apache.logging.log4j.LogManager.getLogger("graft.some.Subsystem")
      .error("Failed to compile the asset bundle")
    assert(CodegenFallbackCounter.count.get() == before + 1)
  }
}
