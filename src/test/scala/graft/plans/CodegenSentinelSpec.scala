package graft.plans

import org.scalatest.funsuite.AnyFunSuite

/** Pins the codegen-fallback tripwire's wiring (r12): the appender hangs
  * off the root logger config, so an ERROR carrying the codegen-failure
  * signature — from any logger, matching how CodeGenerator reports the
  * Janino 64 KB fallback — increments the counter, and unrelated errors
  * do not. (Provoking a REAL 64 KB overflow would need a deliberately
  * pathological expression per run; the langPred incident is the
  * documented real-world instance, NOTES_r12 §9.) */
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
  }
}
