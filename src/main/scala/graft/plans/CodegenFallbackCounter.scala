package graft.plans

import java.util.concurrent.atomic.AtomicInteger
import org.apache.logging.log4j.{Level, LogManager}
import org.apache.logging.log4j.core.LoggerContext
import org.apache.logging.log4j.core.appender.AbstractAppender
import org.apache.logging.log4j.core.config.Property

/** A silent-interpreted-fallback tripwire (r12, hardened r13). When a
  * whole-stage `processNext()` exceeds Janino's hard 64 KB method limit,
  * Spark logs ONE `CodeGenerator ... Failed to compile` error and quietly
  * runs the stage INTERPRETED — queries stay correct, so the only
  * externally visible symptom is a slow stage buried in a wall of log4j
  * stderr. That is exactly how pipe_curate ran interpreted for several
  * rounds (langPred's exponential when-chain, NOTES_r12 §9) until an
  * instrumented bench run happened to surface the errors.
  *
  * r13 hardening (ADVICE): the counter requires BOTH the codegen-failure
  * message signature AND a `CodeGenerator` logger name, so an unrelated
  * subsystem logging "Failed to compile" can no longer overcount; and the
  * appender is attached to the CodeGenerator logger's own resolved
  * LoggerConfig in addition to the root config, so a non-additive
  * intermediate logger config cannot silently disarm the tripwire.
  * [[graft.Verify]] and [[graft.Bench]] install it; CodegenGateSpec makes
  * it a FAILING gate — the full catalog must execute with zero fallbacks,
  * and a deliberately Janino-overflowing fixture proves the gate is armed.
  */
object CodegenFallbackCounter {
  val count = new AtomicInteger(0)
  @volatile private var installed = false

  /** Spark's whole-stage/expression compiler logger. */
  private val CodegenLogger =
    "org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator"

  def install(): Unit = synchronized {
    if (installed) return
    val ctx = LogManager.getContext(false).asInstanceOf[LoggerContext]
    val cfg = ctx.getConfiguration
    val app = new AbstractAppender("graft-codegen-counter", null, null,
        true, Property.EMPTY_ARRAY) {
      override def append(e: org.apache.logging.log4j.core.LogEvent): Unit = {
        val msg = e.getMessage.getFormattedMessage
        val logger = e.getLoggerName
        if (msg != null && msg.contains("Failed to compile") &&
            logger != null && logger.contains("CodeGenerator"))
          count.incrementAndGet()
      }
    }
    app.start()
    // exactly-once attachment across additivity configs: root always
    // (the default path every additive event reaches), plus the
    // CodeGenerator logger's own resolved config ONLY when that config
    // is non-additive (its events would never reach root — the class
    // of config that silently disarmed the r12 wiring)
    cfg.getRootLogger.addAppender(app, Level.ERROR, null)
    val resolved = cfg.getLoggerConfig(CodegenLogger)
    if (!(resolved eq cfg.getRootLogger) && !resolved.isAdditive)
      resolved.addAppender(app, Level.ERROR, null)
    ctx.updateLoggers()
    installed = true
  }
}
