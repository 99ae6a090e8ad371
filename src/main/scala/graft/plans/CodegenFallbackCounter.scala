package graft.plans

import java.util.concurrent.atomic.AtomicInteger
import org.apache.logging.log4j.{Level, LogManager}
import org.apache.logging.log4j.core.LoggerContext
import org.apache.logging.log4j.core.appender.AbstractAppender
import org.apache.logging.log4j.core.config.Property

/** A silent-interpreted-fallback tripwire (r12). When a whole-stage
  * `processNext()` exceeds Janino's hard 64 KB method limit, Spark logs
  * ONE `CodeGenerator ... Failed to compile` error and quietly runs the
  * stage INTERPRETED — queries stay correct, so the only externally
  * visible symptom is a slow stage buried in a wall of log4j stderr.
  * That is exactly how pipe_curate ran interpreted for several rounds
  * (langPred's exponential when-chain, NOTES_r12 §9) until an
  * instrumented bench run happened to surface the errors.
  *
  * This appender hangs off the log4j2 ROOT logger config at ERROR level
  * and counts events whose message carries the codegen-failure
  * signature. [[graft.Verify]] installs it and prints a summary line —
  * `[verify] codegen compile failures: N` — so every driver round
  * records whether any catalog query fell back. CodegenSentinelSpec
  * pins the wiring (an event through the CodeGenerator logger
  * increments the counter; unrelated errors don't). */
object CodegenFallbackCounter {
  val count = new AtomicInteger(0)
  @volatile private var installed = false

  def install(): Unit = synchronized {
    if (installed) return
    val ctx = LogManager.getContext(false).asInstanceOf[LoggerContext]
    val cfg = ctx.getConfiguration
    val app = new AbstractAppender("graft-codegen-counter", null, null,
        true, Property.EMPTY_ARRAY) {
      override def append(e: org.apache.logging.log4j.core.LogEvent): Unit = {
        val msg = e.getMessage.getFormattedMessage
        if (msg != null && msg.contains("Failed to compile"))
          count.incrementAndGet()
      }
    }
    app.start()
    cfg.getRootLogger.addAppender(app, Level.ERROR, null)
    ctx.updateLoggers()
    installed = true
  }
}
