package graft.ingest

import java.io.OutputStream
import java.nio.file.Path
import java.time.{LocalDate, ZoneOffset}
import java.util.logging.{FileHandler, Formatter, Handler, Level, LogRecord, Logger, StreamHandler}

/** op-19 logging subsystem — the reference's process-named logger module
  * (`lib_land_registry_data/logging.py:16-97`), ported onto
  * `java.util.logging` (no extra dependency; Spark's own log4j is left
  * to Spark).
  *
  * Parity points:
  *  - process-named SINGLETON: `setLoggerProcessName` re-initializes the
  *    shared logger (`logging.py:25-33,71-97`); `getLogger` lazily
  *    initializes with a module-name default when no process name is set
  *    (`logging.py:84-93`).
  *  - stdout handler at INFO (`logging.py:38-49`), file handler at DEBUG
  *    (JUL `FINE`) writing `{process}_{date}.log` with the run date
  *    (UTC), `logging.py:52-68` + wiring `main.py:39-46`.
  *  - uniform format `name: time | LEVEL | file:lineno | message` with
  *    ISO seconds (`logging.py:16-19,55-58`); Python level names are
  *    kept (`FINE`→`DEBUG`, `SEVERE`→`ERROR`, `WARNING` as-is).
  */
object ProcessLogging {

  @volatile private var processName: Option[String] = None
  @volatile private var current: Option[Logger] = None

  /** `logging.py:25-33`: set the name and force re-initialization. */
  def setLoggerProcessName(name: String): Unit = synchronized {
    processName = Some(name)
    current = None
    initialize()
    ()
  }

  /** `logging.py:84-93`: return the singleton, initializing on demand. */
  def getLogger(): Logger = current.getOrElse(synchronized { initialize() })

  private def initialize(): Logger = {
    val name = processName.getOrElse(getClass.getName.stripSuffix("$"))
    val l = Logger.getLogger(name)
    l.setLevel(Level.ALL) // logger itself at DEBUG (`logging.py:96-97`)
    l.setUseParentHandlers(false) // handlers are wired explicitly, as in main.py
    current = Some(l)
    l
  }

  /** The reference's uniform line format (`logging.py:16-19`):
    * `name: yyyy-MM-ddTHH:mm:ss | LEVEL | file:lineno | message`.
    * JUL records carry no line numbers, so the caller frame is resolved
    * at publish time (same thread) by skipping logging infrastructure
    * frames.
    */
  final class RefFormatter extends Formatter {
    private val ts = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd'T'HH:mm:ss")
      .withZone(ZoneOffset.UTC)

    private def levelName(l: Level): String = l match {
      case Level.FINE | Level.FINER | Level.FINEST => "DEBUG"
      case Level.SEVERE                            => "ERROR"
      case other                                   => other.getName
    }

    private def callerFileLine(): String = {
      val skip = Seq("java.util.logging.", "graft.ingest.ProcessLogging")
      new Throwable().getStackTrace
        .find(e => !skip.exists(e.getClassName.startsWith))
        .map(e => s"${e.getFileName}:${e.getLineNumber}")
        .getOrElse("unknown:0")
    }

    override def format(r: LogRecord): String =
      s"${r.getLoggerName}: ${ts.format(r.getInstant)} | ${levelName(r.getLevel)} | " +
        s"${callerFileLine()} | ${formatMessage(r)}\n"
  }

  /** `logging.py:38-49`: stdout (not stderr) handler at INFO. The stream
    * is injectable so specs can capture it.
    */
  def createStdoutLogHandler(out: OutputStream = System.out): Handler = {
    val h = new StreamHandler(out, new RefFormatter) {
      // Python's StreamHandler flushes per record; JUL's buffers.
      override def publish(r: LogRecord): Unit = { super.publish(r); flush() }
    }
    h.setLevel(Level.INFO)
    h
  }

  /** `logging.py:52-68`: file handler at DEBUG writing
    * `{process}_{date}.log` (date = UTC run date, `main.py:41-44`).
    */
  def createFileLogHandler(
      processName: String,
      date: LocalDate = LocalDate.now(ZoneOffset.UTC),
      dir: Path = java.nio.file.Paths.get(".")
  ): Handler = {
    val h = new FileHandler(dir.resolve(s"${processName}_$date.log").toString, true)
    h.setFormatter(new RefFormatter)
    h.setLevel(Level.FINE) // Python DEBUG
    h
  }
}
