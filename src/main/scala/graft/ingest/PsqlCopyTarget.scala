package graft.ingest

import java.io.{BufferedWriter, File, OutputStreamWriter}
import java.nio.charset.StandardCharsets
import java.nio.file.Files

/** [[CopyTarget]] over a live PostgreSQL via the `psql` client — the
  * zero-dependency wire adapter (the pgjdbc `CopyManager` jar is not on
  * this classpath; `psql` speaks the same frontend protocol). One
  * psql SESSION per instance, matching the lifecycle [[CopySink]]
  * expects: a task's CREATE/TRUNCATE/COPY and the driver's
  * BEGIN…COMMIT promote each run on ONE connection, so the promote
  * transaction is genuinely atomic on the server.
  *
  * Statements stream to psql's stdin as a `-f -` script under
  * `ON_ERROR_STOP=1`; COPY payloads ride inline after the command,
  * terminated by `\.` (the psql inline-COPY convention). Error
  * semantics are DEFERRED: a failed statement aborts the psql process
  * before anything after it runs — in particular before a COMMIT — and
  * the server rolls back the open transaction on disconnect, so the
  * stage-and-promote protocol keeps its atomicity; the failure
  * surfaces as an exception from [[close]] (or from the next write's
  * broken pipe), which fails the Spark task / promote step exactly
  * like a synchronous error would. [[CopyRetryStormSpec]] proves the
  * retry discipline; CopyWireSpec proves this adapter against a real
  * server end-to-end.
  *
  * Caveat (inline-COPY framing): a CSV line that is exactly `\.` would
  * terminate the stream early. [[CopyFormat]] can only emit that for a
  * single-column table whose value is the two-character string "\."
  * — outside §1.5 data; the pgjdbc adapter has no such corner.
  *
  * On a real cluster each EXECUTOR shells its local `psql` (the
  * factory, not the process, is shipped — [[CopySink]]'s contract);
  * the runtime image must provide the client, the same way it would
  * have to provide the pgjdbc jar.
  */
final class PsqlCopyTarget(connArgs: Seq[String]) extends CopyTarget {

  @transient private var proc: Process = _
  @transient private var stdin: BufferedWriter = _
  @transient private var errF: File = _
  @transient private var outF: File = _

  private def ensure(): Unit = if (proc == null) {
    outF = File.createTempFile("graft-psql-out-", ".log")
    errF = File.createTempFile("graft-psql-err-", ".log")
    val cmd = Seq("psql", "-X", "-q", "-A", "-t",
      "-v", "ON_ERROR_STOP=1", "-f", "-") ++ connArgs
    val pb = new ProcessBuilder(cmd: _*)
    pb.redirectOutput(outF)
    pb.redirectError(errF)
    proc = pb.start()
    stdin = new BufferedWriter(
      new OutputStreamWriter(proc.getOutputStream, StandardCharsets.UTF_8))
  }

  def execute(sql: String): Unit = {
    ensure()
    stdin.write(sql)
    stdin.write(";\n")
    stdin.flush()
    failFast()
  }

  def copyIn(sql: String, lines: Iterator[String]): Long = {
    ensure()
    stdin.write(sql)
    stdin.write(";\n")
    var n = 0L
    lines.foreach { l => stdin.write(l); n += 1 } // CopyFormat lines end in \n
    stdin.write("\\.\n")
    stdin.flush()
    failFast()
    n
  }

  /** Best-effort early detection: if psql already died (ON_ERROR_STOP),
    * surface its stderr now instead of at close().
    */
  private def failFast(): Unit =
    if (proc != null && !proc.isAlive && proc.exitValue() != 0) raise(proc.exitValue())

  private def raise(code: Int): Nothing = {
    val err =
      if (errF != null && errF.exists())
        new String(Files.readAllBytes(errF.toPath), StandardCharsets.UTF_8).takeRight(4000)
      else ""
    throw new IllegalStateException(s"psql exited $code: $err")
  }

  def close(): Unit = if (proc != null) {
    try stdin.close()
    catch { case _: java.io.IOException => () } // already-dead psql
    val code = proc.waitFor()
    try { if (code != 0) raise(code) }
    finally {
      if (outF != null) outF.delete()
      if (errF != null) errF.delete()
      proc = null
    }
  }
}
