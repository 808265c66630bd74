package graft.core

/** Typed error ADT with uniform numeric exit codes.
  *
  * Codes from /root/reference/googlecloudstorage_blueprints/exit_codes.py:1-3
  * (200 invalid credentials, 201 invalid bucket, 205 file not found). The
  * reference is inconsistent (download/upload raise raw tracebacks where
  * move/remove exit with codes — SURVEY §2A-O12); we use codes uniformly.
  */
sealed abstract class BlueprintError(val exitCode: Int, msg: String)
    extends RuntimeException(msg)

object BlueprintError {
  final case class InvalidCredentials(detail: String)
      extends BlueprintError(200, s"Invalid credentials: $detail")
  final case class InvalidBucket(bucket: String)
      extends BlueprintError(201, s"Bucket does not exist: $bucket")
  final case class FileNotFound(path: String)
      extends BlueprintError(205, s"File not found: $path")
  final case class BadRegex(pattern: String, detail: String)
      extends BlueprintError(205, s"Invalid regex '$pattern': $detail")
  /** Extension (no reference analog): two planned rows map to the same
    * destination object — the reference's sequential loop overwrote
    * last-wins; executor-parallel execution must reject instead.
    */
  final case class DestinationCollision(dest: String)
      extends BlueprintError(210, s"Destination collision: $dest")
  /** argparse-style bad/missing CLI flag (exit 2, argparse's code). */
  final case class UsageError(detail: String)
      extends BlueprintError(2, s"usage error: $detail")

  val ExitInvalidCredentials = 200
  val ExitInvalidBucket = 201
  val ExitFileNotFound = 205
  val ExitDestinationCollision = 210

  /** Run `body`; on BlueprintError exit with its code (CLI edge only).
    * Errors thrown inside executor tasks surface wrapped in
    * SparkException — walk the cause chain so a mid-copy FileNotFound
    * still maps to its exit code instead of a raw stack trace.
    */
  def exitOnError[A](body: => A): A =
    try body
    catch {
      case e: Throwable =>
        var c: Throwable = e
        while (c != null && !c.isInstanceOf[BlueprintError]) c = c.getCause
        c match {
          case b: BlueprintError =>
            System.err.println(b.getMessage)
            sys.exit(b.exitCode)
          case _ => throw e
        }
    }
}
