package graft.util

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}

/** Classpath-resource plumbing for vendored fixtures and prompt templates.
  *
  * The test suite must be hermetic (no dependency on a mounted reference
  * checkout), but two consumers need fixtures as REAL FILES, not classpath
  * streams: Spark's CSV reader takes a path, and the DuckDB oracle runs in a
  * SEPARATE process against the paths embedded in `oracle_sql.json`. So
  * vendored resources are materialized to a stable absolute location under
  * the system tmpdir (idempotent overwrite — NOT deleteOnExit: the oracle
  * process runs after this JVM exits).
  */
object Fixtures {

  /** Read a classpath resource fully as UTF-8 (reference analog:
    * lion_linker/utils.py:17-23 `load_prompt` via importlib.resources).
    */
  def resourceText(resource: String): String = {
    val in = Option(getClass.getClassLoader.getResourceAsStream(resource))
      .getOrElse(sys.error(s"classpath resource not found: $resource"))
    try new String(in.readAllBytes(), StandardCharsets.UTF_8)
    finally in.close()
  }

  private def resourceBytes(resource: String): Array[Byte] = {
    val in = Option(getClass.getClassLoader.getResourceAsStream(resource))
      .getOrElse(sys.error(s"classpath resource not found: $resource"))
    try in.readAllBytes()
    finally in.close()
  }

  /** Extract a classpath resource to `<tmpdir>/graft-fixtures/<resource>`
    * and return the absolute path. Overwrites only when the on-disk copy
    * differs (cheap length check, then bytes), so concurrent suites and
    * repeated calls are safe and the path is stable across processes within
    * a machine (what the out-of-process DuckDB oracle needs).
    */
  def materialize(resource: String): String = {
    val bytes = resourceBytes(resource)
    // per-user namespace: on a multi-user host another user's extraction
    // would be unwritable and a shared path would fail on the first
    // fixture update with an unrelated-looking AccessDeniedException
    val ns = "graft-fixtures-" + sys.props.getOrElse("user.name", "anon")
    val out: Path = Paths.get(
      System.getProperty("java.io.tmpdir"),
      ns,
      resource.replace('/', java.io.File.separatorChar)
    )
    // a concurrent cleanup between the exists probe and the read must read
    // as "stale" (re-extract), not crash the suite
    val stale = scala.util
      .Try {
        !Files.exists(out) || Files.size(out) != bytes.length ||
          !java.util.Arrays.equals(Files.readAllBytes(out), bytes)
      }
      .getOrElse(true)
    if (stale) {
      Files.createDirectories(out.getParent)
      val tmp = Files.createTempFile(out.getParent, ".extract-", ".tmp")
      Files.write(tmp, bytes)
      Files.move(
        tmp,
        out,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE
      )
    }
    out.toAbsolutePath.toString
  }
}
