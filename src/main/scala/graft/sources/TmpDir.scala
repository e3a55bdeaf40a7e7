package graft.sources

import java.nio.file.{Files, Path, Paths}

/** Deterministic scratch directories for the write-then-read-back
  * operators. A fresh `createTempDirectory` per invocation leaks a
  * full rendered copy of the input every time Bench/Verify/a plan
  * sweep constructs the query; instead each (purpose, session, input)
  * triple maps to ONE fixed path that overwrite-mode writers reuse,
  * so repeated invocations in a JVM occupy constant disk. Everything
  * created here is removed by a single shutdown hook.
  */
object TmpDir {

  private val created =
    java.util.concurrent.ConcurrentHashMap.newKeySet[Path]()

  private lazy val hook: Unit = {
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      created.forEach { p =>
        try {
          if (Files.exists(p)) {
            val walk = Files.walk(p)
            try {
              walk.sorted(java.util.Comparator.reverseOrder())
                .forEach(f => { try Files.delete(f) catch { case _: Throwable => () } })
            } finally walk.close()
          }
        } catch { case _: Throwable => () }
      }
    }))
  }

  /** One stable directory per (purpose, appId, key); registered for
    * deletion at JVM exit. The md5 keeps user-supplied keys (paths)
    * out of the filesystem name.
    */
  def scoped(purpose: String, appId: String, key: String): String = {
    hook
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$appId:$key".getBytes("UTF-8"))
      .take(6).map("%02x".format(_)).mkString
    val p = Paths.get(
      sys.props.getOrElse("java.io.tmpdir", "/tmp"),
      s"graft_${purpose}_$h")
    Files.createDirectories(p)
    created.add(p)
    p.toString
  }
}
