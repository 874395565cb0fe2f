package graft.ops

/** JVM-scoped temp directories for the bench/verify op fixtures (r12
  * verdict "what's wrong" #3): every lake fixture and catalog warehouse
  * an OpDef mints rides through here, and a shutdown hook deletes them
  * all — a tri-scale sweep (3 JVMs × ~10 UUID tables × staged files)
  * leaves no orphan `graft_lake_wh_*` directories behind. Deletion is
  * best-effort on purpose: cleanup must never turn a green bench red. */
object TempDirs {
  private val created =
    new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]()

  Runtime.getRuntime.addShutdownHook(
    new Thread(() => drain(), "graft-tempdir-cleanup"))

  def create(prefix: String): String = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    created.add(p)
    p.toString
  }

  private def drain(): Unit = {
    import scala.jdk.CollectionConverters._
    var p = created.poll()
    while (p != null) {
      try scala.util.Using.resource(java.nio.file.Files.walk(p))(
          _.iterator().asScala.toSeq).reverse
        .foreach(f => try java.nio.file.Files.deleteIfExists(f)
                      catch { case _: Throwable => () })
      catch { case _: Throwable => () }
      p = created.poll()
    }
  }
}
