package graft.core

/** Scratch-space root for fixture staging and streaming checkpoints.
  *
  * Defaults to tmpfs (`/dev/shm`) when present: the driver-checked
  * round-trip queries stage writes and drain streams through scratch
  * files, and putting that traffic on the root disk both slows the
  * staging-heavy queries and makes their bench numbers hostage to
  * unrelated disk activity. `SPARK_GRAFT_SCRATCH` overrides; falls
  * back to the JVM temp dir when tmpfs is unavailable. At cluster
  * scale the equivalent is fast local/ephemeral storage for shuffle
  * and checkpoint volumes.
  */
object Scratch {
  lazy val root: String =
    sys.env.get("SPARK_GRAFT_SCRATCH").getOrElse {
      val shm = new java.io.File("/dev/shm")
      if (shm.isDirectory && shm.canWrite) "/dev/shm/graft_scratch"
      else sys.props.getOrElse("java.io.tmpdir", "/tmp")
    }

  /** `<root>/<name>` with the root created on first use. */
  def path(name: String): String = {
    val f = new java.io.File(root)
    if (!f.exists()) f.mkdirs()
    s"$root/$name"
  }

  /** The root as a created Path (for temp-dir factories). */
  def rootPath: java.nio.file.Path = {
    val f = new java.io.File(root)
    if (!f.exists()) f.mkdirs()
    f.toPath
  }
}
