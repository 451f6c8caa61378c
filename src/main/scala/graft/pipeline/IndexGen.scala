package graft.pipeline

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, StandardCopyOption}

/** Generation-versioned directory layout shared by every directory-backed
  * standing index (the BM25 inverted index, the IVF inverted file, the PQ
  * code index, the near-dup/hamming indexes):
  *
  * {{{
  *   root/
  *     CURRENT        one line: the serving generation's directory name
  *     gen_000000/    a complete index (postings/termdf/stats, inv/cents/
  *     gen_000001/    meta, ...) — never mutated once superseded
  * }}}
  *
  * Writers build a WHOLE new generation off to the side and publish it
  * with ONE atomic rename of the pointer file; readers resolve the
  * pointer once per query and read only inside that generation. No reader
  * can ever pair relations from different generations — the
  * per-relation-rename race (new postings with old stats, or a hard
  * failure on a mid-swap missing directory) that a multi-rename swap
  * allows. A crash before the flip leaves the old generation serving and
  * an orphan directory the next successful flip prunes; a crash after
  * the flip has already published a complete index.
  *
  * The superseded generation is retained for ONE cycle (pruned when the
  * NEXT flip lands), so a reader that resolved just before a flip
  * finishes its query against intact files; readers must complete within
  * one full rebuild cycle, which is the standing grace contract.
  *
  * Pointer atomicity is same-directory `ATOMIC_MOVE` — guaranteed on a
  * local/POSIX filesystem (the harness + same-host cluster gate); an
  * object-store deployment would publish the pointer with a conditional
  * PUT instead, same protocol.
  */
object IndexGen {
  private val PointerName = "CURRENT"
  private val GenPattern = "^gen_\\d{6}$".r

  /** The serving generation's name, if `root` uses the versioned layout. */
  def current(root: String): Option[String] = readPointer(root, PointerName)

  /** The directory a READER should use: the serving generation under a
    * versioned root, or `root` itself for the legacy flat layout
    * (relations directly under root) — resolved ONCE per query. */
  def resolve(root: String): String =
    current(root).map(g => s"$root/$g").getOrElse(root)

  /** Allocate the next generation (name, path) under `root` — one past
    * the highest existing generation number, directory created. */
  def newGen(root: String): (String, String) = {
    val rootF = new File(root)
    rootF.mkdirs()
    val existing = Option(rootF.list()).getOrElse(Array.empty[String])
      .filter(n => GenPattern.findFirstIn(n).isDefined)
      .map(_.stripPrefix("gen_").toInt)
    val next = if (existing.isEmpty) 0 else existing.max + 1
    val name = f"gen_$next%06d"
    val path = s"$root/$name"
    new File(path).mkdirs()
    (name, path)
  }

  /** Atomically publish a pointer file `dir/name` containing `value`
    * (write-to-temp + same-directory ATOMIC_MOVE — the primitive every
    * swap here is built on). */
  def publishPointer(dir: String, name: String, value: String): Unit = {
    val tmp = new File(dir, name + ".tmp")
    Files.write(tmp.toPath, value.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp.toPath, new File(dir, name).toPath,
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** Read a pointer file published by [[publishPointer]]. */
  def readPointer(dir: String, name: String): Option[String] = {
    val p = new File(dir, name)
    if (!p.isFile) None
    else {
      val v = new String(Files.readAllBytes(p.toPath),
        StandardCharsets.UTF_8).trim
      if (v.isEmpty) None else Some(v)
    }
  }

  /** Publish `gen` as the serving generation (atomic pointer rename),
    * then prune every generation directory other than `gen` and the one
    * it superseded — the one-cycle reader grace window. */
  def flip(root: String, gen: String): Unit = {
    val prev = current(root)
    publishPointer(root, PointerName, gen)
    val keep = Set(gen) ++ prev
    Option(new File(root).list()).getOrElse(Array.empty[String])
      .filter(n => GenPattern.findFirstIn(n).isDefined && !keep.contains(n))
      .foreach(n => deleteRec(new File(root, n)))
  }

  /** Hard-link every DATA file of relation directory `src` into `dst`
    * (created): the cheap carry-forward for incremental generations —
    * standing parquet part files are immutable once published, so a new
    * generation shares them by link instead of rewriting index-sized
    * bytes. Marker files (`_SUCCESS` and other `_`/`.`-prefixed names)
    * are skipped; the appending writer publishes its own. Hard links are
    * the same local/POSIX-filesystem contract as the pointer's
    * ATOMIC_MOVE (an object-store deployment would copy object
    * references instead). */
  def linkDataFiles(src: String, dst: String): Unit = {
    val s = new File(src)
    val d = new File(dst)
    d.mkdirs()
    val fs = Option(s.listFiles()).getOrElse(Array.empty[File])
    fs.filter(f => f.isFile &&
        !f.getName.startsWith("_") && !f.getName.startsWith("."))
      .foreach { f =>
        Files.createLink(new File(d, f.getName).toPath, f.toPath)
      }
  }

  def deleteRec(f: File): Unit = {
    val cs = f.listFiles()
    if (cs != null) cs.foreach(deleteRec)
    f.delete()
  }
}
