package graft.state

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.collection.immutable.SortedMap
import scala.jdk.CollectionConverters._

/**
 * B11 — the sync-bookkeeping KV store.
 *
 * Semantics follow the reference's store contract (protocol/src/index.ts:
 * 11-29 and core/src/lib/store.ts): keys are `::`-joined segments;
 * get/set/del plus prefix ops (list, stream, deleteByPrefix, size).
 *
 * Scale note: this store holds CURSORS and id-map bookkeeping — kilobytes
 * per sync, driver-side by design. Large per-row state (previous-snapshot
 * contents, audience membership) deliberately does NOT live here; that is a
 * parquet snapshot table handled by sync.SnapshotDiff, which is the part
 * that must scale to 100 TB.
 */
trait StateStore {
  def get(key: Seq[String]): Option[String]
  def set(key: Seq[String], value: String): Unit
  def del(key: Seq[String]): Unit
  /** All (key, value) pairs under a key prefix, key-sorted. */
  def list(prefix: Seq[String]): Seq[(Seq[String], String)]
  def stream(prefix: Seq[String]): Iterator[(Seq[String], String)] = list(prefix).iterator
  def deleteByPrefix(prefix: Seq[String]): Int
  def size(prefix: Seq[String]): Long = list(prefix).size.toLong

  protected def join(key: Seq[String]): String = key.mkString(StateStore.Sep)
  protected def split(key: String): Seq[String] = key.split(StateStore.Sep).toSeq
}

object StateStore {
  val Sep = "::"

  /** In-memory store (tests, dry runs). */
  def inMemory(): StateStore = new MemoryStateStore

  /** Durable single-file store: newline-delimited `key<TAB>json-string`
    * rows, atomically replaced on every mutation (temp file + move) so a
    * killed sync never leaves a torn store — the moral equivalent of the
    * reference's SQLite backend for a driver process. */
  def onFile(path: String): StateStore = new FileStateStore(Paths.get(path))
}

private final class MemoryStateStore extends StateStore {
  private var data: SortedMap[String, String] = SortedMap.empty

  override def get(key: Seq[String]): Option[String] = synchronized(data.get(join(key)))
  override def set(key: Seq[String], value: String): Unit = synchronized { data += (join(key) -> value) }
  override def del(key: Seq[String]): Unit = synchronized { data -= join(key) }
  override def list(prefix: Seq[String]): Seq[(Seq[String], String)] = synchronized {
    val p = if (prefix.isEmpty) "" else join(prefix)
    data.iterator.filter { case (k, _) => matches(k, p) }
      .map { case (k, v) => (split(k), v) }.toSeq
  }
  override def deleteByPrefix(prefix: Seq[String]): Int = synchronized {
    val p = if (prefix.isEmpty) "" else join(prefix)
    val doomed = data.keysIterator.filter(matches(_, p)).toSeq
    data --= doomed
    doomed.size
  }
  /** Prefix match on whole segments: `a::b` matches `a::b` and `a::b::c`,
    * never `a::bc` (reference stores match by joined-string prefix of
    * segment lists). */
  private def matches(k: String, p: String): Boolean =
    p.isEmpty || k == p || k.startsWith(p + StateStore.Sep)
}

private final class FileStateStore(path: Path) extends StateStore {
  private val mem = new MemoryStateStore
  load()

  private def load(): Unit = if (Files.exists(path)) {
    Files.readAllLines(path, StandardCharsets.UTF_8).asScala.foreach { line =>
      val i = line.indexOf('\t')
      if (i > 0) mem.set(split(line.substring(0, i)), Json.unescape(line.substring(i + 1)))
    }
  }

  private def persist(): Unit = {
    val tmp = path.resolveSibling(path.getFileName.toString + ".tmp")
    if (path.getParent != null) Files.createDirectories(path.getParent)
    val body = mem.list(Nil).map { case (k, v) => s"${join(k)}\t${Json.escape(v)}" }.mkString("\n")
    Files.write(tmp, body.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, path, StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  override def get(key: Seq[String]): Option[String] = mem.get(key)
  override def set(key: Seq[String], value: String): Unit = { mem.set(key, value); persist() }
  override def del(key: Seq[String]): Unit = { mem.del(key); persist() }
  override def list(prefix: Seq[String]): Seq[(Seq[String], String)] = mem.list(prefix)
  override def deleteByPrefix(prefix: Seq[String]): Int = {
    val n = mem.deleteByPrefix(prefix); persist(); n
  }
}

/** Minimal value escaping so multi-line values survive the line format. */
private object Json {
  def escape(s: String): String =
    s.flatMap { case '\\' => "\\\\"; case '\n' => "\\n"; case '\t' => "\\t"; case c => c.toString }
  def unescape(s: String): String = {
    val b = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'n' => b.append('\n'); case 't' => b.append('\t')
          case '\\' => b.append('\\'); case o => b.append(o)
        }
        i += 2
      } else { b.append(c); i += 1 }
    }
    b.toString
  }
}
