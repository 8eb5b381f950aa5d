package graft.state

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** B11 — reference store contract: `::` segment keys, get/set/del, prefix
  * list/stream/deleteByPrefix/size (protocol/src/index.ts:11-29). */
class StateStoreSpec extends AnyFunSuite {

  def contract(mk: () => StateStore): Unit = {
    val s = mk()
    assert(s.get(Seq("a")).isEmpty)
    s.set(Seq("syncId=s1", "$lastCursor"), "2024-01-01")
    s.set(Seq("syncId=s1", "ids", "42"), "int-42")
    s.set(Seq("syncId=s2", "$lastCursor"), "2024-02-02")
    assert(s.get(Seq("syncId=s1", "$lastCursor")).contains("2024-01-01"))
    assert(s.size(Seq("syncId=s1")) == 2)
    assert(s.size(Nil) == 3)
    assert(s.list(Seq("syncId=s1")).map(_._1) ==
      Seq(Seq("syncId=s1", "$lastCursor"), Seq("syncId=s1", "ids", "42")))
    assert(s.stream(Seq("syncId=s2")).toSeq.map(_._2) == Seq("2024-02-02"))
    // whole-segment prefix: "syncId=s" must NOT match "syncId=s1"
    assert(s.list(Seq("syncId=s")).isEmpty)
    s.del(Seq("syncId=s1", "ids", "42"))
    assert(s.get(Seq("syncId=s1", "ids", "42")).isEmpty)
    assert(s.deleteByPrefix(Seq("syncId=s1")) == 1)
    assert(s.size(Nil) == 1)
  }

  test("in-memory store honors the contract") { contract(() => StateStore.inMemory()) }

  test("file store honors the contract") {
    val dir = Files.createTempDirectory("graft-store")
    contract(() => StateStore.onFile(s"$dir/store.tsv"))
  }

  test("file store survives reload, including control chars in values") {
    val path = Files.createTempDirectory("graft-store").resolve("s.tsv").toString
    val s1 = StateStore.onFile(path)
    s1.set(Seq("k"), "line1\nline2\ttabbed\\slash")
    s1.set(Seq("cursor"), "2024-05-05T00:00:00")
    val s2 = StateStore.onFile(path)
    assert(s2.get(Seq("k")).contains("line1\nline2\ttabbed\\slash"))
    assert(s2.get(Seq("cursor")).contains("2024-05-05T00:00:00"))
    assert(s2.size(Nil) == 2)
  }
}
