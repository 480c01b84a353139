package graft.stage

import java.io.ByteArrayInputStream
import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** PUT/GET/LIST/REMOVE + sanitization semantics of the reference's stage
  * manager (`pkg/stage/manager.go:89-249`). */
class StageManagerSpec extends AnyFunSuite {

  private def mgr = new StageManager(Files.createTempDirectory("stage_root"))

  test("put/get round-trip, nested paths auto-created") {
    val m = mgr
    m.put("s1", "sub/dir/a.csv", "hello".getBytes)
    val got = new String(m.get("s1", "sub/dir/a.csv").readAllBytes())
    assert(got == "hello")
  }

  test("put from stream") {
    val m = mgr
    val f = m.put("s1", "b.txt", new ByteArrayInputStream("xyz".getBytes))
    assert(f.sizeBytes == 3)
  }

  test("list with glob pattern") {
    val m = mgr
    m.put("s1", "a.csv", "1".getBytes)
    m.put("s1", "b.json", "2".getBytes)
    m.put("s1", "sub/c.csv", "3".getBytes)
    assert(m.list("s1").map(_.relativePath).toSet ==
      Set("a.csv", "b.json", "sub/c.csv"))
    assert(m.list("s1", Some("*.csv")).map(_.relativePath) == Seq("a.csv"))
    assert(m.list("s1", Some("**.csv")).map(_.relativePath).toSet ==
      Set("a.csv", "sub/c.csv"))
  }

  test("remove returns whether the file existed") {
    val m = mgr
    m.put("s1", "a.csv", "1".getBytes)
    assert(m.remove("s1", "a.csv"))
    assert(!m.remove("s1", "a.csv"))
  }

  test("path traversal and absolute paths rejected") {
    val m = mgr
    intercept[IllegalArgumentException](m.put("s1", "../escape.txt", "x".getBytes))
    intercept[IllegalArgumentException](m.get("s1", "../../etc/passwd"))
    intercept[IllegalArgumentException](m.stageDir("/abs"))
  }

  test("dropStage removes the whole tree") {
    val m = mgr
    m.put("s1", "sub/a.csv", "1".getBytes)
    m.dropStage("s1")
    assert(m.list("s1").isEmpty)
  }
}
