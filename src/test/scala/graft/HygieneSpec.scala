package graft

import org.scalatest.funsuite.AnyFunSuite

/** Repo hygiene: no source file may contain control bytes that make
  * grep/ripgrep classify it as BINARY — a binary-looking source file is
  * invisible to every future text search, which is how regressions
  * hide. (The known pitfall: editor tools silently embedding literal
  * NUL bytes where an escape sequence was intended.) */
class HygieneSpec extends AnyFunSuite {

  test("no Scala source file contains NUL bytes") {
    val roots = Seq("src/main", "src/test").map(java.nio.file.Paths.get(_))
      .filter(java.nio.file.Files.exists(_))
    val offenders = roots.flatMap { root =>
      val it = java.nio.file.Files.walk(root).iterator()
      val bad = scala.collection.mutable.Buffer[String]()
      while (it.hasNext) {
        val p = it.next()
        if (p.toString.endsWith(".scala")) {
          val bytes = java.nio.file.Files.readAllBytes(p)
          if (bytes.contains(0.toByte)) bad += p.toString
        }
      }
      bad
    }
    assert(offenders.isEmpty,
      s"source files with literal NUL bytes (use \\u0000 escapes): " +
        offenders.mkString(", "))
  }
}
