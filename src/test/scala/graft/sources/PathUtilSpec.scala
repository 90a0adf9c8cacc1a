package graft.sources

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the reference's path semantics
  * (download_file.py:101-160). ScalaCheck generators sampled with a
  * fixed seed (scalatestplus bridge unavailable offline).
  */
class PathUtilSpec extends AnyFunSuite {

  private val seg = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)

  private def samples[A](g: Gen[A], n: Int = 200): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("cleanFolderName strips edges and collapses runs") {
    assert(PathUtil.cleanFolderName("/a/b/") == "a/b")
    assert(PathUtil.cleanFolderName("a//b///c") == "a/b/c")
    assert(PathUtil.cleanFolderName("") == "")
    assert(PathUtil.cleanFolderName("///") == "")
  }

  test("cleanFolderName is idempotent") {
    val paths = samples(Gen.listOf(Gen.oneOf(seg, Gen.const("/")))
      .map(_.mkString))
    paths.foreach { p =>
      val once = PathUtil.cleanFolderName(p)
      assert(PathUtil.cleanFolderName(once) == once, s"input: '$p'")
    }
  }

  test("combine joins with exactly one separator") {
    assert(PathUtil.combine("a/b", "c.txt") == "a/b/c.txt")
    assert(PathUtil.combine("", "c.txt") == "c.txt")
    assert(PathUtil.combine("/a/", "/c.txt") == "a/c.txt")
    for (f <- samples(seg, 50); n <- samples(seg, 10)) {
      val c = PathUtil.combine(f, n)
      assert(!c.contains("//") && c.endsWith(n), s"combine($f, $n) = $c")
    }
  }

  test("enumerate splices _n at the FIRST dot (reference behavior)") {
    assert(PathUtil.enumerate("data.csv", 1) == "data_1.csv")
    assert(PathUtil.enumerate("data.tar.gz", 3) == "data_3.tar.gz")
    assert(PathUtil.enumerate("noext", 2) == "noext_2")
  }

  test("destinationName: explicit wins, enumerated only on multi-match") {
    assert(PathUtil.destinationName("a/b/src.csv", Some("out.csv"), None)
      == "out.csv")
    assert(PathUtil.destinationName("a/b/src.csv", Some("out.csv"), Some(2))
      == "out_2.csv")
    assert(PathUtil.destinationName("a/b/src.csv", None, Some(2)) == "src.csv")
    assert(PathUtil.destinationName("a/b/src.csv", None, None) == "src.csv")
  }

  test("baseName takes the final segment") {
    for (f <- samples(seg, 50); n <- samples(seg, 10))
      assert(PathUtil.baseName(s"$f/$n") == n)
  }

  test("globToRegex: * stays in-segment, ** crosses, **/ matches zero dirs") {
    def m(glob: String, s: String): Boolean =
      s.matches(PathUtil.globToRegex(glob))
    assert(m("*.csv", "a.csv"))
    assert(!m("*.csv", "sub/a.csv")) // single star stops at '/'
    assert(m("**/*.csv", "a.csv")) // zero directories
    assert(m("**/*.csv", "sub/inner/a.csv"))
    assert(!m("**/*.csv", "sub/a.json"))
    assert(m("sub/**", "sub/x/y/z.bin"))
    assert(m("data_?.csv", "data_1.csv"))
    assert(!m("data_?.csv", "data_12.csv"))
    // regex metachars in literals are escaped, not interpreted
    assert(m("a+b(1).csv", "a+b(1).csv"))
    assert(!m("a+b(1).csv", "aab1.csv"))
  }
}
