package graft.sources

import java.nio.file.{Files, Path}

import graft.SparkTestBase

class DatasetCatalogSpec extends SparkTestBase {

  private def catalog = new DatasetCatalog(spark)

  private def tmpWith(names: String*): Path = {
    val dir = Files.createTempDirectory("graft_cat_")
    names.foreach(n => Files.writeString(dir.resolve(n), s"content of $n"))
    dir
  }

  test("list streams every entry (paginated iterator, no page-2 loss)") {
    // The reference loses page 2+ (download_file.py:210); we must not.
    val names = (1 to 250).map(i => f"obj_$i%03d.dat")
    val dir = tmpWith(names: _*)
    val listed = catalog.list(dir.toString).map(_.name).toSeq
    assert(listed.sorted == names)
  }

  test("exact match selects exactly one dataset") {
    val dir = tmpWith("a.csv", "ab.csv", "b.csv")
    val sel = catalog.select(dir.toString, "a.csv", MatchMode.Exact)
    assert(sel.map(_.name) == Seq("a.csv"))
  }

  test("regex match uses find-anywhere semantics like re.search") {
    val dir = tmpWith("data_1.csv", "data_2.csv", "other.csv", "data.json")
    val sel = catalog.select(dir.toString, "data_\\d", MatchMode.Regex)
    assert(sel.map(_.name) == Seq("data_1.csv", "data_2.csv"))
    // unanchored: matches substring anywhere
    val sub = catalog.select(dir.toString, "ther", MatchMode.Regex)
    assert(sub.map(_.name) == Seq("other.csv"))
  }

  test("no match raises typed not-found (exit 201)") {
    val dir = tmpWith("a.csv")
    val e = intercept[DatasetNotFoundException] {
      catalog.select(dir.toString, "zzz", MatchMode.Exact)
    }
    assert(e.exitCode == 201)
    val e2 = intercept[DatasetNotFoundException] {
      catalog.list("/definitely/not/a/dir").toSeq
    }
    assert(e2.exitCode == 201)
  }

  test("invalid regex raises typed pattern error (exit 203)") {
    val dir = tmpWith("a.csv")
    val e = intercept[InvalidPatternException] {
      catalog.select(dir.toString, "[unclosed", MatchMode.Regex)
    }
    assert(e.exitCode == 203)
  }

  test("recursive glob selects across the tree (upload parity)") {
    val dir = Files.createTempDirectory("graft_cat_r_")
    Files.createDirectories(dir.resolve("sub/inner"))
    Files.writeString(dir.resolve("root.csv"), "r")
    Files.writeString(dir.resolve("sub").resolve("a.csv"), "a")
    Files.writeString(dir.resolve("sub/inner").resolve("b.csv"), "b")
    Files.writeString(dir.resolve("sub/inner").resolve("c.json"), "c")
    // `**/` also matches zero directories, like the reference's
    // recursive upload walk
    val sel = catalog.selectRecursive(dir.toString, "**/*.csv", MatchMode.Glob)
    assert(sel.map(_.name) == Seq("root.csv", "sub/a.csv", "sub/inner/b.csv"))
    // single-star globs stay within one path segment
    val one = catalog.selectRecursive(dir.toString, "sub/*.csv", MatchMode.Glob)
    assert(one.map(_.name) == Seq("sub/a.csv"))
    // regex selection over relative paths works recursively too
    val re = catalog.selectRecursive(dir.toString, "inner/", MatchMode.Regex)
    assert(re.map(_.name) == Seq("sub/inner/b.csv", "sub/inner/c.json"))
  }

  test("glob mode selects in flat listings too") {
    val dir = tmpWith("a.csv", "b.csv", "c.json")
    val sel = catalog.select(dir.toString, "*.csv", MatchMode.Glob)
    assert(sel.map(_.name) == Seq("a.csv", "b.csv"))
  }

  test("filesystem auth failures raise typed invalid-credentials (exit 202)") {
    spark.sparkContext.hadoopConfiguration
      .set("fs.deny.impl", classOf[DenyFileSystem].getName)
    val e = intercept[InvalidCredentialsException] {
      catalog.list("deny://bucket/data").toSeq
    }
    assert(e.exitCode == 202)
    // the same failure surfaces through selection (and thus IO ops)
    val e2 = intercept[InvalidCredentialsException] {
      catalog.selectRecursive("deny://bucket/data", "**", MatchMode.Glob)
    }
    assert(e2.exitCode == 202)
  }

  test("sizes are reported") {
    val dir = tmpWith("x.bin")
    val ref = catalog.select(dir.toString, "x.bin", MatchMode.Exact).head
    assert(ref.sizeBytes == "content of x.bin".length)
    assert(!ref.isDirectory)
  }
}
