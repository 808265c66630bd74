package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.core.PathAlg

/** Properties + reference-derived examples for the pure path algebra
  * (spec: download_file.py:65-144, upload_file.py:68-151). Property
  * checks sample ScalaCheck generators with a fixed seed (the
  * scalatestplus bridge isn't in the offline cache).
  */
class PathAlgSpec extends AnyFunSuite {

  private def forAllG[A](gen: Gen[A], n: Int = 200)(body: A => Unit): Unit = {
    var seed = Seed(42L)
    (0 until n).foreach { _ =>
      gen.apply(Gen.Parameters.default, seed).foreach(body)
      seed = seed.next
    }
  }

  // --- cleanFolderName (download_file.py:109-116 + normpath semantics) ---

  test("cleanFolderName strips and collapses slashes") {
    assert(PathAlg.cleanFolderName("/a/b/") == "a/b")
    assert(PathAlg.cleanFolderName("a//b") == "a/b")
    assert(PathAlg.cleanFolderName("  /x/ ") == "x")
    assert(PathAlg.cleanFolderName("") == "")
    assert(PathAlg.cleanFolderName("///") == "")
  }

  test("cleanFolderName normalizes dot segments like os.path.normpath") {
    assert(PathAlg.cleanFolderName("a/../b") == "b")
    assert(PathAlg.cleanFolderName("a/./b") == "a/b")
    assert(PathAlg.cleanFolderName("a/b/..") == "a")
    assert(PathAlg.cleanFolderName("../a") == "../a") // leading .. survives
    assert(PathAlg.cleanFolderName("a/../../b") == "../b")
    assert(PathAlg.cleanFolderName(".") == "")
  }

  val segGen: Gen[String] = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
  val folderGen: Gen[String] = Gen.listOf(segGen).map(_.mkString("/"))

  test("cleanFolderName is idempotent") {
    forAllG(folderGen) { f =>
      val once = PathAlg.cleanFolderName(f)
      assert(PathAlg.cleanFolderName(once) == once)
    }
  }

  test("cleanFolderName output has no leading/trailing/duplicate slash") {
    forAllG(Gen.listOf(Gen.oneOf(segGen, Gen.const(""), Gen.const("."),
        Gen.const(".."))).map(_.mkString("/"))) { f =>
      val c = PathAlg.cleanFolderName(f)
      assert(!c.startsWith("/") && !c.endsWith("/") && !c.contains("//"))
    }
  }

  // --- combine (download_file.py:119-127) ---

  test("combine joins folder and file") {
    assert(PathAlg.combine("a/b", "f.csv") == "a/b/f.csv")
    assert(PathAlg.combine("", "f.csv") == "f.csv")
    assert(PathAlg.combine("/a/", "f.csv") == "a/f.csv")
  }

  // --- baseName (download_file.py:65-71) ---

  test("baseName extracts the final segment") {
    assert(PathAlg.baseName("a/b/c.txt") == "c.txt")
    assert(PathAlg.baseName("c.txt") == "c.txt")
  }

  test("baseName of combine(folder, file) is file") {
    forAllG(Gen.zip(folderGen, segGen)) { case (folder, file) =>
      assert(PathAlg.baseName(PathAlg.combine(folder, file)) == file)
    }
  }

  // --- enumerateFileName: _N before FIRST dot (download_file.py:74-84) ---

  test("enumerate injects before the first dot") {
    assert(PathAlg.enumerateFileName("data.csv", 1) == "data_1.csv")
    assert(PathAlg.enumerateFileName("archive.tar.gz", 2) == "archive_2.tar.gz")
    assert(PathAlg.enumerateFileName("noext", 3) == "noext_3")
    assert(PathAlg.enumerateFileName(".hidden", 1) == "_1.hidden")
  }

  test("enumerate preserves prefix and extension") {
    forAllG(Gen.zip(segGen, segGen, Gen.choose(1, 999))) { case (stem, ext, n) =>
      assert(PathAlg.enumerateFileName(s"$stem.$ext", n) == s"${stem}_$n.$ext")
      assert(PathAlg.enumerateFileName(stem, n) == s"${stem}_$n")
    }
  }

  // --- determineFileName three-way choice (download_file.py:87-106) ---

  test("determine: explicit, enumerated, basename") {
    assert(PathAlg.determineFileName("a/s.txt", Some("d.txt"), None) == "d.txt")
    assert(PathAlg.determineFileName("a/s.txt", Some("d.txt"), Some(2)) == "d_2.txt")
    assert(PathAlg.determineFileName("a/s.txt", None, None) == "s.txt")
    assert(PathAlg.determineFileName("a/s.txt", None, Some(9)) == "s.txt")
  }

  test("determineFullPath combines cleaned folder with chosen name") {
    assert(PathAlg.determineFullPath("/out/", Some("d.csv"), "a/s.csv", Some(1))
      == "out/d_1.csv")
    assert(PathAlg.determineFullPath("", None, "a/s.csv", None) == "s.csv")
  }
}
