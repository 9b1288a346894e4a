package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

class FsSpec extends AnyFunSuite {

  test("deleteRecursively removes a symlink entry without touching its target") {
    val target = Files.createTempDirectory("fs-target")
    val inside = target.resolve("precious.txt")
    Files.write(inside, "keep me".getBytes)

    val doomed = Files.createTempDirectory("fs-doomed")
    Files.write(doomed.resolve("a.txt"), "x".getBytes)
    val link = doomed.resolve("link-to-target")
    Files.createSymbolicLink(link, target)

    Fs.deleteRecursively(doomed)

    assert(!Files.exists(doomed), "doomed dir should be gone")
    assert(Files.exists(target), "symlink target dir must survive")
    assert(Files.exists(inside), "symlink target contents must survive")
    Fs.deleteRecursively(target)
  }

  test("deleteRecursively still removes real nested directories") {
    val root = Files.createTempDirectory("fs-nested")
    val sub = Files.createDirectories(root.resolve("a/b/c"))
    Files.write(sub.resolve("f.txt"), "x".getBytes)
    Fs.deleteRecursively(root)
    assert(!Files.exists(root))
  }
}
