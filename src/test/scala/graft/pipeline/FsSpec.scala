package graft.pipeline

import graft.SparkSpec
import java.nio.file.Files

/** The `Fs` helper surface against local paths — one assertion per method
  * of the reference's HDFS op set (/root/reference/src/Hadron/Run/
  * Hadoop.hs:313-461: exists/delete/ls/put/mkdir/chmod/cat/get). The same
  * code path serves HDFS/object stores (the scheme picks the Hadoop
  * FileSystem implementation), so local coverage exercises the real calls.
  */
class FsSpec extends SparkSpec {

  private def tmp() = Files.createTempDirectory("graft-fs").toString

  test("mkdir creates, exists sees it, delete removes it") {
    val base = tmp()
    val dir = base + "/sub/deep"
    assert(!Fs.exists(spark, dir))
    assert(Fs.mkdir(spark, dir))
    assert(Fs.exists(spark, dir))
    assert(Fs.delete(spark, base + "/sub"))
    assert(!Fs.exists(spark, dir))
  }

  test("put + ls + cat + get round-trip a small file") {
    val base = tmp()
    val local = Files.createTempFile("graft-fs-src", ".txt")
    Files.writeString(local, "alpha\nbeta\n")

    Fs.mkdir(spark, base + "/data")
    Fs.put(spark, local.toString, base + "/data/f.txt")

    val listed = Fs.ls(spark, base + "/data")
    assert(listed.size == 1 && listed.head.endsWith("/f.txt"))

    assert(Fs.cat(spark, base + "/data/f.txt") == Seq("alpha", "beta"))

    val back = base + "/back.txt"
    Fs.get(spark, base + "/data/f.txt", back)
    assert(Files.readString(java.nio.file.Paths.get(back)) == "alpha\nbeta\n")
  }

  test("ls returns sorted fully-qualified children") {
    val base = tmp()
    Seq("b.txt", "a.txt", "c.txt").foreach { n =>
      Files.writeString(java.nio.file.Paths.get(base, n), n)
    }
    val names = Fs.ls(spark, base).map(_.split('/').last)
    assert(names == Seq("a.txt", "b.txt", "c.txt"))
  }

  test("chmod sets the permission bits") {
    val base = tmp()
    val f = java.nio.file.Paths.get(base, "locked.txt")
    Files.writeString(f, "x")
    Fs.chmod(spark, f.toString, "600")
    val perms = java.nio.file.Files.getPosixFilePermissions(f)
    import java.nio.file.attribute.PosixFilePermission._
    assert(perms.contains(OWNER_READ) && perms.contains(OWNER_WRITE))
    assert(!perms.contains(GROUP_READ) && !perms.contains(OTHERS_READ))
  }

  test("delete of a missing path returns false, not an error") {
    assert(!Fs.delete(spark, tmp() + "/never-existed"))
  }
}
