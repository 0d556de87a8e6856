package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.PuffinIO

/** Puffin statistics-container framing: byte-exact blob round trips,
  * magic/size validation, and loud failure on the structures we choose
  * not to support (compressed footers) or corrupt framing. */
class PuffinSpec extends AnyFunSuite {

  private def tmp(name: String): java.io.File = {
    val f = new java.io.File(TestTmp.dir("puffin"), name)
    f.getParentFile.mkdirs(); f
  }

  test("two-blob container round-trips types, fields, properties, bytes") {
    val f = tmp("ok.puffin")
    val b1 = PuffinIO.Blob("graft-kmv-sketch-v1", Seq(2), 7L, 3L,
      Map("k" -> "64", "column" -> "a"), PuffinIO.sketchBytes(Seq(1L, 5L, 9L)))
    val b2 = PuffinIO.Blob("other-blob", Seq(3, 4), 7L, 3L,
      Map("note" -> """quo"te\back"""), Array[Byte](1, 2, 3))
    PuffinIO.write(f, Seq(b1, b2))
    val got = PuffinIO.read(f)
    assert(got.size == 2)
    assert(got(0).blobType == "graft-kmv-sketch-v1" && got(0).fields == Seq(2))
    assert(got(0).snapshotId == 7L && got(0).sequenceNumber == 3L)
    assert(got(0).properties == Map("k" -> "64", "column" -> "a"))
    assert(PuffinIO.sketchLongs(got(0).data) == Seq(1L, 5L, 9L))
    assert(got(1).properties("note") == """quo"te\back""")
    assert(got(1).data.toSeq == Seq[Byte](1, 2, 3))
  }

  test("empty-blob-list container still frames and reads") {
    val f = tmp("empty.puffin")
    PuffinIO.write(f, Nil)
    assert(PuffinIO.read(f).isEmpty)
  }

  test("corrupt framing fails loudly, never silently") {
    val f = tmp("base.puffin")
    PuffinIO.write(f, Seq(PuffinIO.Blob("t", Nil, 1L, 1L, Map.empty,
      Array[Byte](9, 9, 9, 9))))
    val bytes = java.nio.file.Files.readAllBytes(f.toPath)
    def mutated(name: String)(fn: Array[Byte] => Array[Byte]): java.io.File = {
      val g = tmp(name)
      java.nio.file.Files.write(g.toPath, fn(bytes.clone()))
      g
    }
    // front magic
    intercept[IllegalArgumentException] {
      PuffinIO.read(mutated("m1.puffin") { b => b(0) = 'X'; b })
    }
    // tail magic
    intercept[IllegalArgumentException] {
      PuffinIO.read(mutated("m2.puffin") { b => b(b.length - 1) = 'X'; b })
    }
    // compressed-footer flag: unsupported by design
    intercept[IllegalArgumentException] {
      PuffinIO.read(mutated("m3.puffin") { b => b(b.length - 8) = 1; b })
    }
    // truncation
    intercept[IllegalArgumentException] {
      PuffinIO.read(mutated("m4.puffin")(_.take(10)))
    }
    // footer size pointing outside the file
    intercept[IllegalArgumentException] {
      PuffinIO.read(mutated("m5.puffin") { b => b(b.length - 12) = 127; b })
    }
  }
}
