package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream,
  DataInputStream, DataOutputStream}
import java.nio.{ByteBuffer, ByteOrder}

import org.roaringbitmap.longlong.Roaring64NavigableMap

/** Iceberg-v3 DELETION VECTORS: position deletes carried as Puffin blobs
  * instead of parquet tombstone files (spec v3 "Deletion vectors"; one
  * blob per referenced data file, the blob payload being the set of
  * deleted row ordinals). Why they exist: a parquet pos-delete file costs
  * a footer + column chunks + a task to read rows that are pure metadata,
  * and every MOR read joins against ALL accumulated tombstone rows; a
  * deletion vector is one blob keyed by its target file, loaded only when
  * that file is scanned, and consecutive deletes amortize into one run
  * container.
  *
  * The blob is the spec's `deletion-vector-v1` layout (Puffin spec,
  * "deletion-vector-v1 blob type"), byte for byte:
  *
  *   - combined length of the magic + vector, 4 bytes BIG-endian;
  *   - magic `D1 D3 39 64`;
  *   - the vector: a 64-bit roaring bitmap in the "portable"
  *     serialization (u64 little-endian count of 32-bit bitmaps, then per
  *     bitmap a u32 little-endian high-key followed by the standard
  *     32-bit RoaringBitmap serialization) — RoaringBitmap's own
  *     `serializePortable`, run-optimized first so dense delete ranges
  *     land as run containers;
  *   - CRC-32 of (magic ++ vector), 4 bytes BIG-endian.
  *
  * Blob properties carry `referenced-data-file` and `cardinality`, as the
  * spec requires — a conforming v3 reader can consume these containers.
  * DeletionVectorSpec pins the vector bytes against a hand-built portable
  * stream (array / run / bitmap container cases) and the framing against
  * the spec constants.
  */
object DeletionVectors {

  val BlobType = "deletion-vector-v1"

  private val Magic = Array(0xD1, 0xD3, 0x39, 0x64).map(_.toByte)

  /** `deletion-vector-v1` blob payload for one target file's ordinals. */
  def blobBytes(positions: Seq[Long]): Array[Byte] = {
    val bm = new Roaring64NavigableMap()
    positions.foreach(bm.addLong)
    bm.runOptimize()
    val vec = new ByteArrayOutputStream()
    bm.serializePortable(new DataOutputStream(vec))
    val vector = vec.toByteArray
    val crc = new java.util.zip.CRC32()
    crc.update(Magic); crc.update(vector)
    val out = ByteBuffer.allocate(4 + 4 + vector.length + 4)
      .order(ByteOrder.BIG_ENDIAN)
    out.putInt(4 + vector.length) // magic + vector, spec field 1
    out.put(Magic)
    out.put(vector)
    out.putInt(crc.getValue.toInt)
    out.array()
  }

  /** Decode one blob payload back to sorted ordinals; every framing field
    * (length, magic, CRC) is verified — a torn or foreign blob fails
    * loudly, never as silently-missing deletes. */
  def blobPositions(data: Array[Byte]): Seq[Long] = {
    require(data.length >= 12, s"deletion vector too short: ${data.length}")
    val buf = ByteBuffer.wrap(data).order(ByteOrder.BIG_ENDIAN)
    val combined = buf.getInt
    require(combined == data.length - 8,
      s"deletion vector length field $combined != ${data.length - 8}")
    val magic = new Array[Byte](4); buf.get(magic)
    require(java.util.Arrays.equals(magic, Magic),
      s"bad deletion-vector magic: ${magic.map("%02x".format(_)).mkString}")
    val vector = new Array[Byte](combined - 4); buf.get(vector)
    val stored = buf.getInt
    val crc = new java.util.zip.CRC32()
    crc.update(Magic); crc.update(vector)
    require(stored == crc.getValue.toInt,
      s"deletion-vector CRC mismatch: stored $stored, computed ${crc.getValue.toInt}")
    val bm = new Roaring64NavigableMap()
    bm.deserializePortable(
      new DataInputStream(new ByteArrayInputStream(vector)))
    bm.toArray.toSeq
  }

  /** One Puffin container holding one DV blob per target data file. */
  def write(file: java.io.File, snapshotId: Long,
      perTarget: Seq[(String, Seq[Long])]): Unit =
    PuffinIO.write(file, perTarget.sortBy(_._1).map { case (target, poss) =>
      val distinct = poss.distinct
      PuffinIO.Blob(BlobType, Nil, snapshotId, snapshotId,
        Map("referenced-data-file" -> target,
          "cardinality" -> distinct.size.toString),
        blobBytes(distinct))
    })

  /** Streaming twin of [[write]] for driver-folds over sorted input:
    * each group's RAW ordinals stream by and compress to a blob as they
    * pass, but the finished blobs all buffer until PuffinIO.write — so
    * driver memory is bounded by one target's ordinals plus the TOTAL
    * compressed blob bytes, not by the raw pair list. Unlike [[write]]
    * (which sorts and dedupes itself), callers must pass target-sorted
    * groups of distinct ordinals; returns the total pair count. */
  def writeStreamed(file: java.io.File, snapshotId: Long,
      perTarget: Iterator[(String, Seq[Long])]): Long = {
    var pairs = 0L
    val blobs = perTarget.map { case (target, poss) =>
      pairs += poss.size
      PuffinIO.Blob(BlobType, Nil, snapshotId, snapshotId,
        Map("referenced-data-file" -> target,
          "cardinality" -> poss.size.toString),
        blobBytes(poss))
    }.toVector
    PuffinIO.write(file, blobs)
    pairs
  }

  /** (target data file, deleted ordinals) per blob. */
  def read(file: java.io.File): Seq[(String, Seq[Long])] =
    PuffinIO.read(file).filter(_.blobType == BlobType).map { b =>
      (b.properties("referenced-data-file"), blobPositions(b.data))
    }

  def isDvPath(p: String): Boolean = p.endsWith(".puffin")
}
