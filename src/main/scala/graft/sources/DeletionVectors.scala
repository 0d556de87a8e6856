package graft.sources

/** Iceberg-v3-style DELETION VECTORS: position deletes carried as Puffin
  * blobs instead of parquet tombstone files (spec v3 "Deletion vectors";
  * one blob per referenced data file, the blob payload being the set of
  * deleted row ordinals). Why they exist: a parquet pos-delete file costs
  * a footer + column chunks + a task to read rows that are pure metadata,
  * and every MOR read joins against ALL accumulated tombstone rows; a
  * deletion vector is one blob keyed by its target file, loaded only when
  * that file is scanned, and consecutive deletes amortize into one
  * container. This dialect keeps the v3 CONTAINER contract (Puffin blob
  * per target, `referenced-data-file` + `cardinality` properties) with a
  * sorted-fixed64 payload where the real spec uses a roaring bitmap — the
  * codec is swappable, the plumbing (write path, manifest entries with
  * fileFormat=PUFFIN, MOR application, rewrite folding, connector reads)
  * is the engineering surface.
  */
object DeletionVectors {

  val BlobType = "graft-deletion-vector-v1"

  /** One Puffin container holding one DV blob per target data file.
    * Positions are sorted before encoding — the payload is a strictly
    * increasing fixed64 sequence (dedup included). */
  def write(file: java.io.File, snapshotId: Long,
      perTarget: Seq[(String, Seq[Long])]): Unit =
    PuffinIO.write(file, perTarget.sortBy(_._1).map { case (target, poss) =>
      val sorted = poss.distinct.sorted
      PuffinIO.Blob(BlobType, Nil, snapshotId, snapshotId,
        Map("referenced-data-file" -> target,
          "cardinality" -> sorted.size.toString),
        PuffinIO.sketchBytes(sorted))
    })

  /** (target data file, deleted ordinals) per blob. */
  def read(file: java.io.File): Seq[(String, Seq[Long])] =
    PuffinIO.read(file).filter(_.blobType == BlobType).map { b =>
      (b.properties("referenced-data-file"), PuffinIO.sketchLongs(b.data))
    }

  def isDvPath(p: String): Boolean = p.endsWith(".puffin")
}
