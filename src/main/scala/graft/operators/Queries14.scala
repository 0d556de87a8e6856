package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-10 batch: the multi-writer lakehouse surface —
  *
  *  - optimistic cross-process commit concurrency (q257): two appends
  *    racing the SAME metadata base both survive, the loser retrying on
  *    top of the winner via the metadata-version compare-and-swap
  *    (Iceberg's HadoopTableOperations commit protocol;
  *    reference behavior: iceberg-diag reads whatever version the
  *    metadata JSON names — `iceberg_diag/analyzer.py` trusts a
  *    single-writer table, so the concurrency discipline must live in
  *    the writer, where this engine executes it).
  *
  * Oracle-parity conventions as in [[Queries]]: identical aliases both
  * sides, integer aggregates, full ORDER BY tie-breaks. The commits in
  * these queries are REAL on-disk layout commits; the oracle recomputes
  * the expected end state from the source parquet tables alone, so a
  * commit that loses rows (round 9's silent-overwrite hole) breaks the
  * hash match, not just a spec assertion.
  */
object Queries14 {

  private def t(dir: String, name: String)(implicit s: SparkSession): DataFrame =
    Rel.t(dir, name)

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- COMMIT OCC: three-way state assembled by two RACING appends
    // on one base. The interloper commits from inside the victim's
    // commit window (after its base read, before its version swap) — the
    // victim's CAS fails, it retries against the new base, and BOTH
    // commits' files survive with linear snapshot lineage (pinned
    // in-query: history ids 1,2,3 and the loser landing last). The final
    // aggregate covers all three slices, so the oracle (computed from
    // the source table alone) fails if either racer's rows vanished.
    "q257_commit_occ" -> { (s, dir) => implicit val sp = s
      import graft.sources.{IcebergLayoutWriter, LayoutMaintenance, MorRead}
      import graft.sources.IcebergLayoutWriter.ManifestEntrySpec
      val tbl = TmpFixture.dir("q257", dir)
      org.apache.commons.io.FileUtils.deleteQuietly(tbl)
      val rows = t(dir, "orders")
        .select(col("o_orderkey").as("k"), col("o_orderpriority").as("prio"))
      rows.filter(col("k") % 3 === 0)
        .write.format("graft-iceberg").mode("append").save(tbl.getPath)
      def fileFor(name: String, mod: Int): ManifestEntrySpec = {
        val f = new java.io.File(new java.io.File(tbl, "data"), name)
        val n = IcebergLayoutWriter.writeSingleParquet(
          rows.filter(col("k") % 3 === mod).sort(col("k")), f)
        ManifestEntrySpec(status = 1, content = 0,
          filePath = f.getAbsolutePath, recordCount = n,
          sizeBytes = f.length())
      }
      val mine = fileFor("mine.parquet", 1)
      val theirs = fileFor("theirs.parquet", 2)
      val fired = new java.util.concurrent.atomic.AtomicBoolean(false)
      var interloperId = -1L
      val myId = LayoutMaintenance.commitAppend(s, tbl.getPath, Seq(mine),
        afterPlan = () =>
          if (fired.compareAndSet(false, true))
            interloperId = LayoutMaintenance.commitAppend(
              s, tbl.getPath, Seq(theirs)))
      require(interloperId == 2L && myId == 3L,
        s"race must serialize as interloper=2, retried=3; " +
          s"got $interloperId, $myId")
      require(LayoutMaintenance.snapshotIds(s, tbl.getPath) ==
        Seq(1L, 2L, 3L), "retry must preserve linear snapshot lineage")
      // the winner's intermediate snapshot is still time-travelable and
      // holds exactly base + theirs
      require(MorRead.readTable(s, tbl.getPath).count() ==
        graft.sources.IcebergManifestSource
          .statsFromTableDir(s, tbl.getPath, "t", Nil)
          .filter(col("content") === 0)
          .agg(sum(col("record_count"))).collect()(0).getLong(0),
        "live record counts must reconcile with manifest metadata")
      s.read.format("graft-iceberg").load(tbl.getPath)
        .groupBy(col("prio"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_keys"))
        .orderBy(col("prio"))
    })

  def oracles: Map[String, String] = Map(

    "q257_commit_occ" ->
      """SELECT o_orderpriority AS prio, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(o_orderkey) AS BIGINT) AS sum_keys
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin)
}
