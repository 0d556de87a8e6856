package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{CdcOps, Queries5}

/** Behavioral tests for the round-5 operator families (the oracle gate
  * covers value parity; these pin down SEMANTICS on controlled inputs). */
class Queries5Spec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  private val dir = "/root/testdata/sf0.001"

  test("PII redaction: every synthesized class is found, redacted hash differs from raw") {
    import spark.implicits._
    val rows = Queries5.all("q73_pii_redaction")(spark, dir)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (id, nEmail, nIp, nNum, _) =>
      if (id % 7 == 0) assert(nEmail >= 1, s"doc $id: synthesized email missed")
      if (id % 11 == 0) assert(nIp >= 1, s"doc $id: synthesized IP missed")
      if (id % 13 == 0) assert(nNum >= 1, s"doc $id: synthesized card missed")
      assert(nEmail + nIp + nNum > 0)
    }
    // docs matching none of the synthesis residues carry no PII (word salad)
    assert(rows.forall(r => r._1 % 7 == 0 || r._1 % 11 == 0 || r._1 % 13 == 0))
  }

  test("PII redaction: redaction is idempotent and removes every match") {
    val pat = Seq("""[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}""",
      """\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b""", """\d{12,19}""")
    val red = pat.foldLeft("mail a.b@c.io and 10.0.0.1 and 123456789012345")(
      (s, p) => s.replaceAll(p, "<X>"))
    assert(red == "mail <X> and <X> and <X>")
    pat.foreach(p => assert(!red.matches(s".*$p.*")))
  }

  test("dup-ngram fraction: twins are near-total duplicates, fraction bounded") {
    import spark.implicits._
    val rows = Queries5.all("q74_dup_ngram_fraction")(spark, dir)
      .as[(Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, nSh, nDup, frac) =>
      assert(nDup <= nSh)
      assert(frac >= 0.0 && frac <= 1.0)
    }
    // a twin (id >= 100000) shares all but its boundary shingles with its
    // original, so its duplicate fraction must be near 1
    val twins = rows.filter(_._1 >= 100000)
    assert(twins.nonEmpty)
    assert(twins.forall(_._4 > 0.8), "twin docs must be dominated by duplicated shingles")
  }

  test("bloom decontamination: exactly the contaminated twins and their sources surface") {
    import spark.implicits._
    val rows = Queries5.all("q75_bloom_decontamination")(spark, dir)
      .as[(Long, Long)].collect()
    assert(rows.nonEmpty)
    // hits are either the planted twins (id >= 500000, trivially 97|id-500000)
    // or organic high-overlap docs; every planted twin MUST be caught
    val twinIds = rows.map(_._1).filter(_ >= 500000)
    implicit val s = spark
    val nEval = graft.operators.Rel.t(dir, "documents")
      .filter(col("doc_id") % 97 === 0).count()
    assert(twinIds.length == nEval, s"planted twins caught ${twinIds.length}/$nEval")
    rows.foreach { case (_, nHit) => assert(nHit >= 3) }
  }

  test("CDC latest-wins: delete beats update at the same version, highest version wins") {
    import spark.implicits._
    val log = Seq(
      (1L, 0L, "U", 10.0), (1L, 1L, "U", 20.0),            // plain update
      (2L, 0L, "U", 10.0), (2L, 2L, "D", 0.0),             // delete
      (3L, 0L, "U", 10.0), (3L, 1L, "U", 30.0), (3L, 1L, "D", 0.0), // tie: D wins
      (4L, 5L, "U", 99.0)                                   // pure insert
    ).toDF("k", "version", "op", "price")
    val out = CdcOps.latestWins(log, Seq("k"), "version", "op")
      .select("k", "price").as[(Long, Double)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((1L, 20.0), (4L, 99.0)))
  }

  test("CDC upsert query: provenance counts are consistent") {
    import spark.implicits._
    val rows = Queries5.all("q76_cdc_upsert")(spark, dir)
      .as[(String, Long, Long, Long, Long, Double)].collect()
    assert(rows.length == 5)
    rows.foreach { case (_, n, nBase, nUpd, nIns, sum) =>
      assert(n == nBase + nUpd + nIns, "every surviving row has exactly one provenance")
      assert(nUpd > 0 && nIns > 0, "fixture guarantees updates and inserts per priority")
      assert(sum > 0)
    }
    // deletes really removed rows: merged count < base + inserts
    implicit val s = spark
    val base = graft.operators.Rel.t(dir, "orders").count()
    val ins = graft.operators.Rel.t(dir, "orders")
      .filter(col("o_orderkey") % 100 === 0).count()
    val del = graft.operators.Rel.t(dir, "orders")
      .filter(col("o_orderkey") % 50 === 0).count()
    assert(rows.map(_._2).sum == base + ins - del)
  }

  test("CDC batch merge == streaming replay on a randomized log (seeded)") {
    import spark.implicits._
    import graft.streaming.StreamingUpsert
    import graft.streaming.StreamingUpsert.Change
    val rnd = new scala.util.Random(42)
    val log = Seq.fill(300)(Change(rnd.nextInt(40).toLong, rnd.nextInt(6).toLong,
      if (rnd.nextInt(4) == 0) "D" else "U", rnd.nextInt(1000) / 10.0))
    // version ties with mixed ops are resolved D-first in BOTH paths, but a
    // same-(key, version, op) pair is ambiguous on price — dedupe those
    val cleanLog = log.groupBy(c => (c.k, c.version, c.op)).map(_._2.head).toSeq
    val batch = CdcOps.latestWins(cleanLog.toDF(), Seq("k"), "version", "op")
      .as[(Long, Long, String, Double)].collect()
      .map(r => r._1 -> (r._2, r._4)).toMap
    val stream = StreamingUpsert.replay(cleanLog).collect {
      case (k, u) if u.alive => k -> (u.version, u.price)
    }
    assert(batch == stream)
  }

  test("column profiler: one row per column, stats internally consistent") {
    import spark.implicits._
    val rows = Queries5.all("q77_column_profiler")(spark, dir)
      .as[(String, Long, Long, Long, Option[Double], Option[Double], Option[String], Option[String])]
      .collect()
    assert(rows.map(_._1).sorted.toSeq ==
      Seq("l_discount", "l_extendedprice", "l_linestatus", "l_quantity", "l_returnflag", "ship_us"))
    val nRows = rows.head._2
    rows.foreach { case (name, n, nulls, dist, mn, mx, smn, smx) =>
      assert(n == nRows, "n_rows identical across the single agg pass")
      assert(nulls + dist <= n + dist) // nulls and distinct both bounded by n
      assert(dist >= 1 && dist <= n)
      if (mn.isDefined) { assert(mx.isDefined && mn.get <= mx.get && smn.isEmpty) }
      else { assert(smn.isDefined && smx.isDefined && smn.get <= smx.get) }
    }
    // spot-check against direct aggregates
    implicit val s = spark
    val rf = rows.find(_._1 == "l_returnflag").get
    val direct = graft.operators.Rel.t(dir, "lineitem")
      .agg(countDistinct(col("l_returnflag")), min("l_returnflag"), max("l_returnflag"))
      .as[(Long, String, String)].head()
    assert(rf._4 == direct._1 && rf._7.get == direct._2 && rf._8.get == direct._3)
  }

  test("k-means: full partition of the corpus, nonnegative inertia, replayed assignment agrees") {
    import spark.implicits._
    val rows = Queries5.all("q78_kmeans")(spark, dir)
      .as[(Long, Long, Double)].collect()
    assert(rows.nonEmpty && rows.length <= 8)
    implicit val s = spark
    val nVecs = graft.operators.Rel.t(dir, "embeddings").count()
    assert(rows.map(_._2).sum == nVecs, "every vector assigned to exactly one cluster")
    rows.foreach { case (cid, n, inertia) =>
      assert(cid >= 0 && cid < 8 && n > 0 && inertia >= 0)
    }
    // at least two clusters survive two Lloyd iterations on 10-label data
    assert(rows.length >= 2)
  }

  test("SemDeDup: finds (almost) all planted twins, sims near 1, no organic pairs") {
    import spark.implicits._
    val rows = Queries5.all("q79_semdedup")(spark, dir)
      .as[(Long, Long, Double)].collect()
    implicit val s = spark
    val nVecs = graft.operators.Rel.t(dir, "embeddings").count()
    // every found pair is original↔its own twin (the corpus has no organic
    // near-dups above the threshold), and nearly all twins co-cluster
    rows.foreach { case (keep, drop, sim) =>
      assert(drop == keep + 100000, s"unexpected organic pair ($keep, $drop)")
      assert(sim > 0.99 && sim <= 1.0)
    }
    assert(rows.length >= (nVecs * 9) / 10, s"only ${rows.length}/$nVecs twins co-clustered")
  }

  test("IVF-kmeans ANN: 20 queries x top-3, ranked by sim, decent recall vs brute force") {
    import spark.implicits._
    val rows = Queries5.all("q81_ivf_kmeans")(spark, dir)
      .as[(Long, Long, Long, Double)].collect()
    assert(rows.map(_._1).distinct.length == 20)
    rows.groupBy(_._1).foreach { case (q, rs) =>
      assert(rs.map(_._2).sorted.toSeq == Seq(1L, 2L, 3L))
      val byRank = rs.sortBy(_._2)
      assert(byRank.map(_._4).zip(byRank.tail.map(_._4)).forall { case (a, b) => a >= b })
      assert(rs.forall(_._3 != q), "self excluded")
    }
    // recall@3 vs exact brute force over the whole corpus (IVF with
    // nprobe=2 of K=8 is approximate; demand > 50% on this fixture)
    implicit val s = spark
    val emb = graft.operators.Rel.t(dir, "embeddings")
      .selectExpr("vec_id", "transform(embedding, x -> CAST(FLOOR(CAST(x AS DOUBLE) * 512) AS BIGINT)) AS q")
      .as[(Long, Array[Long])].collect().toMap
    def cos(a: Array[Long], b: Array[Long]): Double = {
      var d = 0L; var na = 0L; var nb = 0L; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d.toDouble / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble))
    }
    val hits = (0L until 20L).map { q =>
      val exact = emb.filter(_._1 != q).toSeq
        .map { case (v, arr) => (v, cos(emb(q), arr)) }
        .sortBy { case (v, sim) => (-sim, v) }.take(3).map(_._1).toSet
      rows.filter(_._1 == q).map(_._3).count(exact)
    }.sum
    assert(hits >= 30, s"recall@3 too low: $hits/60")
  }

  test("corpus release: decontamination removes the planted twins from the released set") {
    import spark.implicits._
    val rows = Queries5.all("q80_corpus_release")(spark, dir)
      .as[(String, Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    implicit val s = spark
    val docs = graft.operators.Rel.t(dir, "documents")
    val langs = docs.select("lang").distinct().as[String].collect().sorted
    assert(rows.map(_._1).sorted.toSeq == langs.toSeq)
    rows.foreach { case (_, nDocs, nTok, nPii, avgTtr) =>
      assert(nDocs > 0 && nTok >= nDocs * 20, "every released doc passed the token gate")
      assert(nPii <= nDocs)
      assert(avgTtr >= 0.35 && avgTtr <= 1.0)
    }
    // released docs < train docs: contamination + quality gates really cut
    val nTrain = docs.filter(col("doc_id") % 97 =!= 0).count() +
      docs.filter(col("doc_id") % 97 === 0).count() // originals + twins
    assert(rows.map(_._2).sum < nTrain)
  }
}
