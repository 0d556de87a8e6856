package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Queries13

/** Behavioral tests for the round-9 batch-2 curation operators —
  * algorithm invariants on top of the oracle gate's value parity: the
  * span dedup must actually catch the plagiarized fixture twins, RRF
  * must be the exact two-term fusion of the component ranks, the
  * perceptual hash must be brightness-invariant (the property that makes
  * it perceptual), the audio stats must equal a codec-free recomputation
  * (so the WAV round trip is pixel... sample-exact), and DSIR selection
  * must enrich the target domain above its base rate. */
class Queries13Spec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  private val dir = "/root/testdata/sf0.001"

  test("span dedup: every plagiarized twin is caught via its copied prefix") {
    import spark.implicits._
    val out = Queries13.all("q221_span_dedup")(spark, dir)
      .select("source", "n_dup_spans", "n_dup_docs")
      .as[(String, Long, Long)].collect().map { case (s, a, b) => (s, (a, b)) }.toMap
    // fixture: doc_id % 50 == 0 docs get a twin copying chars 1..150.
    // Each twin with a copied region >= SpanW chars shares its aligned
    // prefix windows with the original, so its source must report dup
    // spans and at least one dup doc.
    val plagSources = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") % 50 === 0 && length(col("text")) >= 50)
      .select("source").as[String].collect().toSet
    assert(plagSources.nonEmpty)
    plagSources.foreach { src =>
      val (dupSpans, dupDocs) = out(src)
      assert(dupSpans >= 1L, s"source $src: twin's copied prefix not found")
      assert(dupDocs >= 1L, s"source $src: no doc marked duplicated")
    }
  }

  test("RRF: fused score is exactly 1/(60+r_lex) + 1/(60+r_dense)") {
    import spark.implicits._
    val rows = Queries13.all("q223_rrf_hybrid")(spark, dir)
      .select("qid", "rank", "r_lex", "r_dense", "rrf")
      .as[(Long, Long, Option[Long], Option[Long], Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, _, rl, rd, rrf) =>
      val expect = rl.map(r => 1.0 / (60.0 + r)).getOrElse(0.0) +
        rd.map(r => 1.0 / (60.0 + r)).getOrElse(0.0)
      assert(math.abs(rrf - expect) < 1e-6)
      assert(rl.nonEmpty || rd.nonEmpty, "a fused row must come from some ranker")
    }
    // within a query, rrf is non-increasing down the rank order
    rows.groupBy(_._1).foreach { case (_, rs) =>
      val byRank = rs.sortBy(_._2).map(_._5)
      byRank.zip(byRank.tail).foreach { case (hi, lo) => assert(hi >= lo - 1e-9) }
    }
  }

  test("perceptual dhash: brightness-shifted family members collide") {
    import spark.implicits._
    val out = Queries13.all("q224_dhash_image_dedup")(spark, dir)
      .select("dhash", "n_imgs", "rep_doc")
      .as[(Long, Long, Long)].collect()
    val nImages = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") % 5 === 0).count()
    assert(out.map(_._2).sum == nImages, "every image lands in exactly one cluster")
    // docs 0 and 5 are the same doc_id/7 family (base 0) with different
    // +c brightness; a perceptual hash MUST group them
    val cluster0 = out.find(_._3 == 0L).get
    assert(cluster0._2 >= 2L, "brightness-shifted near-duplicates must share a dhash")
  }

  test("audio stats equal a codec-free recomputation (WAV roundtrip exact)") {
    import spark.implicits._
    val got = Queries13.all("q225_audio_stats")(spark, dir)
      .select("source", "total_samples", "total_abs", "max_amp", "total_zc")
      .as[(String, Long, Long, Long, Long)].collect().toSet
    // recompute from the synthesis formula, never touching the codec
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") % 3 === 0)
      .select("source", "doc_id", "n_chars").as[(String, Long, Long)].collect()
    val expect = docs.groupBy(_._1).map { case (src, ds) =>
      var (tn, ta, ma, tz) = (0L, 0L, 0L, 0L)
      ds.foreach { case (_, docId, nChars) =>
        val n = (64 + nChars % 128).toInt
        val s = (1 to n).map(i =>
          (((docId + 1) * i * 2654435761L) % 65536L - 32768L).toShort)
        tn += n
        ta += s.map(v => math.abs(v.toLong)).sum
        ma = math.max(ma, s.map(v => math.abs(v.toLong)).max)
        tz += s.zip(s.tail).count { case (a, b) => (b >= 0) != (a >= 0) }
      }
      (src, tn, ta, ma, tz)
    }.toSet
    assert(got == expect)
  }

  test("DSIR selection enriches the target domain above its base rate") {
    import spark.implicits._
    val sel = Queries13.all("q226_dsir_select")(spark, dir)
      .select("lang", "n_selected").as[(String, Long)].collect().toMap
    val total = sel.values.sum
    val base = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("text").isNotNull)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    val baseRate = base("en").toDouble / base.values.sum
    val selRate = sel.getOrElse("en", 0L).toDouble / total
    assert(total == 100L)
    assert(selRate > baseRate,
      s"importance resampling must shift toward the target: $selRate vs $baseRate")
  }

  test("MOR applies position tombstones that target ORC data files") {
    import org.apache.spark.sql.functions._
    import graft.sources.{IcebergLayoutWriter, MorRead}
    import graft.sources.IcebergLayoutWriter.ManifestEntrySpec
    val s = spark
    import s.implicits._
    val tbl = new java.io.File(sys.props("java.io.tmpdir"), "graft-orcguard")
    org.apache.commons.io.FileUtils.deleteQuietly(tbl)
    val dataDir = new java.io.File(tbl, "data"); dataDir.mkdirs()
    val of = new java.io.File(dataDir, "d.orc")
    val n = IcebergLayoutWriter.writeSingleOrc(
      Seq((1L, "a"), (2L, "b")).toDF("k", "v"), of)
    assert(n == 2L)
    val pd = new java.io.File(dataDir, "pd.parquet")
    IcebergLayoutWriter.writeSingleParquet(
      Seq((of.getAbsolutePath, 0L)).toDF("file_path", "pos"), pd)
    IcebergLayoutWriter.writeTable(tbl, Seq(
      ManifestEntrySpec(status = 1, content = 0, filePath = of.getAbsolutePath,
        recordCount = n, sizeBytes = of.length(), sequenceNumber = 1L,
        fileFormat = "ORC"),
      ManifestEntrySpec(status = 1, content = 1, filePath = pd.getAbsolutePath,
        recordCount = 1L, sizeBytes = pd.length(), sequenceNumber = 1L)))
    // the tombstone targets (d.orc, pos=0): the ORC file routes through
    // the ordinal-carrying scan and row 0 dies — rows 1+ survive
    val surv = MorRead.readTable(spark, tbl.getPath)
      .select("k", "v").as[(Long, String)].collect().toSet
    assert(surv == Set((2L, "b")),
      s"pos-0 row must be tombstoned, got $surv")
    // without a tombstone the ORC file keeps the fast null-pos scan
    val tbl2 = new java.io.File(sys.props("java.io.tmpdir"), "graft-orcok")
    org.apache.commons.io.FileUtils.deleteQuietly(tbl2)
    new java.io.File(tbl2, "data").mkdirs()
    val of2 = new java.io.File(new java.io.File(tbl2, "data"), "d.orc")
    IcebergLayoutWriter.writeSingleOrc(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), of2)
    IcebergLayoutWriter.writeTable(tbl2, Seq(
      ManifestEntrySpec(status = 1, content = 0, filePath = of2.getAbsolutePath,
        recordCount = 2L, sizeBytes = of2.length(), sequenceNumber = 1L,
        fileFormat = "ORC")))
    val rows = MorRead.readTable(spark, tbl2.getPath)
      .select("k", "v").as[(Long, String)].collect().toSet
    assert(rows == Set((1L, "a"), (2L, "b")))
    org.apache.commons.io.FileUtils.deleteQuietly(tbl)
    org.apache.commons.io.FileUtils.deleteQuietly(tbl2)
  }

  test("normalization uplift: mangled twins found only by the normalized key") {
    import spark.implicits._
    val rows = Queries13.all("q228_normalization_uplift")(spark, dir)
      .select("source", "raw_dup_docs", "norm_dup_docs", "uplift")
      .as[(String, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, raw, norm, uplift) =>
      assert(norm >= raw, "normalization can only find MORE duplicates")
      assert(uplift == norm - raw)
    }
    assert(rows.map(_._4).sum > 0, "the planted shouting twins must be caught")
  }

  test("PSI is non-negative (every (p-q)ln(p/q) term is)") {
    import spark.implicits._
    val rows = Queries13.all("q229_psi_drift")(spark, dir)
      .select("source", "psi_micro").as[(String, Long)].collect()
    assert(rows.nonEmpty)
    // each exact term is >= 0; floor() can only reach -1 on a term that
    // is exactly 0 minus an ulp, so allow the tiny quantization slack
    rows.foreach { case (src, psi) =>
      assert(psi >= -rows.length, s"PSI must be ~non-negative, $src: $psi")
    }
  }

  test("RAG chunks tile each doc: stride 150, full coverage, exact tail") {
    import spark.implicits._
    val chunks = Queries13.all("q230_rag_chunks")(spark, dir)
      .select("doc_id", "pos", "chunk_len")
      .as[(Long, Long, Long)].collect().groupBy(_._1)
    val lens = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") % 97 === 0 && col("text").isNotNull)
      .select(col("doc_id"), length(col("text")).cast("long"))
      .as[(Long, Long)].collect().toMap
    assert(chunks.nonEmpty && chunks.keySet == lens.keySet)
    chunks.foreach { case (doc, cs) =>
      val sorted = cs.sortBy(_._2)
      assert(sorted.head._2 == 1L, "first chunk starts at 1")
      sorted.zip(sorted.tail).foreach { case (a, b) =>
        assert(b._2 - a._2 == 150L, "stride is 150") }
      val last = sorted.last
      assert(last._2 + last._3 - 1 == lens(doc), "last chunk ends at doc end")
      sorted.foreach { case (_, pos, l) =>
        assert(l == math.min(200L, lens(doc) - pos + 1),
          "every chunk is full-width or clipped by the doc end") }
    }
  }

  test("int8 quantization error is within the symmetric-scale bound") {
    import spark.implicits._
    val rows = Queries13.all("q231_int8_quant_audit")(spark, dir)
      .select("label", "n_vecs", "total_sse_nano", "max_err_micro")
      .as[(Int, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    // |v - dq| <= scale/254 per element; bound with the global max scale
    val maxScale = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(expr(
        "aggregate(transform(embedding, v -> abs(CAST(v AS DOUBLE))), " +
          "CAST(0 AS DOUBLE), (a, x) -> greatest(a, x))").as("s"))
      .agg(max(col("s"))).as[Double].head()
    val boundMicro = math.ceil(maxScale / 254.0 * 1e6).toLong + 1
    rows.foreach { case (_, n, sse, maxe) =>
      assert(n > 0 && sse >= 0)
      assert(maxe <= boundMicro, s"err $maxe exceeds bound $boundMicro")
    }
  }

  test("temperature sampling flattens the language distribution toward sqrt shares") {
    import spark.implicits._
    val rows = Queries13.all("q234_temperature_sampling")(spark, dir)
      .select("lang", "n_orig", "n_kept").as[(String, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, o, k) => assert(k <= o, "sampling never adds docs") }
    val totO = rows.map(_._2).sum.toDouble
    val totK = rows.map(_._3).sum.toDouble
    val head = rows.maxBy(_._2)
    val tail = rows.minBy(_._2)
    // the head language's share must SHRINK, the tail language's GROW
    assert(head._3 / totK < head._2 / totO, "head lang share must shrink")
    assert(tail._3 / totK > tail._2 / totO, "tail lang share must grow")
  }

  test("image near-dup banding has EXACT recall at hamming <= 6 (pigeonhole)") {
    import spark.implicits._
    val got = graft.operators.Queries13.all("q237_image_neardup")(spark, dir)
      .select("id_a", "id_b", "ham").as[(Long, Long, Long)].collect().toSet
    // brute force: every pair of dhashes within the threshold, computed
    // through the same real-codec path (doc ids only — no banding)
    val ids = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") % 5 === 0).select("doc_id").as[Long].collect()
    def dhashOf(docId: Long): Long = {
      val base = docId / 7; val w = 9; val h = 8
      val (px, py) = ((docId % 9).toInt, (docId % 8).toInt)
      val rgb = new Array[Byte](w * h * 3)
      for (y <- 0 until h; x <- 0 until w) {
        val bump = if (x == px && y == py) 12L else 0L
        val v = (((base * 2003L + x * 89L + y * 41L) % 211L) + bump).toInt
        val i = (y * w + x) * 3
        rgb(i) = v.toByte; rgb(i + 1) = v.toByte; rgb(i + 2) = v.toByte
      }
      import graft.multimodal.RealCodec
      val img = RealCodec.decodePng(RealCodec.encodePng(RealCodec.Image(w, h, rgb)))
      def g(x: Int, yy: Int): Int = img.rgb((yy * w + x) * 3) & 0xFF
      (0 until 63).foldLeft(0L) { (acc, b) =>
        if (g(b % 8 + 1, b / 8) > g(b % 8, b / 8)) acc | (1L << b) else acc }
    }
    val hs = ids.map(id => id -> dhashOf(id))
    val brute = (for {
      (a, ha) <- hs; (b, hb) <- hs if a < b
      ham = java.lang.Long.bitCount(ha ^ hb) if ham <= 6
    } yield (a, b, ham.toLong)).toSet
    assert(got == brute, "7x9-bit banding must find EVERY pair within ham 6")
    assert(got.nonEmpty && got.exists(_._3 > 0), "need true near (not exact) dups")
  }

  test("repetition gate: flagged count consistent and thresholds live") {
    import spark.implicits._
    val rows = Queries13.all("q222_repetition_filter")(spark, dir)
      .select("lang", "n_docs", "n_flagged", "max_dupw_bp", "max_topbg_bp")
      .as[(String, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, n, f, maxDup, maxTop) =>
      assert(f <= n)
      assert(maxDup <= 10000L && maxTop <= 10000L)
      // if anything is flagged, some max must exceed its threshold
      if (f > 0) assert(maxDup > 8500L || maxTop > 700L)
    }
    assert(rows.map(_._3).sum > 0, "the gate must flag something on this corpus")
  }
}
