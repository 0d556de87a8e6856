package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.{forAll, propBoolean}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.{MortonCode, Pure, TextHashKernels, TopKAggregator}
import graft.model.EngineConfig

/** Property-based invariants for the engine's pure kernels (no Spark
  * session — these run the exact code the expressions/aggregators call). */
object KernelProps extends Properties("kernels") {

  // ---- bin-packer (the compaction simulation's core) ----
  private val sizesGen = Gen.listOf(Gen.chooseNum(0L, 2L * 1024 * 1024 * 1024))
  private val capGen = Gen.chooseNum(1L, 3L * 1024 * 1024 * 1024)

  property("binpack partitions the sorted input exactly") =
    forAll(sizesGen, capGen) { (sizes, cap) =>
      val groups = Pure.buildPartitionGroups(sizes, cap)
      groups.flatten == sizes.sorted
    }

  property("binpack closes groups only after exceeding the cap") =
    forAll(sizesGen, capGen) { (sizes, cap) =>
      val groups = Pure.buildPartitionGroups(sizes, cap)
      groups.nonEmpty ==> groups.dropRight(1).forall(_.sum > cap)
    }

  property("binpack groups are never empty") =
    forAll(sizesGen, capGen) { (sizes, cap) =>
      Pure.buildPartitionGroups(sizes, cap).forall(_.nonEmpty)
    }

  property("packStats agrees with the materializing packer") =
    forAll(sizesGen, capGen) { (sizes, cap) =>
      val cfg = EngineConfig.default.copy(maxGroupBytes = cap)
      val groups = Pure.buildPartitionGroups(sizes, cap)
      val (n, cost) = Pure.packStats(sizes.sorted.iterator, cfg)
      n == groups.length &&
        cost == groups.map(g => Pure.readFileCost(g.sum, cfg.fetchSize)).sum
    }

  // ---- morton code ----
  private val coordGen = Gen.chooseNum(0L, (1L << 16) - 1)

  property("morton round-trips both coordinates") =
    forAll(coordGen, coordGen) { (x, y) =>
      val z = MortonCode.interleave(x, y, 16)
      def extract(odd: Int): Long =
        (0 until 16).map(i => ((z >>> (2 * i + odd)) & 1L) << i).sum
      extract(0) == x && extract(1) == y
    }

  property("morton is monotone per coordinate") =
    forAll(coordGen, coordGen, coordGen) { (x, y, x2) =>
      val (lo, hi) = (math.min(x, x2), math.max(x, x2))
      MortonCode.interleave(lo, y, 16) <= MortonCode.interleave(hi, y, 16)
    }

  // ---- top-k aggregator: any partitioning merges to the true top-k ----
  private val rowsGen = Gen.listOf(Gen.zip(Gen.chooseNum(-1e6, 1e6), Gen.chooseNum(0L, 1000L)))

  property("topk(merge over arbitrary splits) == global sorted take k") =
    forAll(rowsGen, Gen.chooseNum(1, 5), Gen.chooseNum(1, 7)) { (rows, k, nSplits) =>
      val agg = new TopKAggregator.TopK(k)
      val ins = rows.map { case (v, t) => TopKAggregator.In(v, t) }
      val parts = ins.zipWithIndex.groupBy(_._2 % nSplits).values
        .map(_.map(_._1).foldLeft(agg.zero)(agg.reduce))
      val merged = agg.finish(parts.foldLeft(agg.zero)(agg.merge))
      val expected = ins.sortBy(i => (-i.value, i.tiebreak)).take(k)
      merged == expected
    }

  // ---- text-signature kernel vs a direct reimplementation ----
  private val tokGen = Gen.chooseNum(97, 122).map(_.toChar.toString)
  private val toksGen = Gen.listOf(tokGen)

  private def md5_28(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(4).map(b => f"$b%02x").mkString.take(7), 16)
  }

  property("minhash kernel == brute-force shingle mins") =
    forAll(toksGen) { toks =>
      val a = Array(1000003L, 1999993L); val b = Array(12345L, 54321L); val p = 2147483647L
      val arr = new GenericArrayData(toks.map(UTF8String.fromString).toArray[Any])
      val got = TextHashKernels.minhashSig(arr, 3, a, b, p)
      if (toks.length < 3) got == null
      else {
        val hs = toks.sliding(3).map(_.mkString(" ")).map(md5_28).toSeq
        val expected = a.indices.map(j => hs.map(h => (h * a(j) + b(j)) % p).min)
        got.toLongArray().toSeq == expected
      }
    }

  property("shingle-hash kernel == brute-force distinct shingle hashes") =
    forAll(toksGen) { toks =>
      val arr = new GenericArrayData(toks.map(UTF8String.fromString).toArray[Any])
      val got = TextHashKernels.shingleHashes(arr, 3)
      val expected =
        if (toks.length < 3) Seq.empty
        else toks.sliding(3).map(_.mkString(" ")).toSeq.distinct.map(md5_28).sorted
      got.toLongArray().toSeq == expected
    }

  property("winnow kernel == brute-force sliding minima (distinct)") =
    forAll(toksGen) { toks =>
      val arr = new GenericArrayData(toks.map(UTF8String.fromString).toArray[Any])
      val got = TextHashKernels.winnow(arr, 3, 4)
      val hs = if (toks.length < 3) Seq.empty else toks.sliding(3).map(_.mkString(" ")).map(md5_28).toSeq
      val expected =
        if (hs.length < 4) Seq.empty
        else hs.sliding(4).map(_.min).toSeq.distinct.sorted
      got.toLongArray().toSeq.sorted == expected
    }

  // ---- hash28 / content-defined chunking ----
  private val textGen = Gen.listOf(Gen.alphaNumChar).map(_.mkString)

  property("hash28 kernel == relational conv(substring(md5)) idiom") =
    forAll(textGen) { s =>
      TextHashKernels.hash28(UTF8String.fromString(s)) == md5_28(s)
    }

  private def chunksOf(s: String): Seq[String] = {
    val a = TextHashKernels.cdcChunks(UTF8String.fromString(s), 8, 16)
    (0 until a.numElements()).map(i => a.getUTF8String(i).toString)
  }

  property("cdc chunks reassemble the input exactly") =
    forAll(textGen) { s => chunksOf(s).mkString == s }

  property("cdc chunks match the positional cut definition") =
    forAll(textGen) { s =>
      val cuts = 1 +: (2 to s.length - 7)
        .filter(i => md5_28(s.substring(i - 1, i + 7)) % 16 == 0)
      val expected = cuts.zip(cuts.drop(1) :+ (s.length + 1))
        .map { case (a, b) => s.substring(a - 1, b - 1) }
      chunksOf(s) == expected
    }

  property("cdc LOCALITY: every chunk after the first cut survives a prepended edit") =
    forAll(textGen.suchThat(_.length >= 16), Gen.alphaNumChar) { (s, c) =>
      // Cut windows never span the prepended char (they start at position
      // 2), so every cut of s reappears in c+s shifted by one — the edited
      // text's chunk list ENDS with all of s's chunks except its leading
      // prefix chunk. This is the property that makes content-defined
      // chunking a dedup signal under insertions, which fixed-offset
      // windows lack.
      val orig = chunksOf(s)
      val edited = chunksOf(c.toString + s)
      orig.length <= 1 || edited.takeRight(orig.length - 1) == orig.tail
    }

  // ---- KMV min-k sketch (q90/q164/StreamingKmv state) ----
  private val kGen = Gen.chooseNum(1, 16)
  private val xsGen = Gen.listOf(Gen.chooseNum(0L, 1000L))

  private def buildMinK(k: Int, xs: Seq[Long]): Seq[Long] = {
    val agg = new graft.functions.MinKDistinct.MinK(k)
    agg.finish(xs.foldLeft(agg.zero)(agg.reduce))
  }

  property("minK sketch IS the k smallest distinct values, sorted") =
    forAll(kGen, xsGen) { (k, xs) =>
      buildMinK(k, xs) == xs.distinct.sorted.take(k)
    }

  property("minK merge == build over the concatenation (any split point)") =
    forAll(kGen, xsGen, xsGen) { (k, a, b) =>
      val agg = new graft.functions.MinKDistinct.MinK(k)
      val merged = agg.finish(agg.merge(
        a.foldLeft(agg.zero)(agg.reduce), b.foldLeft(agg.zero)(agg.reduce)))
      merged == buildMinK(k, a ++ b)
    }

  property("minK merge is commutative") =
    forAll(kGen, xsGen, xsGen) { (k, a, b) =>
      val agg = new graft.functions.MinKDistinct.MinK(k)
      val ab = agg.finish(agg.merge(
        a.foldLeft(agg.zero)(agg.reduce), b.foldLeft(agg.zero)(agg.reduce)))
      val ba = agg.finish(agg.merge(
        b.foldLeft(agg.zero)(agg.reduce), a.foldLeft(agg.zero)(agg.reduce)))
      ab == ba
    }
}
