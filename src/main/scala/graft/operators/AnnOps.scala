package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`Array[Float]`).
  *
  * Two paths, mirroring what a 100 TB pipeline needs:
  *   - [[bruteForceTopK]]: exact cosine top-k with a BROADCAST probe set —
  *     correct baseline, O(base × probes), no shuffle of the base.
  *   - [[signLshNearDuplicates]]: sign-LSH (random-hyperplane) bucketing +
  *     exact verification — near-dup detection as an EQUI-join, O(n) buckets
  *     instead of O(n²) pairs. Hyperplanes are integers derived from md5 so
  *     bucketing is deterministic and engine-portable (q28's oracle runs the
  *     identical computation in DuckDB).
  */
object AnnOps {

  /** Quantize a float vector to int64 (×scale, floor): all downstream dots/
    * norms become exact integer math. */
  def quantize(vec: Column, scale: Int = 1000): Column =
    transform(vec, v => floor(v.cast("double") * scale).cast("long"))

  /** Integer dot product of two equal-length int64 array columns — the
    * native codegen'd [[graft.functions.LongArrayDot]] (the higher-order
    * aggregate/zip_with formulation is interpreted per element). */
  def dotQ(a: Column, b: Column): Column =
    graft.functions.LongArrayDot.longDot(a, b)

  /** Deterministic hyperplane weights: w(p, d) = md5-28bit("p:d") % 2001 - 1000. */
  def planeWeights(nPlanes: Int, dims: Int): Seq[(Int, Int, Long)] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    for (p <- 0 until nPlanes; d <- 0 until dims) yield {
      val hex = md.digest(s"$p:$d".getBytes("UTF-8"))
        .take(4).map(b => f"$b%02x").mkString.take(7)
      (p, d, java.lang.Long.parseLong(hex, 16) % 2001L - 1000L)
    }
  }

  /** Per-vector sign-LSH band signatures computed INLINE — one projection,
    * zero shuffles: each plane's projection is a native dot against a
    * literal weight array. (An explode + broadcast-plane-join formulation
    * was removed: it shuffled dims×planes rows per vector.) */
  def signaturesInline(
      df: DataFrame, idCol: String, qVecCol: String,
      bands: Int, planesPerBand: Int, dims: Int): DataFrame =
    df.select(col(idCol) +: signatureColumns(qVecCol, bands, planesPerBand, dims): _*)

  /** The sig0..sig{bands-1} Columns themselves — append them to any frame
    * (`df.select(col("*") +: signatureColumns(...): _*)`) with no join. */
  def signatureColumns(qVecCol: String, bands: Int, planesPerBand: Int, dims: Int): Seq[Column] = {
    val nPlanes = bands * planesPerBand
    val w = planeWeights(nPlanes, dims).groupBy(_._1)
      .view.mapValues(_.sortBy(_._2).map(_._3)).toMap
    val bits: Seq[Column] = (0 until nPlanes).map { p =>
      val lits = typedLit(w(p).toArray)
      when(dotQ(col(qVecCol), lits) >= 0, 1L).otherwise(0L)
    }
    (0 until bands).map { b =>
      (0 until planesPerBand)
        .map(j => bits(b * planesPerBand + j) * lit(1L << j))
        .reduce(_ + _).as(s"sig$b")
    }
  }

  // (an explode + broadcast-plane-join formulation of signatures existed
  // here; removed — it shuffled dims x planes rows per vector, and diverged
  // from signatureColumns on empty vectors. One implementation only.)

  /** Exact cosine top-k for a (small, broadcastable) probe set against the
    * full base. Probes join the base without shuffling it; ranking is
    * deterministic (cos desc, id asc). */
  def bruteForceTopK(
      base: DataFrame, idCol: String, vecCol: String,
      probeIds: Column, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = base.select(col(idCol), transform(col(vecCol), _.cast("double")).as("v"))
      .withColumn("nrm", sqrt(graft.functions.DoubleArrayDot.doubleDot(col("v"), col("v"))))
    val probes = e.filter(probeIds)
      .select(col(idCol).as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col(idCol))
    e.join(broadcast(probes), col(idCol) =!= col("query_id"))
      .withColumn("cos", graft.functions.DoubleArrayDot.doubleDot(col("v"), col("qv"))
        / (col("nrm") * col("qn")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col(idCol).as("neighbor_id"), col("cos"), col("rank"))
  }

  /** IVF-style top-k: a coarse quantizer (centroids) partitions the base
    * into inverted lists; each probe searches only its `nprobe` nearest
    * lists. Centroids here are the per-`clusterCol` mean vectors (any
    * k-means output slots in the same way). At scale the base is
    * hash-partitioned by list id, so a query touches nprobe partitions
    * instead of the whole corpus — the standard IVF trade (recall vs
    * fraction of corpus scanned).
    */
  def ivfTopK(
      base: DataFrame, idCol: String, vecCol: String, clusterCol: String,
      probeIds: Column, k: Int, nprobe: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // null/empty vectors are excluded from the index: a list of only empty
    // vectors would have no centroid (posexplode emits nothing) and its
    // members would be silently unreachable even at nprobe = all lists
    val e = base.filter(col(vecCol).isNotNull && size(col(vecCol)) > 0)
      .select(col(idCol), col(clusterCol).as("__list"),
        transform(col(vecCol), _.cast("double")).as("v"))
      .withColumn("nrm", sqrt(graft.functions.DoubleArrayDot.doubleDot(col("v"), col("v"))))
    // centroids: element-wise mean per list (posexplode keeps it relational)
    val centroids = e.select(col("__list"), posexplode(col("v")).as(Seq("d", "x")))
      .groupBy(col("__list"), col("d")).agg(avg(col("x")).as("m"))
      .groupBy(col("__list"))
      .agg(array_sort(collect_list(struct(col("d"), col("m")))).as("dm"))
      .select(col("__list").as("c_list"), expr("transform(dm, s -> s.m)").as("cv"))
    // probe -> nprobe nearest centroids (by cosine against the centroid)
    val probes = e.filter(probeIds)
      .select(col(idCol).as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
    val wc = Window.partitionBy(col("query_id")).orderBy(col("c_cos").desc, col("c_list"))
    val probeLists = probes.crossJoin(broadcast(centroids))
      .withColumn("c_cos", graft.functions.DoubleArrayDot.doubleDot(col("qv"), col("cv"))
        / (col("qn") * sqrt(graft.functions.DoubleArrayDot.doubleDot(col("cv"), col("cv")))))
      .withColumn("c_rank", row_number().over(wc))
      .filter(col("c_rank") <= nprobe)
      .select(col("query_id"), col("qv"), col("qn"), col("c_list").as("__list"))
    // search only the selected inverted lists
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col(idCol))
    e.join(broadcast(probeLists), Seq("__list"))
      .filter(col(idCol) =!= col("query_id"))
      .withColumn("cos", graft.functions.DoubleArrayDot.doubleDot(col("v"), col("qv"))
        / (col("nrm") * col("qn")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col(idCol).as("neighbor_id"), col("cos"), col("rank"))
  }

  /** Sign-LSH near-duplicate pairs with exact verification: candidates from
    * same-band-signature equi-joins, verified by quantized cosine >= minCos.
    * Returns (id_a, id_b, cos_q). */
  def signLshNearDuplicates(
      df: DataFrame, idCol: String, vecCol: String,
      minCos: Double, bands: Int = 2, planesPerBand: Int = 8, dims: Int = 64): DataFrame = {
    val q = df.select(col(idCol), quantize(col(vecCol)).as("qe"))
      .withColumn("nrm", dotQ(col("qe"), col("qe")))
    val vecs = q.select(col("*") +: signatureColumns("qe", bands, planesPerBand, dims): _*)
    // dedup BY CONSTRUCTION: a band-b match counts only when no earlier
    // band matched — pure join predicates, no distinct shuffle
    def side(tag: String) =
      vecs.select(col(idCol).as(s"id_$tag") +: col("qe").as(s"q$tag") +: col("nrm").as(s"n$tag") +:
        (0 until bands).map(i => col(s"sig$i").as(s"sig${i}_$tag")): _*)
    val (a, b) = (side("a"), side("b"))
    val candByBand = (0 until bands).map { bd =>
      val earlierDiffer = (0 until bd)
        .map(i => col(s"sig${i}_a") =!= col(s"sig${i}_b"))
        .foldLeft(lit(true))(_ && _)
      a.join(b, col(s"sig${bd}_a") === col(s"sig${bd}_b") && earlierDiffer
        && col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"), col("qa"), col("qb"), col("na"), col("nb"))
    }
    candByBand.reduce(_ union _)
      .withColumn("dot", dotQ(col("qa"), col("qb")))
      .withColumn("cos_q", col("dot").cast("double")
        / (sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double"))))
      .filter(col("cos_q") >= minCos)
      .select(col("id_a"), col("id_b"), col("cos_q"))
  }
}
