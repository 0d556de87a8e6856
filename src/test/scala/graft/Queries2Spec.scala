package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Queries2

/** Behavioral tests for the round-2 operator families (the oracle gate
  * covers value parity; these pin down SEMANTICS on controlled inputs). */
class Queries2Spec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  private val dir = "/root/testdata/sf0.001"

  test("dedup clusters: twins cluster with their originals, transitively") {
    import spark.implicits._
    val out = Queries2.all("q42_dedup_clusters")(spark, dir)
      .as[(Long, Long, Long)].collect()
    val byDoc = out.map(r => r._1 -> r._2).toMap
    // a twin (id + 100000) that appears must share its original's cluster
    val twinRows = out.filter(_._1 >= 100000)
    assert(twinRows.nonEmpty)
    val together = twinRows.count(r => byDoc.get(r._1 - 100000).contains(r._2))
    assert(together >= twinRows.length * 9 / 10,
      s"only $together/${twinRows.length} twins share their original's cluster")
    // cluster_id is the min member id of the cluster
    out.groupBy(_._2).foreach { case (cid, rows) =>
      assert(rows.map(_._1).min == cid)
      // cluster_size is consistent
      assert(rows.forall(_._3 == rows.length))
    }
  }

  test("connected components: local union-find == distributed min-label on the same graph") {
    import spark.implicits._
    import graft.operators.ClusterOps
    // two chains, one triangle, one isolated pair (edges one orientation)
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (21L, 22L), (20L, 22L), (30L, 31L))
      .toDF("a", "b")
    val local = ClusterOps.connectedComponents(edges, "a", "b", localEdgeThreshold = 1000)
      .as[(Long, Long)].collect().toMap
    val dist = ClusterOps.connectedComponents(edges, "a", "b", localEdgeThreshold = 0)
      .as[(Long, Long)].collect().toMap
    assert(local == dist)
    assert(local == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L, 30L -> 30L, 31L -> 30L))
  }

  test("stratified sample: exactly ceil(n/10) rows per stratum") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val strataSizes = docs.groupBy(col("lang")).count()
      .as[(String, Long)].collect().toMap
    val sampled = Queries2.all("q43_stratified_sample")(spark, dir)
      .groupBy(col("lang")).count().as[(String, Long)].collect().toMap
    strataSizes.foreach { case (lang, n) =>
      assert(sampled.getOrElse(lang, 0L) == (n + 9) / 10,
        s"stratum $lang: ${sampled.get(lang)} of $n")
    }
  }

  test("sliding windows: every event is counted in exactly 2 hop windows") {
    import spark.implicits._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val nEvents = spark.read.parquet(s"$dir/events.parquet").count()
    val windowed = Queries2.all("q44_sliding_windows")(spark, dir)
      .agg(sum(col("n"))).as[Long].head()
    assert(windowed == 2 * nEvents)
  }

  test("funnel: conversion flag respects the 1h window") {
    import spark.implicits._
    val out = Queries2.all("q45_funnel")(spark, dir)
      .as[(Long, Long, Option[Long], Long)].collect()
    assert(out.nonEmpty)
    out.foreach { case (_, signup, purchase, conv) =>
      val expected = purchase.exists(p => p >= signup && p - signup <= 3600000000L)
      assert(conv == (if (expected) 1L else 0L))
    }
  }

  test("token top-k: ranks are dense per lang and counts non-increasing") {
    import spark.implicits._
    val out = Queries2.all("q46_token_topk")(spark, dir)
      .as[(String, String, Long, Long)].collect()
    out.groupBy(_._1).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._4)
      assert(sorted.map(_._4).toSeq == (1L to sorted.length))
      assert(sorted.sliding(2).forall(w => w.length < 2 || w(0)._3 >= w(1)._3))
    }
  }

  test("ivf top-k: neighbors share the probe's cell; dots are exact maxima within it") {
    import spark.implicits._
    val out = Queries2.all("q49_ivf_topk")(spark, dir)
      .as[(Long, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    // per query: ranks dense from 1, dots non-increasing
    out.groupBy(_._1).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._4)
      assert(sorted.map(_._4).toSeq == (1L to sorted.length))
      assert(sorted.sliding(2).forall(w => w.length < 2 || w(0)._3 >= w(1)._3))
    }
  }
}
