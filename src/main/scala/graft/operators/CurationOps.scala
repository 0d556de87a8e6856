package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Public corpus-curation API — the DataFrame-level operators behind the
  * q221/q222/q226/q234 query surface, usable directly by library
  * consumers. Each returns a DataFrame (or augmented rows) with the same
  * deterministic, partitioning-proof semantics the oracle-gated queries
  * pin: integer arithmetic wherever an unordered sum exists, portable
  * hashing, exact rational scores with one final division.
  */
object CurationOps {

  /** Span-level exact-substring duplicate marking (the Lee et al. 2021
    * shape): fixed `window`-char substrings at `stride` are keyed
    * corpus-wide; every occurrence after the first (in (id, pos) order)
    * is a duplicated span. Any duplicated region >= window+stride chars
    * is guaranteed to contain an aligned window, so cross-document
    * copied REGIONS are caught even between non-duplicate documents.
    * Returns one row per span: (idCol, pos, span, is_dup).
    *
    * Scale: one shuffle on the span text (key on a 128-bit hash of the
    * span at very large corpora — same plan shape, narrower exchange). */
  def spanDuplicates(df: DataFrame, idCol: String, textCol: String,
      window: Int = 50, stride: Int = 25): DataFrame = {
    val spans = df
      .filter(col(textCol).isNotNull && length(col(textCol)) >= window)
      .withColumn("__n", length(col(textCol)))
      .select(col(idCol),
        explode(expr(
          s"transform(sequence(1, cast((__n - $window) div $stride as int) + 1), " +
            s"i -> struct((i - 1) * $stride + 1 AS pos, " +
            s"substring($textCol, (i - 1) * $stride + 1, $window) AS span))"))
          .as("sp"))
      .select(col(idCol), col("sp.pos").as("pos"), col("sp.span").as("span"))
    val w = Window.partitionBy(col("span")).orderBy(col(idCol), col("pos"))
    spans.withColumn("is_dup", row_number().over(w) > 1)
  }

  /** Gopher-style repetition quality fractions, in exact basis points:
    * duplicate-word fraction (1 - distinct/total words, row-local) and
    * top-bigram fraction (the corpus's only shuffle — (id, bigram)
    * counts, map-side combined). Adds `dupw_bp` and `topbg_bp` columns;
    * rows with < 2 words are dropped. */
  def repetitionScores(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val docs = df.filter(col(textCol).isNotNull)
      .withColumn("__toks", split(col(textCol), " "))
      .withColumn("__nw", size(col("__toks")).cast("long"))
      .filter(col("__nw") >= 2)
      .withColumn("__ndw", size(array_distinct(col("__toks"))).cast("long"))
    val top = docs.select(col(idCol),
        explode(expr("transform(sequence(1, cast(__nw as int) - 1), " +
          "i -> concat(element_at(__toks, i), ' ', element_at(__toks, i + 1)))"))
          .as("__bg"))
      .groupBy(col(idCol), col("__bg")).agg(count(lit(1)).as("__c"))
      .groupBy(col(idCol)).agg(max(col("__c")).as("__topbg"))
    docs.join(top, idCol)
      .withColumn("dupw_bp", expr("(10000 * (__nw - __ndw)) div __nw"))
      .withColumn("topbg_bp", expr("(10000 * __topbg) div (__nw - 1)"))
      .drop("__toks", "__nw", "__ndw", "__topbg")
  }

  /** DSIR-flavored importance score against a target slice: hashed
    * unigram buckets (portable md5-prefix hash, `buckets` of them), the
    * exact rational Σ(c_target[b(w)]+1) / Σ(c_raw[b(w)]+1) per row as a
    * `ratio` column — both sums int64, ONE correctly-rounded division,
    * so ranking by it is cross-engine exact. `isTarget` selects the
    * domain to resample TOWARD. Bucket tables broadcast; scoring is
    * map-side. Select the top-k by (ratio, id) with orderBy+limit —
    * never a global row_number. */
  def dsirScores(df: DataFrame, idCol: String, textCol: String,
      isTarget: Column, buckets: Int = 256): DataFrame = {
    val words = df.filter(col(textCol).isNotNull)
      .select(col("*"), explode(split(col(textCol), " ")).as("__w"))
      .withColumn("__b", TextOps.portableHash28(col("__w")) % buckets)
    val ct = words.filter(isTarget)
      .groupBy(col("__b")).agg(count(lit(1)).as("__ct"))
    val cr = words.groupBy(col("__b")).agg(count(lit(1)).as("__cr"))
    words
      .join(broadcast(ct), Seq("__b"), "left")
      .join(broadcast(cr), Seq("__b"), "left")
      .groupBy(col(idCol))
      .agg(sum(coalesce(col("__ct"), lit(0L)) + 1L).as("__num"),
        sum(coalesce(col("__cr"), lit(0L)) + 1L).as("__den"))
      .withColumn("ratio",
        col("__num").cast("double") / col("__den").cast("double"))
      .drop("__num", "__den")
  }

  /** Temperature-balanced group resampling (the mT5 recipe at T=2, so
    * share^(1/T) is an exact sqrt): marks each row `keep` with
    * probability ∝ 1/√(group count), scaled so ~`targetRows` survive.
    * The keep decision is a portable-hash uniform against a
    * deterministically assembled threshold, and the cross-group √-count
    * sum folds over the group-sorted list — grouping order cannot move
    * the result by an ulp. Head groups downsample; tail groups keep
    * more of their mass. */
  def temperatureSample(df: DataFrame, idCol: String, groupCol: String,
      targetRows: Long): DataFrame = {
    val cnts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("__c"))
    val ssum = cnts.agg(expr(
      s"aggregate(sort_array(collect_list(struct($groupCol, __c))), " +
        "CAST(0 AS DOUBLE), (a, x) -> a + sqrt(CAST(x.__c AS DOUBLE)))")
      .as("__ssum"))
    df.join(broadcast(cnts), Seq(groupCol))
      .crossJoin(broadcast(ssum))
      .withColumn("keep",
        TextOps.portableHash28(
          concat(lit("temp:"), col(idCol).cast("string"))).cast("double") <
          lit(targetRows.toDouble) / col("__ssum")
            / sqrt(col("__c").cast("double")) * lit(268435456.0))
      .drop("__c", "__ssum")
  }
}
