package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Public text-analysis / dedup API — the Column- and DataFrame-level
  * operators behind the q14/q21-q27 query surface, usable directly by
  * library consumers.
  *
  * All hashing is engine-portable (md5-prefix 28-bit integers, overflow-free
  * permutations) so results can be cross-checked against any SQL engine —
  * see TextQueries for the DuckDB oracles.
  */
object TextOps {

  /** Whitespace token count via occurrence arithmetic (portable across
    * engines, unlike regex splits). `translate` removes every space in
    * one codegen'd charmap pass — no regex engine in the hot path. */
  def tokenCount(text: Column): Column =
    (length(text) - length(translate(text, " ", "")) + lit(1)).cast("long")

  /** Occurrences of the LITERAL `needle` in `hay` (non-overlapping replace
    * semantics). Plain `replace` (StringReplace) — literal scan, no regex
    * compile/match; metacharacters ("$5.00", "(") count literally. */
  def occurrences(hay: Column, needle: String): Column =
    ((length(hay) - length(call_function("replace", hay, lit(needle),
      lit("")))) / needle.length).cast("long")

  /** 28-bit portable hash of a string: first 7 hex digits of md5. Safe for
    * `(a*h+b) % p` permutations with a < 2^31 under ANSI arithmetic. */
  def portableHash28(s: Column): Column =
    conv(substring(md5(s), 1, 7), 16, 10).cast("long")

  /** Distinct word n-gram shingles from an ALREADY-SPLIT token array column.
    * Prefer this over [[shingles]] in pipelines: referencing a materialized
    * array attribute keeps the split out of the per-element lambda (an
    * inlined `split` is re-evaluated per element — a measured 5x slowdown
    * on the minhash path). */
  def shinglesFromTokens(toks: Column, n: Int = 3): Column =
    when(size(toks) >= n,
      array_distinct(transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + j + 1)): _*))))
      .otherwise(array().cast("array<string>"))

  /** Distinct word n-gram shingles of a text column (empty array when the
    * text has fewer than n tokens). Shingles — not raw tokens — are the
    * right minhash domain on low-entropy vocabularies. */
  def shingles(text: Column, n: Int = 3): Column =
    shinglesFromTokens(split(text, " "), n)

  /** ORDERED (positional, non-distinct) n-gram shingle sequence — the input
    * to sliding-window fingerprinting (winnowing), where position matters. */
  def shingleSequence(toks: Column, n: Int = 3): Column =
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + j + 1)): _*)))
      .otherwise(array().cast("array<string>"))

  /** MinHash signatures over n-gram shingles: one row per id with columns
    * mh0..mh{k-1}. `perms` are (a, b) pairs for `(a*h+b) % p`.
    *
    * A signature is a PER-ROW computation, so this is a pure projection via
    * the native [[graft.functions.MinHashSig]] expression — no explode, no
    * shuffle. The former relational shape (explode shingles → hash →
    * groupBy id) shuffled ~100× the corpus row count only to re-assemble
    * rows that started co-located; at 100 TB that shuffle IS the job.
    * Results are identical: a min is insensitive to duplicate shingles and
    * to evaluation order. Docs with < shingleN tokens are absent (parity
    * with the explode shape, where they produce no rows). */
  def minhashSignatures(
      df: DataFrame, idCol: String, textCol: String,
      perms: Seq[(Long, Long)], p: Long = 2147483647L, shingleN: Int = 3): DataFrame = {
    val sig = graft.functions.TextHashExprs.minhashSig(
      split(col(textCol), " "), perms, p, shingleN)
    df.select(col(idCol), sig.as("__sig"))
      .filter(col("__sig").isNotNull)
      .select(col(idCol) +: perms.indices.map(j => element_at(col("__sig"), j + 1).as(s"mh$j")): _*)
  }

  /** THE band-key recipe, shared by the batch pair join and the streaming
    * near-dup detector ([[graft.streaming.StreamingNearDup]]) so their
    * flagged-set parity can't drift: band index folded into the key with
    * `rowsPerBand` consecutive signature values, '_'-joined. `sig` is the
    * signature as an ARRAY column (1-indexed element_at). */
  def bandKeyColumns(sig: Column, nPerms: Int, rowsPerBand: Int): Seq[Column] = {
    require(nPerms % rowsPerBand == 0, "nPerms must be divisible by rowsPerBand")
    (0 until nPerms / rowsPerBand).map { bIdx =>
      val keyCols = lit(s"$bIdx") +:
        (bIdx * rowsPerBand until (bIdx + 1) * rowsPerBand).map(j => element_at(sig, j + 1))
      concat_ws("_", keyCols: _*)
    }
  }

  /** LSH candidate pairs from minhash signatures: same band key (rowsPerBand
    * consecutive minhashes concatenated) => candidate. Returns (id_a, id_b)
    * with id_a < id_b, distinct. Equi-join on the band key — never a cross
    * join — which is what makes this the scale path for near-dup detection. */
  def lshCandidatePairs(sigs: DataFrame, idCol: String, nPerms: Int, rowsPerBand: Int): DataFrame = {
    // band index folded into the key and ALL bands emitted by one explode:
    // the signature subtree is scanned once (not once per band), and the
    // self-join's two sides are canonically identical, so the band-key
    // exchange is computed once and reused
    val sigArr = array((0 until nPerms).map(j => col(s"mh$j")): _*)
    val bandKeys = bandKeyColumns(sigArr, nPerms, rowsPerBand)
    val bands = sigs.select(col(idCol), explode(array(bandKeys: _*)).as("bkey"))
    val a = bands.select(col("bkey"), col(idCol).as("id_a"))
    val b = bands.select(col("bkey"), col(idCol).as("id_b"))
    a.join(b, Seq("bkey")).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
  }

  /** Frequency-weighted SimHash over whitespace tokens (bits <= 31).
    * Per-row like minhash: one native-expression projection
    * ([[graft.functions.SimHashSig]]), no explode/shuffle. */
  def simhash(df: DataFrame, idCol: String, textCol: String, bits: Int = 16): DataFrame =
    df.select(col(idCol),
      graft.functions.TextHashExprs.simhash(split(col(textCol), lit(" ")), bits).as("simhash"))

  /** Hamming distance between two simhash values (near-dup test on
    * signatures: distance <= k). */
  def hammingDistance(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Stopword-hit language heuristic (see q25); returns hit count. */
  def englishStopwordHits(text: Column): Column = {
    val p = concat(lit(" "), text, lit(" "))
    (occurrences(p, " the ") + occurrences(p, " a ")).cast("long")
  }
}
