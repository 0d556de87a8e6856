package graft.functions

import graft.model.EngineConfig

/** Pure scalar functions of the engine: cost model, compaction bin-packer,
  * and edge formatters. Semantics match the reference exactly (citations in
  * each member); these are driver/executor-side Scala — the distributed
  * pipeline calls them from typed group processing, and equivalent Catalyst
  * expressions are used where the logic is plain arithmetic.
  */
object Pure {

  /** Modeled cost of reading one file: `size // FETCH_SIZE + 2` (2 = open +
    * seek; reference `table_metrics.py:199-210`). Integer floor division on
    * non-negative longs. */
  def readFileCost(sizeBytes: Long, fetchSize: Long = EngineConfig.default.fetchSize): Long =
    java.lang.Math.floorDiv(sizeBytes, fetchSize) + 2

  /** Greedy compaction simulation (reference `table_metrics.py:178-197`).
    *
    * Exact, test-pinned semantics: sort ascending; scan sequentially;
    * BEFORE appending each file, if the running group total already
    * STRICTLY exceeds the cap, close the group and start a new one; then
    * append. Consequences: every closed group's total strictly exceeds the
    * cap (the cap is a low-water closing threshold — groups overshoot it,
    * not a high-water limit); the last group may be any size; a single file
    * larger than the cap still joins the current group first. Empty input
    * yields no groups.
    */
  def buildPartitionGroups(sizes: Seq[Long], maxBytesPerGroup: Long): Vector[Vector[Long]] = {
    val sorted = sizes.sorted
    val result = Vector.newBuilder[Vector[Long]]
    var group = Vector.newBuilder[Long]
    var groupNonEmpty = false
    var currentSize = 0L
    for (s <- sorted) {
      if (currentSize > maxBytesPerGroup) {
        result += group.result()
        group = Vector.newBuilder[Long]
        groupNonEmpty = false
        currentSize = 0L
      }
      group += s
      groupNonEmpty = true
      currentSize += s
    }
    if (groupNonEmpty) result += group.result()
    result.result()
  }

  /** Streaming form of [[buildPartitionGroups]] that materializes only the
    * running sum — O(1) memory beyond the (required) sorted input. Returns
    * (groupCount, sum over groups of readFileCost(groupTotal)). This is what
    * the distributed pipeline uses per partition (A10 in SURVEY §2.4). */
  def packStats(sortedSizes: Iterator[Long], cfg: EngineConfig): (Long, Long) = {
    var groupCount = 0L
    var costSum = 0L
    var currentSize = 0L
    var nonEmpty = false
    while (sortedSizes.hasNext) {
      val s = sortedSizes.next()
      if (currentSize > cfg.maxGroupBytes) {
        groupCount += 1
        costSum += readFileCost(currentSize, cfg.fetchSize)
        currentSize = 0L
        nonEmpty = false
      }
      currentSize += s
      nonEmpty = true
    }
    if (nonEmpty) {
      groupCount += 1
      costSum += readFileCost(currentSize, cfg.fetchSize)
    }
    (groupCount, costSum * cfg.msPerScan)
  }

  private def round2(d: Double): java.math.BigDecimal =
    new java.math.BigDecimal(d).setScale(2, java.math.RoundingMode.HALF_EVEN)

  /** Python-compatible `f"{x:.2f}"` (round-half-even, always 2 decimals). */
  private def fmt2(d: Double): String = round2(d).toPlainString

  /** `"Xh Ym Zs"` / `"Ym Zs"` / `"N.NNs"` with trailing-zero stripping and a
    * `"<0.01s"` floor (reference `table_metric.py:134-150`). Goldens:
    * 5500 -> "5.5s", 9 -> "<0.01s", 3600000 -> "1h 0m 0s", 125000 -> "2m 5s". */
  def formatDuration(milliseconds: Double): String = {
    val totalSeconds = milliseconds / 1000.0
    val hours = math.floor(totalSeconds / 3600).toLong
    val minutes = math.floor((totalSeconds % 3600) / 60).toLong
    val seconds = totalSeconds % 60
    if (hours > 0) s"${hours}h ${minutes}m ${seconds.toLong}s"
    else if (minutes > 0) s"${minutes}m ${seconds.toLong}s"
    else if (seconds > 0 && seconds < 0.01) "<0.01s"
    else {
      val s = fmt2(seconds)
      val stripped =
        if (s.contains('.')) s.reverse.dropWhile(_ == '0').dropWhile(_ == '.').reverse else s
      stripped + "s"
    }
  }

  /** Bytes -> `"N.NN {B,KB,MB,GB,TB,PB}"`, /1024 steps, 2dp always
    * (reference `table_metric.py:164-176`). Goldens: 1234 -> "1.21 KB",
    * 1099511627776 -> "1.00 TB". */
  def formatSize(bytes: Double): String = {
    val units = Array("B", "KB", "MB", "GB", "TB", "PB")
    var size = bytes
    var i = 0
    while (size >= 1024 && i < units.length - 1) { size /= 1024; i += 1 }
    s"${fmt2(size)} ${units(i)}"
  }

  /** Improvement fraction: `(1 - after/before) * 100`, with the reference's
    * edge lattice (`table_metric.py:67-70`): 0/0 -> 0; before=0, after>0 ->
    * +Infinity. Returns None when `after` is absent. */
  def improvement(before: Double, after: Option[Double]): Option[Double] = after.map { a =>
    if (before == 0 && a == 0) 0.0
    else if (before == 0) Double.PositiveInfinity
    else (1 - a / before) * 100
  }

  /** Rendered improvement cell (reference `table_metric.py:62-65,128-131`):
    * duration metrics have a 10 ms noise floor (both before AND after < 10 ms
    * -> "0.00%", checked before the visibility flag); hidden or absent ->
    * "". Python renders inf as "inf%". */
  def formatImprovement(
      before: Double,
      after: Option[Double],
      displayImprovement: Boolean,
      isDuration: Boolean): String = {
    if (isDuration && after.isDefined && before < 10 && after.get < 10) "0.00%"
    else if (!displayImprovement) ""
    else improvement(before, after) match {
      case None => ""
      case Some(p) if p.isPosInfinity => "inf%"
      case Some(p) if p.isNegInfinity => "-inf%"
      case Some(p) => fmt2(p) + "%"
    }
  }

  /** Shell-style glob (`*`, `?`, `[seq]`, `[!seq]`) -> anchored Java regex —
    * the reference's table-name filter is `fnmatch` (`manager.py:84-87`).
    * Case-sensitive. */
  def globToRegex(glob: String): String = {
    val sb = new StringBuilder("^")
    var i = 0
    while (i < glob.length) {
      glob.charAt(i) match {
        case '*' => sb.append(".*")
        case '?' => sb.append('.')
        case '[' =>
          // fnmatch rules: ']' as the FIRST class member (after optional
          // '!') is a literal — the closing bracket search must skip it,
          // else '[]a]' / '[!]x]' emit an invalid empty regex class
          val negated = i + 1 < glob.length && glob.charAt(i + 1) == '!'
          val clsStart = i + 1 + (if (negated) 1 else 0)
          val searchFrom = if (clsStart < glob.length && glob.charAt(clsStart) == ']') clsStart + 1 else clsStart
          val j = glob.indexOf(']', searchFrom)
          if (j < 0) { sb.append("\\["); }
          else {
            // escape regex-class metacharacters: '\', '[', ']', '&' (Java
            // class intersection), and a leading '^' in a NON-negated class
            // (fnmatch treats it as a literal)
            var cls = glob.substring(clsStart, j)
              .replace("\\", "\\\\").replace("[", "\\[").replace("]", "\\]")
              .replace("&", "\\&")
            if (!negated && cls.startsWith("^")) cls = "\\" + cls
            sb.append('[')
            if (negated) sb.append('^')
            sb.append(cls).append(']')
            i = j
          }
        case c if "\\.^$+{}()|".indexOf(c.toInt) >= 0 => sb.append('\\').append(c)
        case c => sb.append(c)
      }
      i += 1
    }
    sb.append('$').toString
  }

  def globMatch(glob: String, s: String): Boolean = s.matches(globToRegex(glob))
}
