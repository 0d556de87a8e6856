package graft.tools

import org.apache.spark.sql.SparkSession

/** Standalone check (fresh JVM => fresh session) that
  * `spark.sql.extensions=graft.GraftExtensions` injects poly_hash without
  * any manual registration. Exits nonzero on failure. */
object ExtensionsCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val v = spark.sql("SELECT poly_hash('ab') AS h").collect()(0).getLong(0)
    val expected = ('a'.toLong * 131 + 'b') % 1000000007L
    println(s"poly_hash('ab') = $v (expected $expected)")
    // the whole injected family must resolve without registerAll
    val fam = spark.sql(
      """SELECT size(minhash_sig(split('a b c d', ' '))),
        |       simhash_sig(split('a b', ' ')),
        |       size(winnow_fingerprints(split('a b c d e f', ' '))),
        |       long_dot(array(2L, 3L), array(4L, 5L)),
        |       double_dot(array(1.0d), array(2.5d)),
        |       nfc_normalize('cafe\u0301') = 'caf\u00e9'""".stripMargin).collect()(0)
    println(s"injected family: mh=${fam.getInt(0)} wf=${fam.getInt(2)} " +
      s"long_dot=${fam.getLong(3)} double_dot=${fam.getDouble(4)}")
    spark.stop()
    if (v != expected || fam.getInt(0) != 8 || fam.getInt(2) != 1 ||
        fam.getLong(3) != 23L || fam.getDouble(4) != 2.5 ||
        !fam.getBoolean(5)) sys.exit(1)
    println("extensions check OK")
  }
}
