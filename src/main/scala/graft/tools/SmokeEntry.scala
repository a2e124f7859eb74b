package graft.tools

/** Driver-contract smoke: entry() must return >0 rows on sf0.001. */
object SmokeEntry {
  def main(args: Array[String]): Unit = {
    val spark = graft.Bench.session(8, "smoke-entry")
    val n = graft.SparkEntry.entry(spark).count()
    println(s"ENTRY_ROWS=$n")
    require(n > 0, "entry returned no rows")
    spark.stop()
  }
}
