package graft.tools
import org.apache.spark.sql.functions._
import graft.text.Dedup
/** Ad-hoc minhash pipeline timing probe (engineering tool). */
object MinhashProbe {
  def t[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime(); val v = f
    println(f"[probe] $name ${(System.nanoTime()-t0)/1e9}%.1fs"); v
  }
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = graft.Bench.session(16, "minhash-probe")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").cache()
    println(s"docs=${docs.count()}")
    val profiles = Dedup.minhashProfiles(docs, 3, 64)
    t("profiles.count")(profiles.count())
    val banded = Dedup.bandBuckets(profiles, 16, 4)
    t("banded.count")(banded.count())
    val nd = Dedup.minhashNearDups(docs, threshold = 0.7)
    if (sys.env.contains("PROBE_EXPLAIN")) nd.explain("formatted")
    println(s"pairs=${t("full")(nd.count())}")
    spark.stop()
  }
}
