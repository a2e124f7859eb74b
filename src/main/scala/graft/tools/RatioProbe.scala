package graft.tools
import graft.model._
import graft.algo.LabelPropagation
import graft.text.Dedup
object RatioProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Bench.session(8, "ratio-probe")
    import spark.implicits._
    val edges = spark.createDataset(graft.gen.SyntheticGraph.randomEdgesLocal(50, 3, 13L)
      .map { case (s, d) => Edge(s, d) })
    val seeds = spark.createDataset(Seq(Seed(0L, 100L), Seed(25L, 300L)))
    val loose = LabelPropagation.run(edges, seeds, RunConfig(convergenceRatio = Some(1.0)))
    println(s"[ratio=1.0] iters=${loose.iterations} converged=${loose.converged}")
    val strict = LabelPropagation.run(edges, seeds)
    println(s"[default]  iters=${strict.iterations} converged=${strict.converged}")
    // probe: minhash on degenerate corpora — empty table, all-empty text, single doc
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    println(s"[minhash empty-table] pairs=${Dedup.minhashNearDups(empty).count()}")
    val blank = Seq((1L, ""), (2L, "   "), (3L, "one two")).toDF("doc_id", "text")
    println(s"[minhash blank/short] pairs=${Dedup.minhashNearDups(blank, threshold = 0.5).count()}")
    val shortDup = Seq((1L, "ab cd"), (2L, "ab cd"), (3L, "xy")).toDF("doc_id", "text")
    println(s"[minhash short-dups] " + Dedup.minhashNearDups(shortDup, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).mkString(","))
    spark.stop()
  }
}
