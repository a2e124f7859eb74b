package graft.tools

import graft.Bench
import org.apache.spark.sql.functions._

/** Plan-shape probe for the packed vote exchange (r5): verifies that
  * repartitioning by `shiftrightunsigned(pk, 32)` and then projecting that same
  * expression back out as `src` lets alias-aware output partitioning keep
  * BOTH vote aggregation levels and the apply join exchange-free — i.e.
  * the packed single-long shuffle row (16 B UnsafeRow vs 24 B for
  * (src,label)) costs no extra exchange anywhere downstream.
  *
  * Usage: scripts/run_main.sh graft.tools.PackPlanProbe
  */
object PackPlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = Bench.session(8, "pack-plan-probe")
    import spark.implicits._
    val loop = org.apache.spark.sql.GraftSqlShim.sessionWithConfs(spark,
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.join.preferSortMergeJoin" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")

    val gather = loop.range(1000)
      .select(($"id" % 100).as("src"), ($"id" % 7).as("label"))
    val state = loop.range(100).select($"id", lit(5L).as("label"),
      lit(false).as("seeded")).repartition($"id")

    def applyJoin(votes: org.apache.spark.sql.DataFrame) =
      state.as("s")
        .join(graft.algo.Superstep.shj(votes.as("v")), Seq("id"), "left_outer")
        .select($"id", coalesce($"v.vote", $"s.label").as("label"))

    // current shape: raw (src,label) repartition
    val counted0 = gather.repartition($"src")
      .groupBy($"src", $"label").agg(count(lit(1)).as("cnt"))
    val votes0 = counted0.groupBy($"src")
      .agg(max(shiftleft($"cnt", 32) + (lit((1L << 32) - 1) - $"label")).as("m"))
      .select($"src".as("id"),
        (lit((1L << 32) - 1) - $"m".bitwiseAND(lit((1L << 32) - 1))).as("vote"))
    val plan0 = applyJoin(votes0).queryExecution.executedPlan.toString

    // packed shape: one-long exchange row, same expression repartition
    val packed = gather.select(
      (shiftleft($"src", 32) + $"label").as("pk"))
    val counted1 = packed.repartition(shiftrightunsigned($"pk", 32))
      .select(shiftrightunsigned($"pk", 32).as("src"),
        $"pk".bitwiseAND(lit((1L << 32) - 1)).as("label"))
      .groupBy($"src", $"label").agg(count(lit(1)).as("cnt"))
    val votes1 = counted1.groupBy($"src")
      .agg(max(shiftleft($"cnt", 32) + (lit((1L << 32) - 1) - $"label")).as("m"))
      .select($"src".as("id"),
        (lit((1L << 32) - 1) - $"m".bitwiseAND(lit((1L << 32) - 1))).as("vote"))
    val q1 = applyJoin(votes1)
    val plan1 = q1.queryExecution.executedPlan.toString

    def exchanges(p: String) = p.linesIterator.count(_.contains("Exchange"))
    def sorts(p: String) = p.linesIterator.count(_.trim.startsWith("+- Sort") ||
      p.contains("SortAggregate"))
    println(s"raw    exchanges=${exchanges(plan0)} sortAgg=${plan0.contains("SortAggregate")}")
    println(s"packed exchanges=${exchanges(plan1)} sortAgg=${plan1.contains("SortAggregate")}")
    if (exchanges(plan1) != exchanges(plan0) || args.contains("-v")) {
      println("=== packed plan ===")
      println(plan1)
    }
    // value check: identical results
    val r0 = applyJoin(votes0).orderBy($"id").collect().toSeq
    val r1 = q1.orderBy($"id").collect().toSeq
    println(s"results_equal=${r0 == r1}")
    spark.stop()
  }
}
