package graft.tools

import org.apache.spark.sql.{DataFrame, GraftSqlShim, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Scratch probe: why doesn't ReuseExchange collapse a composed
  * (batched) superstep plan?
  */
object ReuseProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val loopSession = GraftSqlShim.sessionWithConfs(spark,
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.join.preferSortMergeJoin" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    import spark.implicits._

    def selfJoinAgg(base: DataFrame): DataFrame = {
      val agg = base.groupBy($"k").agg(sum($"id").as("s"))
      agg.as("a").join(agg.as("b"), "k").select($"k", $"a.s".as("sa"), $"b.s".as("sb"))
    }

    val mode = sys.env.getOrElse("PROBE_MODE", "A")
    val planned: DataFrame = mode match {
      case "A" => // localCheckpoint base, self-joined agg, loop session
        val base = GraftSqlShim.bind(loopSession,
          spark.range(1000).select($"id", ($"id" % 10).as("k")))
          .localCheckpoint(eager = true)
        GraftSqlShim.bind(loopSession, selfJoinAgg(base))
      case "B" => // cached base (loop session), self-joined agg
        val base = GraftSqlShim.bind(loopSession,
          spark.range(1000).select($"id", ($"id" % 10).as("k")))
          .persist(StorageLevel.MEMORY_AND_DISK)
        base.count()
        GraftSqlShim.bind(loopSession, selfJoinAgg(base))
      case "C" => // plain base, self-joined agg, loop session
        val base = GraftSqlShim.bind(loopSession,
          spark.range(1000).select($"id", ($"id" % 10).as("k")))
        GraftSqlShim.bind(loopSession, selfJoinAgg(base))
      case "D" => // plain base, self-joined agg, parent (AQE) session
        val base = spark.range(1000).select($"id", ($"id" % 10).as("k"))
        selfJoinAgg(base)
      case "E" =>
        val base = GraftSqlShim.bind(loopSession,
          spark.range(1000).select($"id", ($"id" % 10).as("k")))
          .localCheckpoint(eager = true)
        val p1 = GraftSqlShim.bind(loopSession,
          base.groupBy($"k").agg(sum($"id").as("s"))).queryExecution.executedPlan
        val p2 = GraftSqlShim.bind(loopSession,
          base.groupBy($"k").agg(sum($"id").as("s"))).queryExecution.executedPlan
        println("sameResult=" + p1.sameResult(p2))
        println("canon1=" + p1.canonicalized)
        println("canon2=" + p2.canonicalized)
        val l1 = p1.collectLeaves().head
        val l2 = p2.collectLeaves().head
        println("leafSame=" + l1.sameResult(l2))
        println("leafCanonEq=" + (l1.canonicalized == l2.canonicalized))
        println("leafCanon1=" + l1.canonicalized.treeString)
        spark.stop(); return
    }
    planned.explain("formatted")
    spark.stop()
  }
}
