package graft.tools

/** Dump SparkEntry.oracleSql to a JSON file without running Spark (oracle
  * SQL iteration aid: regenerate after editing a builder, replay in DuckDB
  * against an existing Verify dump).
  */
object DumpOracleSql {
  def main(args: Array[String]): Unit = {
    val out = if (args.nonEmpty) args(0) else "/tmp/oracle_sql.json"
    val entries = graft.SparkEntry.oracleSql.map { case (k, v) =>
      "\"" + k + "\": " + com.fasterxml.jackson.databind.json.JsonMapper
        .builder().build().writeValueAsString(v)
    }
    val json = entries.mkString("{\n", ",\n", "\n}")
    java.nio.file.Files.write(java.nio.file.Paths.get(out), json.getBytes("UTF-8"))
    println(s"wrote ${entries.size} oracle SQL entries to $out")
  }
}
