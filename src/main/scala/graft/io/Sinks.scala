package graft.io

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.model._

/** Result sinks mirroring the reference's output surface (SURVEY.md §2.1).
  */
object Sinks {

  /** S6 — labels JSON map sink (`ow-lp/src/lib.rs:677-706`): one JSON
    * object `{"labels": {"id": label, ...}}`, emitted only when the vertex
    * count is below `maxNodes` (the reference's n < 10M guard — a dense
    * driver-side map does not scale past that, by design). Keys sorted
    * numerically for byte-determinism.
    */
  def writeLabelsJson(labels: Dataset[VertexLabel], path: String,
                      maxNodes: Long = 10000000L): Boolean = {
    val n = labels.count()
    if (n >= maxNodes) return false
    val entries = labels.orderBy(col("id")).collect()
      .map(v => s""""${v.id}": ${v.label}""")
    val json = entries.mkString("{\"labels\": {", ", ", "}}")
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(
      labels.sparkSession.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    true
  }

  /** S7 — sorted per-vertex text sink `id \t value`
    * (`connected_components_shell.scala:87-92` etc.).
    */
  def writeVertexText(df: DataFrame, idCol: String, valCol: String,
                      path: String): Unit =
    EdgeTsv.writeVertexText(df, idCol, valCol, path)

  /** S8 — machine-parsed benchmark result line
    * (`labelpropagation_graphx_shell.scala:168-170`).
    */
  def benchmarkResultLine(fields: Seq[(String, String)]): String =
    fields.map { case (k, v) => s""""$k":$v""" }
      .mkString("SPARK_BENCHMARK_RESULT_JSON:{", ",", "}")
}
