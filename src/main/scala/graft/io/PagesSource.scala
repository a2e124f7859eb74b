package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Format-pluggable pages-table loader.
  *
  * Production target is an Iceberg catalog table
  * (`spark.read.format("iceberg").load(tbl)` — partition pruning, snapshot
  * isolation, hidden partitioning on e.g. days(warc_ts)); this sandbox ships
  * no Iceberg runtime jar, so the same schema is read from Parquet. The
  * format is a config value, not a code path (SURVEY.md §1.4).
  */
object PagesSource {

  val schema: StructType = StructType(Seq(
    StructField("url", StringType, nullable = false),
    StructField("warc_ts", TimestampType, nullable = true),
    StructField("html", BinaryType, nullable = true),
    StructField("text", StringType, nullable = true),
    StructField("lang", StringType, nullable = true)))

  /** Load pages from `path` with the given source format (default parquet).
    * Column pruning and predicate pushdown reach the scan because the
    * schema is declared, not inferred.
    */
  def load(spark: SparkSession, path: String,
           format: String = "parquet"): DataFrame =
    format match {
      case "parquet" => spark.read.schema(schema).parquet(path)
      case other     => spark.read.format(other).load(path)
    }
}
