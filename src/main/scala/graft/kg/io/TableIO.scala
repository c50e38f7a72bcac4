package graft.kg.io

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Pluggable table I/O (SURVEY §7.0): the north rule targets Iceberg
  * tables, but no Iceberg runtime jar ships in this sandbox (offline
  * coursier), so the engine codes against this trait. Local tests/benches
  * use [[ParquetTableIO]]; a cluster deployment registers
  * [[IcebergTableIO]] (thin mapping to `writeTo`/`readTable` — compiles
  * only with the iceberg-spark-runtime jar on the classpath, so it is
  * expressed here as documentation + format strings, not dead imports).
  */
trait TableIO {
  def read(spark: SparkSession, table: String): DataFrame
  def write(df: DataFrame, table: String, mode: SaveMode = SaveMode.Overwrite): Unit
  def exists(spark: SparkSession, table: String): Boolean
}

/** Parquet-directory tables under a root path. Layout implements the
  * north rule's explicit url-hash partitioning as a `bucket=` directory
  * column when `bucketExpr` is provided — the same spec an Iceberg table
  * would carry as `bucket(N, url)` partition transform metadata. */
final class ParquetTableIO(root: String, buckets: Int = 0, bucketCol: String = "url") extends TableIO {

  private def path(table: String) = s"$root/$table"

  def read(spark: SparkSession, table: String): DataFrame = {
    val df = spark.read.parquet(path(table))
    if (buckets > 0 && df.columns.contains("bucket")) df.drop("bucket") else df
  }

  def write(df: DataFrame, table: String, mode: SaveMode = SaveMode.Overwrite): Unit = {
    if (buckets > 0 && df.columns.contains(bucketCol)) {
      df.withColumn("bucket", pmod(xxhash64(col(bucketCol)), lit(buckets)))
        .write.mode(mode).partitionBy("bucket").parquet(path(table))
    } else {
      df.write.mode(mode).parquet(path(table))
    }
  }

  def exists(spark: SparkSession, table: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path(table), "_SUCCESS")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }
}

/** Spark-native BUCKETED managed tables — the executable local analog
  * of Iceberg's `bucket(N, col)` partition transform: `bucketBy` +
  * `sortBy` through `saveAsTable` records bucketing metadata in the
  * catalog, so a join or aggregation between two tables bucketed on the
  * same key by the same bucket count plans ZERO exchanges (the
  * co-located join the north rule's url-hash layout exists for;
  * BucketedIoSpec asserts the exchange-free plan). Plain
  * `.parquet(path)` writes keep NO such metadata — which is exactly why
  * the pipeline's narrow stages avoid runtime repartitions and leave
  * layout to the table format. */
final class BucketedTableIO(buckets: Int, bucketCol: String) extends TableIO {
  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)
  def write(df: DataFrame, table: String, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode)
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)
  def exists(spark: SparkSession, table: String): Boolean =
    spark.catalog.tableExists(table)
}

/** Iceberg deployment notes (cluster-only; jar absent here):
  *
  * {{{
  * // spark-submit --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<v> \
  * //   --conf spark.sql.catalog.cat=org.apache.iceberg.spark.SparkCatalog \
  * //   --conf spark.sql.catalog.cat.type=hive
  * // CREATE TABLE cat.kg.pages (url string, warc_ts timestamp, html binary,
  * //   text string, lang string) PARTITIONED BY (bucket(1024, url), days(warc_ts))
  * // read:  spark.read.format("iceberg").load("cat.kg.pages")
  * // write: df.writeTo("cat.kg.nodes").createOrReplace()
  * // resume ledger = Iceberg snapshot ids instead of _SUCCESS markers.
  * }}}
  */
object IcebergTableIO {
  val readFormat = "iceberg"
}
