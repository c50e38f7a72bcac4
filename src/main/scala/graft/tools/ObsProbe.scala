package graft.tools

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._

/** Dev probe: do Observation metrics fire on a parquet write action? */
object ObsProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Bench.newSession(4)
    val obs = Observation()
    val df = spark.range(1000).toDF("x").observe(obs, count(lit(1)).as("n"))
    val dir = java.nio.file.Files.createTempDirectory("obsprobe").toString
    df.write.mode("overwrite").parquet(dir)
    println(s"[obsprobe] observed n=${obs.get.get("n")}")
    spark.stop()
  }
}
