package graft.tools
import org.apache.spark.sql.SparkSession
object ExtDemo {
  def main(args: Array[String]): Unit = {
    // fresh JVM => the static-conf path applies, like spark-submit
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.sql("SELECT cosine_similarity(array(CAST(3.0 AS FLOAT),CAST(4.0 AS FLOAT)), array(CAST(4.0 AS FLOAT),CAST(3.0 AS FLOAT))) c, simhash64(array(CAST(5 AS BIGINT))) s, size(minhash_signature(array(CAST(5 AS BIGINT)), 8)) k").show()
    spark.stop()
  }
}
