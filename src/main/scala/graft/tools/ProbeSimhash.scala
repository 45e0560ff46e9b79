package graft.tools

import org.apache.spark.sql.SparkSession

/** Temporary dev probe: print simhash64 values for a few docs (unsigned). */
object ProbeSimhash {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[4]")
      .appName("probe").config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter("doc_id in (26, 455, 31, 383, 8, 245)")
      .select("doc_id", "text").collect()
    docs.sortBy(_.getLong(0)).foreach { r =>
      val h = graft.text.TextCore.simhash64(r.getString(1), 5)
      println(s"[probe] doc=${r.getLong(0)} simhash=${java.lang.Long.toUnsignedString(h)}")
    }
    spark.stop()
  }
}
