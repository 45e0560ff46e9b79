package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming HLL == batch sketch after every micro-batch prefix. */
class SketchStreamsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("distinctHllStream == batch distinctHll per micro-batch prefix") {
    val rnd = new scala.util.Random(19)
    val a = (0 until 1200).map(_ => (s"g${rnd.nextInt(3)}", s"v${rnd.nextInt(600)}"))
    val b = (0 until 1200).map(_ => (s"g${rnd.nextInt(3)}", s"w${rnd.nextInt(600)}"))
    def batchSketch(rows: Seq[(String, String)]): Map[String, (Long, Long)] =
      graft.pipeline.Sketches.distinctHll(rows.toDF("g", "v"), "g", "v")
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

    val streamDir = java.nio.file.Files.createTempDirectory("graft-hll-stream")
    def writeOne(rows: Seq[(String, String)], name: String, ageMs: Long): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("graft-hll-part").toFile
      rows.toDF("g", "v").coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = tmp.listFiles().find(_.getName.endsWith(".parquet")).get
      val dest = new java.io.File(streamDir.toFile, name)
      java.nio.file.Files.copy(part.toPath, dest.toPath)
      assert(dest.setLastModified(System.currentTimeMillis() - ageMs))
    }
    writeOne(a, "a.parquet", 120000L)
    writeOne(b, "b.parquet", 1000L)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("g", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.StringType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(streamDir.toString)
      .as[SketchStreams.GV]
    val q = SketchStreams.distinctHllStream(stream)
      .writeStream.outputMode("update").format("memory")
      .queryName("hll_out").start()
    try {
      q.processAllAvailable()
      val rows = spark.table("hll_out").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      // final estimate per group (max update_seq) == batch sketch of a ++ b
      val fin = rows.groupBy(_._1).map { case (g, rs) =>
        val last = rs.maxBy(_._2); g -> (last._3, last._4)
      }
      assert(fin == batchSketch(a ++ b))
      // first-batch emission == batch sketch of file a alone (files arrive
      // in mtime order under maxFilesPerTrigger=1) — the exact-prefix
      // property register-max mergeability promises
      val first = rows.filter(_._2 == 1L).map(r => r._1 -> (r._3, r._4)).toMap
      assert(first == batchSketch(a))
      // and the stream genuinely saw two batches for every group
      assert(rows.count(_._2 == 2L) == 3)
    } finally q.stop()
  }

  test("weightedSampleStream == batch weightedSample per micro-batch prefix") {
    val rnd = new scala.util.Random(31)
    val a = (0L until 600L).map(i => (s"g${i % 3}", i, (rnd.nextInt(9)).toLong)) // some w=0 → dropped
    val b = (600L until 1200L).map(i => (s"g${i % 3}", i, (rnd.nextInt(9)).toLong))
    // ordered batch reference: the Sampling.weightedSample total order,
    // replicated with the same 60-bit md5 prefix arithmetic
    def orderedBatch(rows: Seq[(String, Long, Long)], k: Int): Map[String, Seq[Long]] =
      rows.filter(_._3 >= 1).groupBy(_._1).map { case (g, rs) =>
        g -> rs.map { case (_, id, w) =>
          val hex = java.security.MessageDigest.getInstance("MD5")
            .digest(id.toString.getBytes("UTF-8"))
            .take(8).map(x => f"${x & 0xff}%02x").mkString
          val h = java.lang.Long.parseLong(hex.take(15), 16)
          (h / w, h, id)
        }.sorted.take(k).map(_._3)
      }
    // the replica really is the batch operator's selection (set equality;
    // the operator emits unranked rows)
    val viaOp = graft.pipeline.Sampling.weightedSample(
        (a ++ b).toDF("g", "id", "w"), Seq("g"), "id", "w", 10)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(viaOp == orderedBatch(a ++ b, 10).values.flatten.toSet)

    val streamDir = java.nio.file.Files.createTempDirectory("graft-ws-stream")
    def writeOne(rows: Seq[(String, Long, Long)], name: String, ageMs: Long): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("graft-ws-part").toFile
      rows.toDF("g", "id", "w").coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = tmp.listFiles().find(_.getName.endsWith(".parquet")).get
      val dest = new java.io.File(streamDir.toFile, name)
      java.nio.file.Files.copy(part.toPath, dest.toPath)
      assert(dest.setLastModified(System.currentTimeMillis() - ageMs))
    }
    writeOne(a, "a.parquet", 120000L)
    writeOne(b, "b.parquet", 1000L)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("g", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("w", org.apache.spark.sql.types.LongType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(streamDir.toString)
      .as[SketchStreams.GIW]
    val q = SketchStreams.weightedSampleStream(stream, k = 10)
      .writeStream.outputMode("update").format("memory")
      .queryName("ws_out").start()
    try {
      q.processAllAvailable()
      val rows = spark.table("ws_out").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getSeq[Long](2).toList))
      val fin = rows.groupBy(_._1).map { case (g, rs) => g -> rs.maxBy(_._2)._3 }
      assert(fin == orderedBatch(a ++ b, 10))           // final == full prefix
      val first = rows.filter(_._2 == 1L).map(r => r._1 -> r._3).toMap
      assert(first == orderedBatch(a, 10))              // first batch == its prefix
      assert(rows.count(_._2 == 2L) == 3)               // both batches touched all groups
    } finally q.stop()
  }

  test("weightedSampleStream folds redelivered ids: weight change never doubles a slot") {
    // batch a: ids 0..9 at w=1; batch b REDELIVERS ids 0..4 at w=1000
    // (much better priority). The r9 advisor finding: full-triple dedup
    // let the redelivered id hold TWO of the k slots. Contract now: state
    // folds by id keeping the min-priority triple, so every sample has
    // distinct ids and a redelivered id ranks by its best weight ever.
    val a = (0L until 10L).map(i => ("g", i, 1L))
    val b = (0L until 5L).map(i => ("g", i, 1000L))
    def pri(id: Long, w: Long): (Long, Long, Long) = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .take(8).map(x => f"${x & 0xff}%02x").mkString
      val h = java.lang.Long.parseLong(hex.take(15), 16)
      (h / w, h, id)
    }
    // fold-by-id expectation over the full prefix: min triple per id
    val expected = (a ++ b).groupBy(_._2).map { case (_, rs) =>
      rs.map { case (_, id, w) => pri(id, w) }.min
    }.toSeq.sorted.take(4).map(_._3)

    val streamDir = java.nio.file.Files.createTempDirectory("graft-wsr-stream")
    def writeOne(rows: Seq[(String, Long, Long)], name: String, ageMs: Long): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("graft-wsr-part").toFile
      rows.toDF("g", "id", "w").coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = tmp.listFiles().find(_.getName.endsWith(".parquet")).get
      val dest = new java.io.File(streamDir.toFile, name)
      java.nio.file.Files.copy(part.toPath, dest.toPath)
      assert(dest.setLastModified(System.currentTimeMillis() - ageMs))
    }
    writeOne(a, "a.parquet", 120000L)
    writeOne(b, "b.parquet", 1000L)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("g", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("w", org.apache.spark.sql.types.LongType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(streamDir.toString)
      .as[SketchStreams.GIW]
    val q = SketchStreams.weightedSampleStream(stream, k = 4)
      .writeStream.outputMode("update").format("memory")
      .queryName("wsr_out").start()
    try {
      q.processAllAvailable()
      val fin = spark.table("wsr_out").collect()
        .map(r => (r.getLong(1), r.getSeq[Long](2).toList)).maxBy(_._1)._2
      assert(fin.distinct == fin, s"sample has a doubled id: $fin")
      assert(fin == expected)
    } finally q.stop()
  }

  test("quantileSketchStream == batch quantileSketch per micro-batch prefix") {
    val rnd = new scala.util.Random(23)
    val a = (0 until 1200).map(i => (s"g${i % 3}", i.toLong, rnd.nextInt(100000).toLong))
    val b = (1200 until 2400).map(i => (s"g${i % 3}", i.toLong, rnd.nextInt(100000).toLong))
    val qs = Seq(100, 500, 900)
    def batchSketch(rows: Seq[(String, Long, Long)]): Map[String, (Long, Seq[Long])] =
      graft.pipeline.Sketches.quantileSketch(rows.toDF("g", "id", "v"),
          "g", "id", "v", k = 48, qsPermille = qs)
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), Seq(r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val streamDir = java.nio.file.Files.createTempDirectory("graft-qsk-stream")
    def writeOne(rows: Seq[(String, Long, Long)], name: String, ageMs: Long): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("graft-qsk-part").toFile
      rows.toDF("g", "id", "v").coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = tmp.listFiles().find(_.getName.endsWith(".parquet")).get
      val dest = new java.io.File(streamDir.toFile, name)
      java.nio.file.Files.copy(part.toPath, dest.toPath)
      assert(dest.setLastModified(System.currentTimeMillis() - ageMs))
    }
    writeOne(a, "a.parquet", 120000L)
    writeOne(b, "b.parquet", 1000L)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("g", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.LongType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(streamDir.toString)
      .as[SketchStreams.GIV]
    val q = SketchStreams.quantileSketchStream(stream, k = 48, qsPermille = qs)
      .writeStream.outputMode("update").format("memory")
      .queryName("qsk_out").start()
    try {
      q.processAllAvailable()
      val rows = spark.table("qsk_out").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getSeq[Long](3).toList))
      val fin = rows.groupBy(_._1).map { case (g, rs) =>
        val last = rs.maxBy(_._2); g -> (last._3, last._4: Seq[Long])
      }
      assert(fin == batchSketch(a ++ b))
      val first = rows.filter(_._2 == 1L)
        .map(r => r._1 -> (r._3, r._4: Seq[Long])).toMap
      assert(first == batchSketch(a))
    } finally q.stop()
  }
}
