package graft

import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.operators.LshIndex
import graft.streaming.{MefStreamingLoad, StreamingLshIngest}

/** Crash-recovery through a REAL checkpointLocation restart — the r12
  * verdict gap: every streaming operator specs replay idempotence by
  * manual re-delivery, but none proved recovery through Structured
  * Streaming's own offset log. Here the two stateful-sink faces stop
  * between micro-batches, restart from the same checkpoint dir, and
  * must land bit-identical to an uninterrupted run: the offset log
  * guarantees pending input processes exactly once, and the sinks'
  * keyed idempotence covers the at-least-once edge (a batch replayed
  * from an uncommitted offset).
  */
class StreamingRecoverySpec extends SparkSuite {
  import spark.implicits._

  private def words(seed: Long, n: Int): String =
    (0 until n).map(i => s"w${(seed * 31 + i * i * 7) % 211}").mkString(" ")

  private def corpus = (0L until 40L)
    .map(i => (i, words(i, 60)))
    .toDF("doc_id", "text")

  /** One json-lines file per micro-batch, written atomically (tmp +
    * move) so the file source never reads a half-written file.
    */
  private def writeJsonFile(srcDir: Path, name: String, lines: Seq[String]): Unit = {
    val tmp = Files.createTempFile("stream_src", ".json")
    Files.writeString(tmp, lines.mkString("\n"))
    Files.move(tmp, srcDir.resolve(name))
    ()
  }

  test("StreamingLshIngest restarts from its checkpoint: final index ≡ batch build, exactly once") {
    val base = Files.createTempDirectory("lsh_recovery")
    val srcDir = Files.createDirectory(base.resolve("src"))
    val cp = base.resolve("cp").toString
    val streamedPath = base.resolve("idx").toString
    val schema = StructType(Seq(
      StructField("doc_id", org.apache.spark.sql.types.LongType),
      StructField("text", StringType)))
    def docJson(r: (Long, String)) =
      s"""{"doc_id":${r._1},"text":"${r._2}"}"""
    def stream() = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").json(srcDir.toString)

    // offline build over the first slice; the stream delivers the rest
    LshIndex.build(corpus.filter($"doc_id" < 10), "doc_id", "text", streamedPath)
    val rest = corpus.filter($"doc_id" >= 10).as[(Long, String)].collect()
    val (b1, b2) = rest.splitAt(rest.length / 2)

    writeJsonFile(srcDir, "batch1.json", b1.map(docJson).toIndexedSeq)
    val q1 = StreamingLshIngest.start(
      stream(), "doc_id", "text", streamedPath, Some(cp))
    try q1.processAllAvailable() finally q1.stop() // stop between micro-batches

    // more data lands while the query is DOWN; the restart must pick it
    // up from the checkpoint and must NOT re-ingest batch1
    writeJsonFile(srcDir, "batch2.json", b2.map(docJson).toIndexedSeq)
    val q2 = StreamingLshIngest.start(
      stream(), "doc_id", "text", streamedPath, Some(cp))
    try q2.processAllAvailable() finally q2.stop()

    // a third restart with nothing pending is a no-op
    val n0 = spark.read.parquet(s"$streamedPath/sigs").count()
    val q3 = StreamingLshIngest.start(
      stream(), "doc_id", "text", streamedPath, Some(cp))
    try q3.processAllAvailable() finally q3.stop()
    assert(spark.read.parquet(s"$streamedPath/sigs").count() == n0,
      "restart with no pending input must not change the index")

    // final state ≡ an uninterrupted batch build over all 40 docs
    val batchPath = base.resolve("batch_idx").toString
    LshIndex.build(corpus, "doc_id", "text", batchPath)
    Seq("sigs", "buckets").foreach { d =>
      val a = spark.read.parquet(s"$streamedPath/$d")
      val b = spark.read.parquet(s"$batchPath/$d")
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
        s"$d diverged through the checkpoint restart")
    }
  }

  test("MefStreamingLoad restarts from its checkpoint: star ≡ uninterrupted load sequence") {
    val base = Files.createTempDirectory("mef_recovery")
    val srcDir = Files.createDirectory(base.resolve("src"))
    val cp = base.resolve("cp").toString
    val cols = Seq(
      "ANO_EJE", "MES_EJE", "SEC_EJEC", "EJECUTORA", "SECTOR_NOMBRE",
      "MONTO_DEVENGADO")
    val schema = StructType(cols.map(StructField(_, StringType)))
    def rowJson(vs: Seq[String]) =
      cols.zip(vs).map { case (c, v) => s""""$c":"$v"""" }.mkString("{", ",", "}")
    val batch1 = Seq(
      Seq("2024", "1", "001", "E1", "SALUD", "50"),
      Seq("2024", "1", "002", "E2", "EDU", "30"))
    val batch2 = Seq(
      Seq("2024", "2", "001", "E1", "SALUD", "25"),
      Seq("2024", "2", "003", "E3", "AGRO", "40"))
    def stream() = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").json(srcDir.toString)

    val loader = new MefStreamingLoad
    writeJsonFile(srcDir, "load1.json", batch1.map(rowJson))
    val q1 = loader.writer(stream()).option("checkpointLocation", cp).start()
    try q1.processAllAvailable() finally q1.stop() // down between loads
    val e1Id = loader.star.get.dims("dim_ejecutora").collect()
      .find(_.getAs[String]("ejecutora_codigo") == "E1").get
      .getAs[Int]("ejecutora_id")

    writeJsonFile(srcDir, "load2.json", batch2.map(rowJson))
    val q2 = loader.writer(stream()).option("checkpointLocation", cp).start()
    try q2.processAllAvailable() finally q2.stop()

    // a third restart with nothing pending must load nothing
    val factN = loader.star.get.fact.count()
    val q3 = loader.writer(stream()).option("checkpointLocation", cp).start()
    try q3.processAllAvailable() finally q3.stop()
    assert(loader.star.get.fact.count() == factN)

    // ≡ the uninterrupted twin: same two loads, no restart in between
    val twin = new MefStreamingLoad
    def asRaw(rows: Seq[Seq[String]]) =
      rows.map { case Seq(a, b, c, d, e, f) => (a, b, c, d, e, f) }
        .toDF(cols: _*)
    twin.loadBatch(asRaw(batch1))
    twin.loadBatch(asRaw(batch2))
    val got = loader.star.get
    val want = twin.star.get
    assert(got.fact.exceptAll(want.fact).isEmpty &&
      want.fact.exceptAll(got.fact).isEmpty, "fact diverged through restart")
    want.dims.keys.foreach { d =>
      assert(got.dims(d).exceptAll(want.dims(d)).isEmpty &&
        want.dims(d).exceptAll(got.dims(d)).isEmpty, s"dim $d diverged")
    }
    // surrogate ids survive the restart (the SERIAL contract)
    val e1After = got.dims("dim_ejecutora").collect()
      .find(_.getAs[String]("ejecutora_codigo") == "E1").get
      .getAs[Int]("ejecutora_id")
    assert(e1After == e1Id, "surrogate id changed across the restart")
    assert(graft.mef.Validate.holds(spark, got),
      "recovered star violates a warehouse constraint")
  }
}
