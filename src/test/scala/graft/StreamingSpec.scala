package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.EventsStreaming
import graft.streaming.EventsStreaming.Event

/** Structured Streaming operators driven synchronously through
  * MemoryStream + processAllAvailable (the local smoke pattern from the
  * public Spark docs).
  */
class StreamingSpec extends SparkSuite {
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  private val sample = Seq(
    Event(1, ts(5), 1, "click", 1.0),
    Event(2, ts(10), 1, "click", 2.0),
    Event(3, ts(65), 1, "view", 3.0),   // second hour, new session (>30m gap)
    Event(4, ts(70), 2, "click", 4.0))

  test("hourlyWindowAgg: streaming result equals batch result") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    mem.addData(sample: _*)
    val q = EventsStreaming.hourlyWindowAgg(mem.toDF())
      .writeStream.format("memory").queryName("hourly_out")
      .outputMode("update").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("hourly_out")
      .select($"window_start", $"event_type", $"n_events", $"total_value")
      .collect().toSet
    val batch = EventsStreaming.hourlyWindowAggBatch(sample.toDF()).collect().toSet
    assert(streamed == batch)
    assert(batch.size == 3)
  }

  test("sessionWindows: 30-minute gap splits sessions per user") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    mem.addData(sample: _*)
    // advance the watermark past all sessions so Append emits them
    mem.addData(Event(99, ts(600), 9, "click", 0.0))
    val q = EventsStreaming.sessionWindows(mem.toDF())
      .writeStream.format("memory").queryName("sessions_out")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val out = spark.table("sessions_out")
      .filter($"user_id" === 1)
      .orderBy($"session_start").collect()
    assert(out.length == 2, s"user 1 sessions: ${out.mkString(";")}")
    assert(out(0).getAs[Long]("n_events") == 2)
    assert(out(1).getAs[Long]("n_events") == 1)
  }

  test("dedupStream: repeated event_ids within watermark dropped") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    mem.addData(sample: _*)
    mem.addData(sample.take(2): _*) // exact repeats
    val q = EventsStreaming.dedupStream(mem.toDF())
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val ids = spark.table("dedup_out").select($"event_id").as[Long].collect().sorted
    assert(ids.toSeq == Seq(1L, 2L, 3L, 4L))
  }

  test("sessionizeStateful: gap closes and emits; open session persists in state") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventsStreaming.sessionizeStateful(mem.toDS())
      .writeStream.format("memory").queryName("statefulsess_out")
      .outputMode("append").start()
    mem.addData(sample: _*) // user 1: events at 5,10 then 65 → closes (5,10)
    q.processAllAvailable()
    mem.addData(Event(9, ts(180), 1, "click", 1.0)) // 65 → 180 gap closes second
    q.processAllAvailable(); q.stop()
    val out = spark.table("statefulsess_out")
      .filter($"user_id" === 1).orderBy($"session_start").collect()
    assert(out.length == 2)
    assert(out(0).getAs[Long]("n_events") == 2, "first session had events at min 5,10")
    assert(out(1).getAs[Long]("n_events") == 1, "second session = the min-65 event")
  }

  test("streaming star load: micro-batches fold via Star.append; replay no-op") {
    implicit val sqlCtx = spark.sqlContext
    // (ANO_EJE, MES_EJE, SEC_EJEC, EJECUTORA, SECTOR_NOMBRE, MONTO_DEVENGADO)
    val mem = MemoryStream[(String, String, String, String, String, String)]
    val loader = new graft.streaming.MefStreamingLoad
    val q = loader.writer(mem.toDF().toDF(
      "ANO_EJE", "MES_EJE", "SEC_EJEC", "EJECUTORA", "SECTOR_NOMBRE",
      "MONTO_DEVENGADO")).start()

    mem.addData(("2024", "1", "001", "E1", "SALUD", "50"))
    q.processAllAvailable()
    val afterB1 = loader.star.get
    val e1Id = afterB1.dims("dim_ejecutora").collect()
      .find(_.getAs[String]("ejecutora_codigo") == "E1").get.getAs[Int]("ejecutora_id")

    val b2 = Seq(
      ("2024", "2", "001", "E1", "SALUD", "25"),
      ("2024", "2", "002", "E2", "EDU", "30"))
    mem.addData(b2: _*)
    q.processAllAvailable()
    mem.addData(b2: _*) // redelivery: at-least-once replay must be a no-op
    q.processAllAvailable(); q.stop()

    val star = loader.star.get
    assert(star.fact.count() == 3, "3 grains after both batches + replay")
    val ytd = graft.mef.Analytics.ytdDevengadoPorSector(star, 2024, 2)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(ytd == Map("SALUD" -> 75.0, "EDU" -> 30.0))
    val e1After = star.dims("dim_ejecutora").collect()
      .find(_.getAs[String]("ejecutora_codigo") == "E1").get.getAs[Int]("ejecutora_id")
    assert(e1After == e1Id, "surrogate ids survive streaming appends")
    assert(graft.mef.Validate.holds(spark, star),
      "streaming-loaded star satisfies every warehouse constraint")
  }

  test("runningUserTotals: keyed state accumulates across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventsStreaming.runningUserTotals(mem.toDS())
      .writeStream.format("memory").queryName("running_out")
      .outputMode("update").start()
    mem.addData(sample.take(2): _*)
    q.processAllAvailable()
    mem.addData(sample.drop(2): _*)
    q.processAllAvailable(); q.stop()
    val last = spark.table("running_out")
      .groupBy($"user_id").agg(max($"n_events").as("n"), max($"total_value").as("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(last.contains((1L, 3L, 6.0)))
    assert(last.contains((2L, 1L, 4.0)))
  }
}
