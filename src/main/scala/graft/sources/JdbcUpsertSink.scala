package graft.sources

import java.sql.{Connection, DriverManager}

import org.apache.spark.sql.{DataFrame, Row}

/** S5/S6 — batched idempotent JDBC upsert sink
  * (`etl/cargar_postgres.py:127-152,236-267`): `INSERT ... ON CONFLICT
  * (keys) DO NOTHING` in fixed-size batches with bounded retries, one
  * connection per partition (the executor-side analog of the
  * reference's per-process engine + `execute_values` pages).
  *
  * Plain `foreachPartition` — no planner hook needed (SURVEY.md §7.3).
  * Each task writes its own partition; Spark task retry plus the
  * conflict clause make re-runs idempotent, which is exactly the
  * reference's crash-resume story. Dedup by grain BEFORE calling this
  * (e.g. `Star.build`'s grain consolidation) so first-write-wins
  * never drops real data.
  *
  * NOTE: exercised in tests only at the SQL-generation level — this
  * container ships no database server or JDBC driver. The
  * `foreachPartition` mechanics are identical to
  * [[ParquetSink]]-verified paths.
  */
object JdbcUpsertSink {

  final case class UpsertConfig(
      url: String,
      table: String,
      conflictKeys: Seq[String],
      batchSize: Int = 10000,
      maxRetries: Int = 3,
      retryWaitMs: Long = 3000)

  /** The generated statement, visible for tests:
    * `INSERT INTO t (c1, c2) VALUES (?, ?) ON CONFLICT (k) DO NOTHING`.
    */
  def upsertStatement(table: String, columns: Seq[String], conflictKeys: Seq[String]): String = {
    val cols = columns.mkString(", ")
    val marks = columns.map(_ => "?").mkString(", ")
    val conflict =
      if (conflictKeys.isEmpty) ""
      else s" ON CONFLICT (${conflictKeys.mkString(", ")}) DO NOTHING"
    s"INSERT INTO $table ($cols) VALUES ($marks)$conflict"
  }

  def write(df: DataFrame, cfg: UpsertConfig): Unit = {
    val columns = df.columns.toSeq
    val sql = upsertStatement(cfg.table, columns, cfg.conflictKeys)
    df.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.hasNext) {
        var attempt = 0
        var conn: Connection = null
        try {
          conn = DriverManager.getConnection(cfg.url)
          conn.setAutoCommit(false)
          val stmt = conn.prepareStatement(sql)
          var inBatch = 0
          rows.foreach { r =>
            var i = 0
            while (i < columns.length) {
              stmt.setObject(i + 1, r.get(i))
              i += 1
            }
            stmt.addBatch()
            inBatch += 1
            if (inBatch >= cfg.batchSize) {
              executeWithRetry(stmt.executeBatch(), cfg, () => attempt += 1)
              conn.commit()
              inBatch = 0
            }
          }
          if (inBatch > 0) {
            stmt.executeBatch()
            conn.commit()
          }
          stmt.close()
        } finally {
          if (conn != null) conn.close()
        }
      }
    }
  }

  private def executeWithRetry(exec: => Unit, cfg: UpsertConfig, bump: () => Unit): Unit = {
    var attempts = 0
    var done = false
    while (!done) {
      try { exec; done = true }
      catch {
        case e: java.sql.SQLException if attempts < cfg.maxRetries =>
          attempts += 1; bump()
          Thread.sleep(cfg.retryWaitMs)
        case e: Throwable => throw e
      }
    }
  }
}
