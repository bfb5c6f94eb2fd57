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
  * The write mechanics (foreachPartition, paging, commit) execute for
  * real against embedded Derby in ExtensionsSpec, alongside the
  * [[JdbcDim]] read path; the `ON CONFLICT` clause itself is Postgres
  * dialect, exercised at the SQL-generation level (no Postgres in the
  * container) with its DO-NOTHING semantics oracle-tested
  * engine-natively via `Star.append`.
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
    val nCols = columns.length
    df.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.hasNext) {
        var conn: Connection = null
        try {
          conn = DriverManager.getConnection(cfg.url)
          conn.setAutoCommit(false)
          val stmt = conn.prepareStatement(sql)
          // Rows are buffered per page so a failed page can be REBUILT:
          // JDBC clears a statement's batch once executeBatch returns
          // (success or failure), so retrying the bare executeBatch()
          // would commit an empty batch and silently drop the page.
          val page = new scala.collection.mutable.ArrayBuffer[Array[AnyRef]](cfg.batchSize)
          def flush(): Unit = if (page.nonEmpty) {
            flushPageWithRetry(conn, stmt, page, cfg)
            page.clear()
          }
          rows.foreach { r =>
            val vals = new Array[AnyRef](nCols)
            var i = 0
            while (i < nCols) { vals(i) = r.get(i).asInstanceOf[AnyRef]; i += 1 }
            page += vals
            if (page.length >= cfg.batchSize) flush()
          }
          flush() // final partial page goes through the same retry path
          stmt.close()
        } finally {
          if (conn != null) conn.close()
        }
      }
    }
  }

  /** One page as one transaction: rebuild batch → executeBatch → commit,
    * with rollback (Postgres aborts the txn on error) + rebuild before
    * each bounded retry (`etl/cargar_postgres.py:136-152` semantics).
    */
  private def flushPageWithRetry(
      conn: Connection,
      stmt: java.sql.PreparedStatement,
      page: scala.collection.mutable.ArrayBuffer[Array[AnyRef]],
      cfg: UpsertConfig): Unit = {
    var attempts = 0
    var done = false
    while (!done) {
      try {
        page.foreach { vals =>
          var i = 0
          while (i < vals.length) { stmt.setObject(i + 1, vals(i)); i += 1 }
          stmt.addBatch()
        }
        stmt.executeBatch()
        conn.commit()
        done = true
      } catch {
        case _: java.sql.SQLException if attempts < cfg.maxRetries =>
          attempts += 1
          try conn.rollback() catch { case _: java.sql.SQLException => () }
          try stmt.clearBatch() catch { case _: java.sql.SQLException => () }
          Thread.sleep(cfg.retryWaitMs)
      }
    }
  }
}
