package graft.sources

import java.sql.{Connection, DriverManager}
import java.util.Properties

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** JDBC load target with MERGE-through-staging semantics — the
  * reference's actual load side (an RDBMS reached over a DB driver,
  * loaded by staging each batch into a scratch table and MERGE-ing it
  * into the target on the business key; see
  * /root/reference/src/loaders/misa_crm_loader.py:215-500 and
  * sql/00_master_setup.sql) re-expressed Spark-first:
  *
  *   - the BATCH ships via `df.write.jdbc` — executor-parallel INSERTs
  *     into a staging table, so Spark's partitioning (not a driver
  *     loop) moves the rows;
  *   - the MERGE / delete-insert is ONE set-based statement executed
  *     inside the database — the target's engine owns constraint
  *     checking and atomicity, Spark never round-trips the target's
  *     existing rows;
  *   - the staging table is per-target scratch, overwritten each
  *     batch: a crash between stage and merge leaves only stale
  *     staging (overwritten by the retry), and redelivering a merged
  *     batch re-merges to the same target state (MERGE is idempotent
  *     for identical input) — the [[graft.operators.EtlControl]]
  *     replay posture, asserted in JdbcSinkSpec.
  *
  * Parity contract: for the same base + batch, the target table equals
  * [[graft.operators.Incremental.upsert]] / `.deleteInsert` over the
  * parquet lake (JdbcSinkSpec proves both against embedded Derby — the
  * JDBC engine on this classpath; the SQL is ANSI MERGE, the MSSQL
  * syntax the reference emits modulo identifier quoting).
  *
  * At scale: `numPartitions`/`batchsize` bound the INSERT fan-in so a
  * 1000-executor write does not open 1000 connections against the DB;
  * the MERGE cost lives in the database regardless of corpus size —
  * exactly like the reference, whose pyodbc executemany ships batches
  * and whose MERGE runs server-side.
  */
object JdbcSink {

  private def props(extra: Map[String, String]): Properties = {
    val p = new Properties()
    extra.foreach { case (k, v) => p.setProperty(k, v) }
    p
  }

  private def withConn[A](url: String)(f: Connection => A): A = {
    val conn = DriverManager.getConnection(url)
    try f(conn) finally conn.close()
  }

  private def tableExists(conn: Connection, table: String): Boolean = {
    val rs = conn.getMetaData.getTables(null, null, table.toUpperCase, null)
    try rs.next() finally rs.close()
  }

  private def columnsOf(conn: Connection, table: String): Seq[(String, String)] = {
    val st = conn.createStatement()
    try {
      val rs = st.executeQuery(s"SELECT * FROM $table WHERE 1=0")
      val md = rs.getMetaData
      (1 to md.getColumnCount)
        .map(i => (md.getColumnName(i), md.getColumnTypeName(i)))
    } finally st.close()
  }

  /** LOB keys compare through `CAST(... AS VARCHAR(maxLobKeyChars))`
    * — keys longer than this would error at MERGE time on Derby and
    * silently TRUNCATE (wrong key matches) on engines whose cast
    * truncates, so [[checkLobKeyLengths]] rejects them before any
    * statement runs. */
  val maxLobKeyChars = 4096

  private def isLob(typeName: String): Boolean = {
    val t = typeName.toUpperCase
    t.contains("CLOB") || t.contains("LOB")
  }

  /** Key-comparison operand: Derby (like MSSQL with (N)TEXT) cannot
    * compare LOB types, and Spark's Derby dialect maps StringType to
    * CLOB — string business keys compare through a VARCHAR cast. */
  private def keyOperand(alias: String, col: String, typeName: String): String =
    if (isLob(typeName))
      s"CAST($alias.${quote(col)} AS VARCHAR($maxLobKeyChars))"
    else s"$alias.${quote(col)}"

  /** Fail fast when a staged LOB business key exceeds
    * [[maxLobKeyChars]]: past the cast bound, Derby errors mid-MERGE
    * and truncating engines (e.g. MSSQL CONVERT) would MATCH THE WRONG
    * ROW — a silent-corruption class, so the sink refuses the batch
    * with an actionable message instead. One aggregate query per LOB
    * key over the staged batch. */
  private def checkLobKeyLengths(conn: Connection, stage: String,
      keyCols: Seq[(String, String)]): Unit =
    keyCols.filter { case (_, t) => isLob(t) }.foreach { case (k, _) =>
      val st = conn.createStatement()
      try {
        val rs = st.executeQuery(
          s"SELECT COUNT(*), MAX(LENGTH(${quote(k)})) FROM $stage " +
            s"WHERE LENGTH(${quote(k)}) > $maxLobKeyChars")
        rs.next()
        val n = rs.getLong(1)
        if (n > 0) throw new IllegalArgumentException(
          s"key column $k has $n staged value(s) longer than " +
            s"$maxLobKeyChars chars (max ${rs.getLong(2)}); LOB keys " +
            s"compare through CAST(.. AS VARCHAR($maxLobKeyChars)) and " +
            "longer keys can silently match the wrong target row. Use a " +
            "shorter surrogate key (e.g. a hash) for long business keys.")
      } finally st.close()
    }

  /** Spark's JDBC writer creates QUOTED (case-preserving) column
    * names, so every generated reference must quote the exact name the
    * stage reports; key names are resolved against the stage columns
    * case-insensitively (callers pass DataFrame-cased names). */
  private def quote(c: String): String = "\"" + c + "\""
  private def resolveKeys(cols: Seq[(String, String)],
      keys: Seq[String]): Seq[(String, String)] =
    keys.map(k => cols.find(_._1.equalsIgnoreCase(k)).getOrElse(
      throw new IllegalArgumentException(
        s"key column $k not in staged columns ${cols.map(_._1).mkString(",")}")))

  /** Stage `df` into `<table>__STAGE` (overwritten — per-batch
    * scratch) and MERGE it into `table` on `keys`: matched rows get
    * their non-key columns updated, unmatched rows insert. Creates the
    * target from the staging shape on first load. `failAfterStage`
    * stops between the stage write and the MERGE — the crash window a
    * retry must absorb.
    *
    * The batch must be key-UNIQUE: ANSI MERGE raises when several
    * source rows match one target row (MSSQL and Derby both), so
    * dedup the batch first — [[graft.operators.Dedup.keepLast]], the
    * reference's own per-batch drop_duplicates discipline
    * (shopee_orders_loader.py:283-340). A duplicate-keyed batch fails
    * LOUDLY inside the database, never silently picks a winner
    * (asserted in JdbcSinkSpec). */
  def upsertViaStaging(df: DataFrame, url: String, table: String,
      keys: Seq[String], connProps: Map[String, String] = Map.empty,
      failAfterStage: Boolean = false): Unit = {
    require(keys.nonEmpty, "upsert needs at least one key column")
    val stage = s"${table}__STAGE"
    df.write.mode(SaveMode.Overwrite).jdbc(url, stage, props(connProps))
    if (failAfterStage) return
    withConn(url) { conn =>
      if (!tableExists(conn, table)) {
        val st = conn.createStatement()
        try st.executeUpdate(
          s"CREATE TABLE $table AS SELECT * FROM $stage WITH NO DATA")
        finally st.close()
      }
      val cols = columnsOf(conn, stage)
      val keyCols = resolveKeys(cols, keys)
      checkLobKeyLengths(conn, stage, keyCols)
      val keyNames = keyCols.map(_._1)
      val nonKeys = cols.map(_._1).filterNot(keyNames.contains)
      val on = keyCols.map { case (k, t) =>
        s"${keyOperand("tgt", k, t)} = ${keyOperand("src", k, t)}"
      }.mkString(" AND ")
      val insertCols = cols.map(c => quote(c._1)).mkString(", ")
      val insertVals = cols.map(c => s"src.${quote(c._1)}").mkString(", ")
      val matched =
        if (nonKeys.isEmpty) ""
        else "WHEN MATCHED THEN UPDATE SET " +
          nonKeys.map(c => s"${quote(c)} = src.${quote(c)}").mkString(", ") + " "
      val st = conn.createStatement()
      try st.executeUpdate(
        s"""MERGE INTO $table tgt USING $stage src ON $on
           |$matched
           |WHEN NOT MATCHED THEN INSERT ($insertCols) VALUES ($insertVals)
           |""".stripMargin)
      finally st.close()
    }
  }

  /** Stage `df` and apply the bridge-refresh shape
    * (misa_crm_loader.py:847-880): DELETE every target row whose key
    * appears in the batch, then INSERT the batch — the delete-by-key +
    * insert twin of [[graft.operators.Incremental.deleteInsert]]. */
  def deleteInsertViaStaging(df: DataFrame, url: String, table: String,
      keys: Seq[String], connProps: Map[String, String] = Map.empty,
      failAfterStage: Boolean = false): Unit = {
    require(keys.nonEmpty, "deleteInsert needs at least one key column")
    val stage = s"${table}__STAGE"
    df.write.mode(SaveMode.Overwrite).jdbc(url, stage, props(connProps))
    if (failAfterStage) return
    withConn(url) { conn =>
      if (!tableExists(conn, table)) {
        val st = conn.createStatement()
        try st.executeUpdate(
          s"CREATE TABLE $table AS SELECT * FROM $stage WITH NO DATA")
        finally st.close()
      }
      val cols = columnsOf(conn, stage)
      val keyCols = resolveKeys(cols, keys)
      checkLobKeyLengths(conn, stage, keyCols)
      // correlated EXISTS, not a row-value IN — multi-column row
      // constructors in IN are not portable (Derby rejects them; MSSQL
      // too, which is why the reference builds the same EXISTS shape)
      val corr = keyCols.map { case (k, t) =>
        s"${keyOperand("src", k, t)} = ${keyOperand(table, k, t)}"
      }.mkString(" AND ")
      val st = conn.createStatement()
      try {
        // one transaction: the delete and insert land together or not
        // at all (a crash between them must not lose deleted rows)
        conn.setAutoCommit(false)
        st.executeUpdate(
          s"DELETE FROM $table WHERE EXISTS (SELECT 1 FROM $stage src WHERE $corr)")
        st.executeUpdate(
          s"INSERT INTO $table SELECT ${cols.map(c => quote(c._1)).mkString(", ")} FROM $stage")
        conn.commit()
      } catch {
        case e: Throwable => conn.rollback(); throw e
      } finally {
        st.close()
      }
    }
  }

  /** The target read back through Spark's JDBC source. */
  def readTable(spark: SparkSession, url: String, table: String,
      connProps: Map[String, String] = Map.empty): DataFrame =
    spark.read.jdbc(url, table, props(connProps))
}
