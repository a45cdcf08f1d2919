package graft.sources

import java.sql.{Connection, DriverManager}

/** Live-database catalog introspection (S5/S6/S7/S8 against a real
  * store, via JDBC `DatabaseMetaData`) — the Spark-side analog of the
  * reference's system-catalog queries: `SHOW COLUMNS` + `SHOW KEYS`
  * (`mysql.go:382-404,681-737`), `information_schema.columns` +
  * `pg_index` (`postgresql.go:672-722`). Exercised against embedded
  * Derby, which ships on the Spark classpath.
  */
object JdbcCatalog {

  final case class ColumnMeta(ordinal: Int, name: String, typeName: String,
                              size: Int, scale: Int, nullable: Boolean) {
    /** Reconstructed SQL type with length/precision — the reference
      * rebuilds DDL the same way from `character_maximum_length` etc.
      * (`postgresql.go:439-496`). */
    def sqlType: String = typeName.toUpperCase match {
      case t @ ("VARCHAR" | "CHAR" | "CHARACTER") => s"$t($size)"
      case t @ ("DECIMAL" | "NUMERIC") => s"$t($size,$scale)"
      case t => t
    }
  }

  def withConnection[T](url: String)(f: Connection => T): T = {
    graft.sinks.JdbcUpsert.ConnectionExecutor.loadDrivers()
    val conn = DriverManager.getConnection(url)
    try f(conn) finally conn.close()
  }

  /** Stored-case candidates for a table name, ordered by the store's
    * declared identifier folding (`DatabaseMetaData.stores*`): Derby/DB2
    * fold unquoted names to UPPER, PostgreSQL to lower, MySQL on Linux
    * stores them as-given — hardcoding any one of them breaks the others
    * (ADVICE r3). The reference sidesteps this by querying each store's
    * own catalog with the name verbatim; here the folded form is probed
    * first, then the remaining casings. */
  private def nameCandidates(md: java.sql.DatabaseMetaData,
                             table: String): Seq[String] = {
    val folded =
      if (md.storesUpperCaseIdentifiers()) table.toUpperCase
      else if (md.storesLowerCaseIdentifiers()) table.toLowerCase
      else table
    Seq(folded, table, table.toLowerCase, table.toUpperCase).distinct
  }

  /** `getTables`/`getColumns` treat the table name as a LIKE pattern:
    * `_` (in almost every table name here) matches ANY character, so an
    * unescaped probe for `stream_par` would ALSO match a `stream1par`
    * sibling. Escape metacharacters with the driver's declared escape
    * string when it has one — Derby declares none (and rejects
    * backslash escapes in metadata patterns), so every caller ALSO
    * post-filters result rows by exact TABLE_NAME. */
  private def escapePattern(md: java.sql.DatabaseMetaData, name: String): String =
    Option(md.getSearchStringEscape).filter(_.nonEmpty) match {
      case Some(esc) =>
        name.replace(esc, esc + esc).replace("_", esc + "_").replace("%", esc + "%")
      case None => name
    }

  /** Scope metadata lookups to the connection's CURRENT schema when the
    * driver reports one: with a null schema, a same-named table in
    * another schema (public.users vs audit.users) collides — the
    * existence probe false-positives and the column inventory merges
    * both tables' rows. Null when unreported → all schemas (unchanged
    * legacy behavior). */
  private def currentSchema(c: Connection): String =
    try c.getSchema catch { case _: Throwable => null }

  /** The table's stored-case name, if it exists: probe each candidate
    * casing against `getTables`, accepting only an EXACT-name row (the
    * pattern may over-match on wildcard-happy drivers). */
  private def storedName(c: Connection, table: String): Option[String] = {
    val md = c.getMetaData
    nameCandidates(md, table).find { cand =>
      val rs = md.getTables(null, currentSchema(c), escapePattern(md, cand), null)
      try {
        var hit = false
        while (!hit && rs.next()) hit = rs.getString("TABLE_NAME") == cand
        hit
      } finally rs.close()
    }
  }

  /** S7: existence probe via table metadata (reference probes with
    * `SELECT 1 ... LIMIT 1`, `mysql.go:200-207`). */
  def tableExists(url: String, table: String): Boolean =
    withConnection(url)(c => storedName(c, table).isDefined)

  /** S5: column inventory in ordinal order. */
  def columns(url: String, table: String): Seq[ColumnMeta] =
    withConnection(url) { c =>
      val name = storedName(c, table).getOrElse(table)
      val rs = c.getMetaData.getColumns(null, currentSchema(c),
        escapePattern(c.getMetaData, name), null)
      val out = Seq.newBuilder[ColumnMeta]
      try {
        // exact-name filter: the pattern may over-match a sibling table
        // whose name differs only at a `_` position
        while (rs.next()) if (rs.getString("TABLE_NAME") == name) out += ColumnMeta(
          rs.getInt("ORDINAL_POSITION") - 1,
          rs.getString("COLUMN_NAME").toLowerCase,
          rs.getString("TYPE_NAME"),
          rs.getInt("COLUMN_SIZE"),
          rs.getInt("DECIMAL_DIGITS"),
          rs.getInt("NULLABLE") != java.sql.DatabaseMetaData.columnNoNulls)
      } finally rs.close()
      out.result().sortBy(_.ordinal)
    }

  /** S6: primary key columns in key-sequence order (reference
    * `mysql.go:681-737` orders by `Seq_in_index`). */
  def primaryKey(url: String, table: String): Seq[String] =
    withConnection(url) { c =>
      val name = storedName(c, table).getOrElse(table)
      val rs = c.getMetaData.getPrimaryKeys(null, currentSchema(c), name)
      val out = Seq.newBuilder[(Short, String)]
      try {
        while (rs.next())
          out += ((rs.getShort("KEY_SEQ"), rs.getString("COLUMN_NAME").toLowerCase))
      } finally rs.close()
      out.result().sortBy(_._1).map(_._2)
    }

  def execute(url: String, sql: String): Unit =
    withConnection(url) { c =>
      val st = c.createStatement()
      try { st.executeUpdate(sql); () } finally st.close()
    }

  /** S8 live: `CREATE TABLE IF NOT EXISTS` analog at the destination —
    * Derby has no IF NOT EXISTS, so probe-then-create (the reference
    * copies `SHOW CREATE TABLE` output with the same guard,
    * `mysql.go:254-274`). The DDL is reconstructed from SOURCE column
    * metadata including the primary key and executed at the DESTINATION
    * (which may be a different database — the reference's normal
    * topology). */
  def mirrorTable(srcUrl: String, source: String, target: String,
                  destUrl: String = null): Unit = {
    val dst = if (destUrl == null) srcUrl else destUrl
    if (tableExists(dst, target)) return
    val cols = columns(srcUrl, source)
    require(cols.nonEmpty, s"source table '$source' has no columns")
    val pk = primaryKey(srcUrl, source)
    val colDefs = cols.map { m =>
      val notNull = if (m.nullable) "" else " NOT NULL"
      s"${m.name} ${m.sqlType}$notNull"
    }
    val pkDef = if (pk.isEmpty) Nil else Seq(s"PRIMARY KEY (${pk.mkString(", ")})")
    execute(dst, s"CREATE TABLE $target (${(colDefs ++ pkDef).mkString(", ")})")
  }

  /** Schema EVOLUTION at the destination (no reference analog — its
    * mirror is create-once, `mysql.go:254-274`, and a later source
    * column crashes the INSERT): add source columns the destination
    * lacks, so a re-transfer after the source gained a column keeps
    * working. Added columns are NULLABLE regardless of the source's
    * constraint — the destination already holds rows with no value for
    * them; the subsequent keyed MERGE backfills every transferred row.
    * Destination-only columns are never dropped or retyped (evolution
    * is strictly additive). Returns the added column names. */
  def evolveTable(srcUrl: String, source: String, target: String,
                  destUrl: String = null): Seq[String] = {
    val dst = if (destUrl == null) srcUrl else destUrl
    if (!tableExists(dst, target)) {
      mirrorTable(srcUrl, source, target, destUrl)
      return Nil
    }
    // case-INSENSITIVE compare (ADVICE r6): drivers report identifier
    // case differently across dialects (MySQL lowercase, Derby/Postgres
    // uppercase) — a case-sensitive set would classify every existing
    // column as missing and die on a duplicate-column ALTER
    val have = columns(dst, target).map(_.name)
    val missing = columns(srcUrl, source)
      .filterNot(m => have.exists(_.equalsIgnoreCase(m.name)))
    missing.foreach { m =>
      execute(dst, s"ALTER TABLE $target ADD COLUMN ${m.name} ${m.sqlType}")
    }
    missing.map(_.name)
  }
}
