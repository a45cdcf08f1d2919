package graft.sinks

import org.apache.spark.sql.types._

/** S9: Cassandra UDT/UDF dependency migration — DDL emission
  * (reference `cassandra.go:293-443`: collect the custom types a table's
  * columns USE, emit `CREATE TYPE IF NOT EXISTS ks.name (f t, …)` per
  * type and `CREATE OR REPLACE FUNCTION …` per used function).
  *
  * The engine's UDT analog is a nested `StructType`: every struct
  * reachable from a table schema becomes a named UDT, and the table DDL
  * references it as `frozen<name>`. Emission is DEPENDENCY-ORDERED
  * (innermost structs first) — an improvement over the reference, which
  * emits in catalog order and leans on IF-NOT-EXISTS retries when a
  * parent lands before a child.
  *
  * Pure string generation over Catalyst metadata: no live Cassandra
  * exists in the offline build (connectors are deployment-gated), so
  * the contract is the emitted DDL itself, unit-tested; a deployment
  * executes the statements through its session exactly like the
  * reference executes them through gocql.
  */
object CassandraDdl {

  /** CQL reserved words that would make an unquoted identifier invalid
    * (the common collision set; quoting is the general escape hatch). */
  private val CqlReserved = Set(
    "add", "allow", "alter", "and", "apply", "asc", "authorize", "batch",
    "begin", "by", "columnfamily", "create", "delete", "desc", "describe",
    "drop", "entries", "execute", "from", "full", "grant", "if", "in",
    "index", "infinity", "insert", "into", "is", "keyspace", "limit",
    "materialized", "modify", "nan", "norecursive", "not", "null", "of",
    "on", "or", "order", "primary", "rename", "replace", "revoke",
    "schema", "select", "set", "table", "to", "token", "truncate",
    "unlogged", "update", "use", "using", "view", "where", "with")

  /** A column/field identifier, lowercased like the reference's CQL and
    * QUOTED whenever the plain form would be invalid (reserved word,
    * non-[a-z0-9_] characters, leading digit) — an unquoted reserved
    * word or special character would make the emitted DDL fail at
    * deployment time, where no test has ever executed it. */
  private[sinks] def quoteId(name: String): String = {
    val lower = name.toLowerCase
    if (lower.matches("[a-z][a-z0-9_]*") && !CqlReserved(lower)) lower
    else "\"" + lower.replace("\"", "\"\"") + "\""
  }

  /** Two source names may collapse to one CQL identifier (CQL folds
    * unquoted identifiers to lower case): refuse instead of emitting a
    * duplicate column list Cassandra would reject. */
  private def requireDistinct(what: String, names: Seq[String]): Unit = {
    val dups = names.map(_.toLowerCase).groupBy(identity)
      .collect { case (n, occ) if occ.size > 1 => n }
    require(dups.isEmpty,
      s"$what: names collapse to duplicate CQL identifiers after " +
        s"lower-casing: ${dups.mkString(", ")}")
  }

  /** CQL rendering of a Catalyst type. Struct fields become UDT
    * references (`frozen<name>` — UDTs nested in other types must be
    * frozen in CQL); collection types render as `list/map/set`. */
  def cqlType(dt: DataType, udtName: StructType => String): String = dt match {
    case ByteType => "tinyint"
    case ShortType => "smallint"
    case IntegerType => "int"
    case LongType => "bigint"
    case FloatType => "float"
    case DoubleType => "double"
    case BooleanType => "boolean"
    case StringType => "text"
    case BinaryType => "blob"
    case DateType => "date"
    case TimestampType => "timestamp"
    case d: DecimalType => "decimal" // CQL decimal is arbitrary-precision
    case ArrayType(e, _) => s"list<${cqlType(e, udtName)}>"
    case MapType(k, v, _) => s"map<${cqlType(k, udtName)}, ${cqlType(v, udtName)}>"
    case s: StructType => s"frozen<${udtName(s)}>"
    case other => sys.error(s"no CQL mapping for Catalyst type $other")
  }

  /** Deterministic UDT name for a struct at a field path:
    * `<table>_<path>_t` (the parquet schema carries no type names, so
    * the path IS the identity — stable across runs). */
  private def pathName(table: String, path: Seq[String]): String =
    (table +: path).mkString("_").toLowerCase + "_t"

  /** Every struct reachable from the schema with its UDT name, in
    * DEPENDENCY order (children before the structs that embed them) —
    * the order the CREATE TYPE statements must execute. Map keys and
    * values get distinct path segments so two same-shaped structs at
    * different positions never alias. */
  private[sinks] def reachableStructs(table: String, schema: StructType)
      : Seq[(String, Seq[String], StructType)] = {
    val out = scala.collection.mutable.LinkedHashMap
      .empty[Seq[String], (String, StructType)]
    val used = scala.collection.mutable.Set.empty[String]
    def walk(dt: DataType, path: Seq[String]): Unit = dt match {
      case s: StructType =>
        s.fields.foreach(f => walk(f.dataType, path :+ f.name)) // children first
        if (!out.contains(path)) {
          // distinct paths can join to the same '_'-separated name
          // (["a","key"] vs ["a_key"]) — disambiguate with a counter so
          // no CREATE TYPE is silently dropped
          val base = pathName(table, path)
          var name = base; var k = 2
          while (used(name)) { name = base.stripSuffix("_t") + s"_$k" + "_t"; k += 1 }
          used += name
          out(path) = (name, s)
        }
      case ArrayType(e, _) => walk(e, path)
      case MapType(k, v, _) => { walk(k, path :+ "key"); walk(v, path :+ "value") }
      case _ => ()
    }
    // top level: the table's own row type is the TABLE, not a UDT — walk
    // its fields only
    schema.fields.foreach(f => walk(f.dataType, Seq(f.name)))
    out.toSeq.map { case (p, (n, s)) => (n, p, s) }
  }

  /** Render a type at a PATH: a struct resolves to the UDT name the
    * dependency walk assigned to that path — the name IS the position,
    * so two structurally identical structs at different paths keep
    * distinct, stable names (a value-keyed map would collapse them and
    * orphan one CREATE TYPE). */
  private def render(names: Map[Seq[String], String], dt: DataType,
                     path: Seq[String]): String =
    dt match {
      case s: StructType => s"frozen<${names(path)}>"
      case ArrayType(e, _) => s"list<${render(names, e, path)}>"
      case MapType(k, v, _) =>
        s"map<${render(names, k, path :+ "key")}, ${render(names, v, path :+ "value")}>"
      case other => cqlType(other, _ => sys.error("unreachable"))
    }

  /** `CREATE TYPE IF NOT EXISTS` statements for every UDT the table
    * uses, dependency-ordered (reference `cassandra.go:365-369`,
    * field list per `buildTypeFields`, `cassandra.go:443-449`). */
  def createTypeDdl(keyspace: String, table: String,
                    schema: StructType): Seq[String] = {
    val structs = reachableStructs(table, schema)
    val names = structs.map { case (n, p, _) => (p, n) }.toMap
    structs.map { case (n, path, s) =>
      requireDistinct(s"UDT $n", s.fields.map(_.name).toSeq)
      val fields = s.fields
        .map(f => s"${quoteId(f.name)} ${render(names, f.dataType, path :+ f.name)}")
        .mkString(", ")
      s"CREATE TYPE IF NOT EXISTS $keyspace.$n ($fields)"
    }
  }

  /** Table DDL referencing the emitted UDTs (the destination half of the
    * schema copy, `cassandra.go:254-289`). */
  def createTableDdl(keyspace: String, table: String, schema: StructType,
                     pk: Seq[String]): String = {
    require(pk.nonEmpty, s"table '$table' needs a primary key")
    val names = reachableStructs(table, schema)
      .map { case (n, p, _) => (p, n) }.toMap
    // struct-typed columns reference their path-derived UDT
    requireDistinct(s"table $table", schema.fields.map(_.name).toSeq)
    val cols = schema.fields.map { f =>
      s"${quoteId(f.name)} ${render(names, f.dataType, Seq(f.name))}"
    }.mkString(", ")
    s"CREATE TABLE IF NOT EXISTS $keyspace.$table " +
      s"($cols, PRIMARY KEY (${pk.map(quoteId).mkString(", ")}))"
  }

  /** `CREATE OR REPLACE FUNCTION` (reference `cassandra.go:408-421`):
    * same clause structure — argument list, RETURNS, LANGUAGE, the
    * null-input variant, `$$body$$`. The engine's registered UDFs carry
    * their body as the expression the deployment re-registers. */
  def createFunctionDdl(keyspace: String, fn: String,
                        args: Seq[(String, DataType)], returns: DataType,
                        language: String, body: String,
                        calledOnNull: Boolean): String = {
    val nullClause =
      if (calledOnNull) "CALLED ON NULL INPUT" else "RETURNS NULL ON NULL INPUT"
    val argList = args
      .map { case (n, t) => s"$n ${cqlType(t, _ => sys.error("UDT args unsupported"))}" }
      .mkString(", ")
    s"CREATE OR REPLACE FUNCTION $keyspace.$fn ($argList) " +
      s"RETURNS ${cqlType(returns, _ => sys.error("UDT returns unsupported"))} " +
      s"LANGUAGE $language $nullClause AS $$$$$body$$$$"
  }
}
