package graft.functions

import org.apache.spark.sql.SparkSession

/** UDF surface (§2.8). The reference's "UDF support" is two things:
  * opaque source-side expressions (covered by `expr()` + the P6
  * validator) and Cassandra server-side UDF DDL migration
  * (`cassandra.go:385-440`). The Spark-native equivalent of the latter
  * is a session UDF registry: named deterministic Scala functions
  * registered once and then callable from any transform expression.
  *
  * Registration is gated: UDFs must be declared deterministic by the
  * caller (non-deterministic transforms break resume, SURVEY §7.4.2),
  * and names must not shadow Spark builtins (which would silently change
  * the meaning of existing config expressions).
  */
object UdfRegistry {

  /** Register a whitelisted-by-construction String=>String UDF. Returns
    * the name so configs can reference it after adding the name to the
    * transform allowlist via [[allowInTransforms]]. Re-registering a
    * name THIS registry registered is allowed (parallel pipelines may
    * share a helper UDF); only genuine builtins are protected. */
  def registerString(spark: SparkSession, name: String, f: String => String): String = {
    requireFreshName(spark, name)
    spark.udf.register(name, f)
    recordRegistered(name)
    name
  }

  def registerLong(spark: SparkSession, name: String, f: Long => Long): String = {
    requireFreshName(spark, name)
    spark.udf.register(name, f)
    recordRegistered(name)
    name
  }

  @volatile private var registered: Set[String] = Set.empty
  private def recordRegistered(name: String): Unit = synchronized {
    registered += name.toLowerCase
  }

  /** Names of the engine's OWN native expressions (injected by
    * GraftExtensions and admitted by the P6 allowlist). A user UDF must
    * never take one of these names: the register would silently replace
    * the codegen'd expression, changing the meaning of every config
    * transform that calls it — the exact hazard the builtin-shadow
    * guard exists to prevent. */
  private val NativeNames = Set("graft_fnv1a32", "graft_cosine", "graft_sqdist")

  private def requireFreshName(spark: SparkSession, name: String): Unit = {
    require(name.matches("[a-zA-Z_][a-zA-Z0-9_]*"), s"invalid UDF name: $name")
    require(!NativeNames(name.toLowerCase),
      s"UDF '$name' would shadow the engine's native expression of the " +
        "same name — pick a different name")
    val present = spark.sessionState.functionRegistry
      .functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier(name.toLowerCase))
    // Idempotent re-register of our own name — but only when THIS
    // session already has it: `registered` is JVM-global, and skipping
    // on a fresh session would leave the function unregistered there.
    if (registered(name.toLowerCase) && present) return
    require(!present || registered(name.toLowerCase) || name.startsWith("graft_"),
      s"UDF '$name' would shadow a builtin — use a 'graft_' prefix")
  }

  /** Extend the P6 transform allowlist with registered UDF names (the
    * validator is default-deny, so user UDFs must opt in explicitly).
    * Updates are synchronized — parallel table pipelines may register
    * concurrently, and a lost update would make the validator reject a
    * legitimately registered UDF. */
  @volatile private var extraAllowed: Set[String] = Set.empty
  def allowInTransforms(name: String): Unit = synchronized {
    extraAllowed += name.toLowerCase
  }
  def allowedExtras: Set[String] = extraAllowed
}
