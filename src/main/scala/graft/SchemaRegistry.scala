package graft

import org.apache.spark.sql.types.StructType

/** Schema-registry analog (NiFi's AvroSchemaRegistry controller service
  * with the schema-name access strategy): flow definitions reference
  * schemas by NAME (`Schema Name` property) instead of inlining DDL, so
  * one schema edit propagates to every flow that names it — the same
  * decoupling NiFi's record readers/writers get from their registry.
  *
  * Registration is driver-side config (done once at session setup, like
  * NiFi's controller-service configuration); lookups happen at flow
  * COMPILE time, so the registry never rides into executors. */
object SchemaRegistry {

  private val schemas =
    new java.util.concurrent.ConcurrentHashMap[String, StructType]()

  /** Register (or replace) a named schema from a DDL string
    * (`"id BIGINT, name STRING"`). */
  def register(name: String, ddl: String): Unit =
    schemas.put(name, StructType.fromDDL(ddl))

  def register(name: String, schema: StructType): Unit =
    schemas.put(name, schema)

  /** Lookup; unknown names fail loudly at compile time (a flow naming a
    * missing schema must not silently validate against nothing). */
  def get(name: String): StructType =
    Option(schemas.get(name)).getOrElse(throw new IllegalArgumentException(
      s"schema '$name' is not registered (have: ${names.mkString(", ")})"))

  def names: Seq[String] = {
    import scala.jdk.CollectionConverters._
    schemas.keySet().asScala.toSeq.sorted
  }

  def clear(): Unit = schemas.clear()
}
