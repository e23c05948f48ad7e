package graft.engine

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.types.DataType

/** JSON codec for the per-table constraint-metadata control file
  * (`.graft_meta`, [[Engine.TableMetaName]]).
  *
  * Why this exists: Spark's catalog carries the SHAPE of a table but
  * none of the constraints this engine enforces on its write path —
  * UNIQUE, AUTO_INCREMENT (and its counter), DEFAULT expressions,
  * declared NOT NULL, index definitions. The reference persists that
  * schema *in the storage backend* (`insert_schema`/`fetch_schema`,
  * reference src/database/base.rs:7-34, src/databases/sled/base.rs:
  * 15-44 — sled keys `schema/{table}`), so a second process opening
  * the same database enforces the same constraints. This engine's
  * storage backend is the table's parquet directory — so the schema
  * record is a dot-prefixed control file inside it, written through
  * [[TableFs]] (any Hadoop scheme) on every metadata mutation and
  * read back when a database directory is mounted.
  *
  * Format notes: DataTypes round-trip through Spark's own
  * `DataType.json` / `DataType.fromJson` — exact by construction,
  * stable across Spark versions by Spark's compatibility contract.
  * A `version` field gates future format changes. The file is O(KB)
  * driver-side metadata, never data-plane.
  */
private[engine] object MetaJson {

  private val mapper = new ObjectMapper()

  def render(tm: TableMeta): String = {
    val root = mapper.createObjectNode()
    root.put("version", 1)
    root.put("autoCounter", tm.autoCounter)
    root.put("epoch", tm.epoch)
    root.put("counterDirty", tm.counterDirty)
    val cols = root.putArray("columns")
    tm.columns.foreach { c =>
      val o = cols.addObject()
      o.put("name", c.name)
      o.put("type", c.dataType.json)
      o.put("nullable", c.nullable)
      o.put("unique", c.unique)
      o.put("autoIncrement", c.autoIncrement)
      c.default.foreach(d => o.put("default", d))
    }
    val idx = root.putArray("indexes")
    tm.indexes.foreach { i =>
      val o = idx.addObject()
      o.put("name", i.name)
      o.put("column", i.column)
      o.put("unique", i.unique)
    }
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(root)
  }

  def parse(body: String): TableMeta = {
    import scala.jdk.CollectionConverters._
    val root = mapper.readTree(body)
    val version = root.path("version").asInt(-1)
    if (version != 1)
      throw new EngineException(s"unsupported table-metadata version $version")
    val columns = root.path("columns").elements().asScala.map { n =>
      ColumnMeta(
        name = n.path("name").asText(),
        dataType = DataType.fromJson(n.path("type").asText()),
        nullable = n.path("nullable").asBoolean(true),
        unique = n.path("unique").asBoolean(false),
        autoIncrement = n.path("autoIncrement").asBoolean(false),
        default = if (n.hasNonNull("default")) Some(n.path("default").asText()) else None)
    }.toSeq
    val indexes = root.path("indexes").elements().asScala.map { n =>
      IndexMeta(
        name = n.path("name").asText(),
        column = n.path("column").asText(),
        unique = n.path("unique").asBoolean(false))
    }.toSeq
    TableMeta(columns, indexes,
      autoCounter = root.path("autoCounter").asLong(1L),
      epoch = root.path("epoch").asLong(0L),
      counterDirty = root.path("counterDirty").asBoolean(false))
  }
}
