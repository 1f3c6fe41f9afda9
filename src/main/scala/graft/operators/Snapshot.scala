package graft.operators

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.types.{DataType, StructType}

/** Portable snapshots of a maintained-state family — the backup/restore
  * verb the tier was missing: every family is a set of catalog tables
  * (logs + marker) whose layout (bucket spec) the serve paths depend
  * on, so "copy the warehouse directory" is not a restore (the catalog
  * entries, and with them the bucket metadata Spark trusts at read
  * time, are gone). Export captures rows + schema + bucket spec + row
  * counts into one self-describing directory; restore re-creates the
  * family under a NEW name/path with the layout re-established, and
  * verifies the counts it lands against the manifest.
  *
  * Crash contract (the house marker-last move): data directories write
  * first, the `_MANIFEST.json` writes LAST — a crashed export leaves no
  * manifest, so [[restore]] refuses it loudly and a re-export
  * overwrites cleanly. Export requires family quiescence, exactly the
  * compact contract (a mid-extend snapshot would capture a data log's
  * in-flight stamp without its marker row; [[Maintenance.fsck]] on the
  * restored family reports that as the one legal crash-window stamp,
  * which is also the honest reading of such a snapshot).
  *
  * 100 TB judgment: export is a DISTRIBUTED columnar copy (each table
  * rewrites through its executors; the driver touches only catalog
  * metadata, counts, and the manifest bytes), restore pays one
  * ingest-class bucket shuffle per table (∝ index, never corpus) to
  * re-establish the co-located layout — the same price the original
  * build paid. Byte-level cloning (distcp) is cheaper when source and
  * destination share a filesystem, but carries no schema/bucket/count
  * verification and no catalog re-registration; this verb is the
  * engine-level restore those copies still need.
  */
object Snapshot {

  private val ManifestName = "_MANIFEST.json"

  private def fsFor(spark: SparkSession, p: org.apache.hadoop.fs.Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** The family's catalog tables: the base table (if registered) plus
    * every `table_*` sibling. Prefix discovery is what keeps the verb
    * family-agnostic (pairs and join views have different sibling
    * sets); the underscore in the pattern means a family named `idx`
    * never captures a neighbor named `idx2`.
    */
  private def siblings(spark: SparkSession, table: String): Seq[String] = {
    val t = table.toLowerCase
    spark.catalog.listTables().collect()
      .map(_.name)
      .filter(n => n == t || n.startsWith(t + "_"))
      .sorted.toSeq
  }

  /** Export every table of `table`'s family to `dest`. Returns the
    * total row count captured (also recorded per-table in the
    * manifest, where [[restore]] verifies it).
    */
  def export(spark: SparkSession, table: String, dest: String): Long = {
    val names = siblings(spark, table)
    require(names.nonEmpty, s"Snapshot.export: no catalog tables match " +
      s"'$table' or '${table}_*' — nothing to snapshot")
    val manifestPath = new org.apache.hadoop.fs.Path(s"$dest/$ManifestName")
    val fs = fsFor(spark, manifestPath)
    // a stale manifest must not vouch for a partially re-exported dir
    fs.delete(manifestPath, false)
    val catalog = spark.sessionState.catalog
    val entries = names.map { name =>
      val meta = catalog.getTableMetadata(
        spark.sessionState.sqlParser.parseTableIdentifier(name))
      val bucket = meta.bucketSpec
      bucket.foreach { b =>
        // the house writer always sorts by the bucket key; a spec that
        // diverged would silently restore into a different layout
        require(b.sortColumnNames == b.bucketColumnNames,
          s"Snapshot.export: $name sorts by ${b.sortColumnNames}, " +
            s"buckets by ${b.bucketColumnNames} — unsupported layout")
      }
      val suffix = if (name == table.toLowerCase) "base"
      else name.stripPrefix(table.toLowerCase + "_")
      val df = spark.table(name)
      df.write.mode(SaveMode.Overwrite).parquet(s"$dest/$suffix")
      val rows = spark.read.schema(df.schema).parquet(s"$dest/$suffix").count()
      Map[String, Any](
        "name" -> name, "suffix" -> suffix,
        "schema" -> df.schema.json,
        "bucketCols" -> bucket.map(_.bucketColumnNames).getOrElse(Nil),
        "nBuckets" -> bucket.map(_.numBuckets).getOrElse(0),
        "rows" -> rows)
    }
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    import scala.jdk.CollectionConverters._
    val payload = Map[String, Any](
      "table" -> table.toLowerCase,
      "tables" -> entries.map(e => e.map { case (k, v: Seq[_]) =>
        k -> v.asJava
      case kv => kv }.asJava).asJava).asJava
    val bytes = mapper.writerWithDefaultPrettyPrinter()
      .writeValueAsBytes(payload)
    val out = fs.create(manifestPath, true) // manifest LAST = the commit
    try out.write(bytes) finally out.close()
    entries.map(_("rows").asInstanceOf[Long]).sum
  }

  /** Re-create a family from a snapshot under `newTable`/`newPath`.
    * Refuses manifest-less directories (crashed exports) and occupied
    * target names; verifies every table's landed row count against the
    * manifest before returning, so a restore that returns has provably
    * captured what the export recorded.
    */
  def restore(spark: SparkSession, dest: String, newTable: String,
      newPath: String): Unit = {
    val manifestPath = new org.apache.hadoop.fs.Path(s"$dest/$ManifestName")
    val fs = fsFor(spark, manifestPath)
    require(fs.exists(manifestPath),
      s"Snapshot.restore: no $ManifestName under $dest — not a snapshot " +
        "(or a crashed export; re-export it)")
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = {
      val in = fs.open(manifestPath)
      try mapper.readTree(in) finally in.close()
    }
    val srcTable = root.get("table").asText()
    val entries = {
      val it = root.get("tables").elements()
      val buf = scala.collection.mutable.ArrayBuffer.empty[
        com.fasterxml.jackson.databind.JsonNode]
      while (it.hasNext) buf += it.next()
      buf.toSeq
    }
    require(entries.nonEmpty, s"Snapshot.restore: empty manifest under $dest")
    entries.foreach { e =>
      val suffix = e.get("suffix").asText()
      val newName = if (suffix == "base") newTable else s"${newTable}_$suffix"
      require(!spark.catalog.tableExists(newName),
        s"Snapshot.restore: target table $newName already exists — " +
          "restore never overwrites; drop it first if you mean to")
      val schema = DataType.fromJson(e.get("schema").asText())
        .asInstanceOf[StructType]
      // explicit schema: an empty table's directory may hold no data
      // files to infer from, and inference could drift anyway
      val df = spark.read.schema(schema).parquet(s"$dest/$suffix")
      val nBuckets = e.get("nBuckets").asInt()
      // the table-absence require above is the overwrite guard; the
      // PHYSICAL write must truncate its path dir regardless (a dropped
      // external table leaves files behind — ErrorIfExists would then
      // register the new table over old + new rows and read doubles)
      if (nBuckets > 0) {
        val cols = {
          val it = e.get("bucketCols").elements()
          val buf = scala.collection.mutable.ArrayBuffer.empty[String]
          while (it.hasNext) buf += it.next().asText()
          buf.toSeq
        }
        graft.sources.TableWriter.writeBucketed(df, newName,
          s"$newPath/$suffix", cols, nBuckets, SaveMode.Overwrite)
      } else
        df.write.mode(SaveMode.Overwrite)
          .option("path", s"$newPath/$suffix")
          .format("parquet").saveAsTable(newName)
      val expected = e.get("rows").asLong()
      val landed = spark.table(newName).count()
      require(landed == expected,
        s"Snapshot.restore: $newName landed $landed rows, manifest " +
          s"says $expected (snapshot of $srcTable) — restore is torn")
    }
  }
}
