package graft.operators

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions.col
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
  * INCREMENTAL backups ride the tier's own design: the stamped logs are
  * APPEND-ONLY between compacts, so a delta snapshot exports only rows
  * whose `batch_id` exceeds the parent snapshot's per-table max stamp —
  * backup cost ∝ what changed, never ∝ index. Unstamped tables (the
  * overwrite-merged deletion frontiers, the IVF's frozen centroids)
  * are copied whole each time — they are the family's SMALL tables by
  * construction, and overwrite semantics admit no slicing. A COMPACT
  * between snapshots rewrites history (stamps collapse to {0} or
  * {0, m}), which [[export]] detects per table (the parent's recorded
  * stamps are no longer a subset of the live ones) and refuses loudly:
  * every compact starts a new full-backup epoch — the same contract
  * LSM stores and WAL-shipping databases live with.
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
  * metadata, counts, stamp sets, and the manifest bytes — all bounded
  * by batch count, never rows), and the delta slice `batch_id > since`
  * prunes at the scan. Restore pays one ingest-class bucket shuffle
  * per table (∝ index, never corpus) to re-establish the co-located
  * layout — the same price the original build paid — and each delta
  * link appends through `insertInto`, which lays rows out by the
  * restored table's existing bucket spec. Byte-level cloning (distcp)
  * is cheaper when source and destination share a filesystem, but
  * carries no schema/bucket/count verification and no catalog
  * re-registration; this verb is the engine-level restore those copies
  * still need.
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
      // temp views share the listing (an [[attach]]ed chain, ad-hoc
      // scratch views) but are not snapshot material — and
      // getTableMetadata would throw on one mid-export
      .filter(!_.isTemporary)
      .map(_.name)
      .filter(n => n == t || n.startsWith(t + "_"))
      .sorted.toSeq
  }

  private def readManifest(spark: SparkSession, dest: String):
      com.fasterxml.jackson.databind.JsonNode = {
    val p = new org.apache.hadoop.fs.Path(s"$dest/$ManifestName")
    val fs = fsFor(spark, p)
    require(fs.exists(p),
      s"Snapshot: no $ManifestName under $dest — not a snapshot " +
        "(or a crashed export; re-export it)")
    val in = fs.open(p)
    try new com.fasterxml.jackson.databind.ObjectMapper().readTree(in)
    finally in.close()
  }

  private def jsonSeq(node: com.fasterxml.jackson.databind.JsonNode):
      Seq[com.fasterxml.jackson.databind.JsonNode] = {
    val it = node.elements()
    val buf = scala.collection.mutable.ArrayBuffer.empty[
      com.fasterxml.jackson.databind.JsonNode]
    while (it.hasNext) buf += it.next()
    buf.toSeq
  }

  /** Export `table`'s family to `dest`. With `incrementalFrom = Some(
    * parentDest)`, exports a DELTA against that earlier snapshot: each
    * stamped table contributes only rows past the parent's recorded max
    * stamp, unstamped tables are copied whole, and the manifest records
    * the parent path for [[restore]] to chain through. Refuses a delta
    * whose parent history was compacted away. Returns the rows written
    * into THIS snapshot directory.
    */
  def export(spark: SparkSession, table: String, dest: String,
      incrementalFrom: Option[String] = None): Long = {
    val names = siblings(spark, table)
    require(names.nonEmpty, s"Snapshot.export: no catalog tables match " +
      s"'$table' or '${table}_*' — nothing to snapshot")
    val parent = incrementalFrom.map { pd =>
      val m = readManifest(spark, pd)
      require(m.get("table").asText() == table.toLowerCase,
        s"Snapshot.export: parent snapshot under $pd is of " +
          s"'${m.get("table").asText()}', not '$table'")
      pd -> jsonSeq(m.get("tables")).map(e =>
        e.get("name").asText() ->
          jsonSeq(e.get("stamps")).map(_.asLong()).toSet).toMap
    }
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
      val stamped = df.columns.contains("batch_id")
      val stamps: Seq[Long] =
        if (stamped) df.select("batch_id").distinct()
          .collect().map(_.getLong(0)).sorted.toSeq
        else Nil
      val slice = parent match {
        case Some((pd, parentStamps)) if stamped =>
          parentStamps.get(name) match {
            case Some(ps) =>
              require(ps.subsetOf(stamps.toSet),
                s"Snapshot.export: $name no longer holds the parent " +
                  s"snapshot's stamps (a compact rewrote history since " +
                  s"$pd) — incremental chains break at compacts; take a " +
                  "full snapshot")
              val since = if (ps.nonEmpty) ps.max else -1L
              df.filter(col("batch_id") > since)
            case None => df // table born after the parent: full copy
          }
        case _ => df // full snapshot, or an unstamped table: whole copy
      }
      slice.write.mode(SaveMode.Overwrite).parquet(s"$dest/$suffix")
      val written =
        spark.read.schema(df.schema).parquet(s"$dest/$suffix").count()
      Map[String, Any](
        "name" -> name, "suffix" -> suffix,
        "schema" -> df.schema.json,
        "bucketCols" -> bucket.map(_.bucketColumnNames).getOrElse(Nil),
        "nBuckets" -> bucket.map(_.numBuckets).getOrElse(0),
        "stamps" -> stamps,
        "rows" -> written,
        // what the whole table held at export time — the number each
        // restore link verifies after applying this snapshot
        "rowsTotal" -> (if (parent.isDefined) df.count() else written))
    }
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    import scala.jdk.CollectionConverters._
    val payload = Map[String, Any](
      "table" -> table.toLowerCase,
      "parent" -> parent.map(_._1).orNull,
      "tables" -> entries.map(e => e.map {
        case (k, v: Seq[_]) => k -> v.asJava
        case kv => kv
      }.asJava).asJava).asJava
    val bytes = mapper.writerWithDefaultPrettyPrinter()
      .writeValueAsBytes(payload)
    val out = fs.create(manifestPath, true) // manifest LAST = the commit
    try out.write(bytes) finally out.close()
    entries.map(_("rows").asInstanceOf[Long]).sum
  }

  /** The snapshot chain base-first, parent pointers followed; refuses
    * cycles (a tampered chain) and mixed-family links.
    */
  private def chainOf(spark: SparkSession, dest: String):
      List[(String, com.fasterxml.jackson.databind.JsonNode)] = {
    var links = List.empty[(String, com.fasterxml.jackson.databind.JsonNode)]
    var cur = Option(dest)
    val seen = scala.collection.mutable.Set.empty[String]
    while (cur.isDefined) {
      val d = cur.get
      require(seen.add(d),
        s"Snapshot: parent cycle through $d — chain is corrupt")
      val m = readManifest(spark, d)
      links = (d -> m) :: links
      cur = Option(m.get("parent")).filterNot(_.isNull).map(_.asText())
    }
    val srcTable = links.head._2.get("table").asText()
    links.foreach { case (d, m) =>
      require(m.get("table").asText() == srcTable,
        s"Snapshot: chain link $d snapshots a different family")
    }
    links
  }

  /** Re-create a family from a snapshot under `newTable`/`newPath`. A
    * delta snapshot restores its whole parent CHAIN first (base fully,
    * each delta appended through the restored tables' bucket layout;
    * unstamped tables take the newest copy). Refuses manifest-less
    * directories (crashed exports) and occupied target names; verifies
    * every table's landed row count against the manifest of every link
    * before returning, so a restore that returns has provably rebuilt
    * what each export recorded.
    */
  def restore(spark: SparkSession, dest: String, newTable: String,
      newPath: String): Unit = {
    val chain = chainOf(spark, dest)
    val srcTable = chain.head._2.get("table").asText()
    // occupied-target check against the FULL sibling set across links
    val allNames = chain.flatMap { case (_, m) =>
      jsonSeq(m.get("tables")).map(_.get("suffix").asText())
    }.distinct
    allNames.foreach { suffix =>
      val newName = if (suffix == "base") newTable else s"${newTable}_$suffix"
      require(!spark.catalog.tableExists(newName),
        s"Snapshot.restore: target table $newName already exists — " +
          "restore never overwrites; drop it first if you mean to")
    }
    chain.zipWithIndex.foreach { case ((d, m), i) =>
      val isBase = i == 0
      jsonSeq(m.get("tables")).foreach { e =>
        val suffix = e.get("suffix").asText()
        val newName = if (suffix == "base") newTable
        else s"${newTable}_$suffix"
        val schema = DataType.fromJson(e.get("schema").asText())
          .asInstanceOf[StructType]
        // explicit schema: an empty slice's directory may hold no data
        // files to infer from, and inference could drift anyway
        val df = spark.read.schema(schema).parquet(s"$d/$suffix")
        val nBuckets = e.get("nBuckets").asInt()
        val stamped = schema.fieldNames.contains("batch_id")
        val exists = spark.catalog.tableExists(newName)
        if (exists && stamped) {
          // delta link on a stamped log: append through the restored
          // table's bucket spec (insertInto is positional; the manifest
          // schema IS the table's column order)
          df.write.mode(SaveMode.Append).insertInto(newName)
        } else {
          if (exists) spark.sql(s"DROP TABLE $newName") // unstamped: newest copy wins
          // the occupied-target require above is the overwrite guard;
          // the PHYSICAL write must truncate its path dir regardless (a
          // previously dropped external table leaves files behind —
          // ErrorIfExists would register the new table over old + new
          // rows and read doubles)
          if (nBuckets > 0) {
            val cols = jsonSeq(e.get("bucketCols")).map(_.asText())
            graft.sources.TableWriter.writeBucketed(df, newName,
              s"$newPath/$suffix", cols, nBuckets, SaveMode.Overwrite)
          } else
            df.write.mode(SaveMode.Overwrite)
              .option("path", s"$newPath/$suffix")
              .format("parquet").saveAsTable(newName)
        }
        val expected =
          if (isBase) e.get("rows").asLong() else e.get("rowsTotal").asLong()
        val landed = spark.table(newName).count()
        require(landed == expected,
          s"Snapshot.restore: $newName landed $landed rows after link " +
            s"$d, its manifest says $expected (snapshot of $srcTable) — " +
            "restore is torn")
      }
    }
  }

  /** Audit a snapshot chain WITHOUT restoring it: every link reachable
    * base-first (manifest present, same family, no cycles — [[chainOf]]
    * refuses the rest loudly), and every table directory still holding
    * exactly the rows its manifest recorded — the bit-rot /
    * partial-deletion check an operator runs before TRUSTING a backup
    * (and the one [[restore]] would only surface mid-restore, after
    * work). Read-only; cost ∝ snapshot bytes (one count per table
    * directory, schema pinned from the manifest). Returns one
    * (link, table, ok, detail) row per chain entry; q227 gates its
    * restore on a clean report.
    */
  def verify(spark: SparkSession, dest: String):
      org.apache.spark.sql.DataFrame = {
    val rows = chainOf(spark, dest).flatMap { case (d, m) =>
      jsonSeq(m.get("tables")).map { e =>
        val suffix = e.get("suffix").asText()
        val schema = DataType.fromJson(e.get("schema").asText())
          .asInstanceOf[StructType]
        val expected = e.get("rows").asLong()
        val landed =
          try spark.read.schema(schema).parquet(s"$d/$suffix").count()
          catch { case scala.util.control.NonFatal(_) => -1L }
        (d, suffix, landed == expected,
          if (landed == expected) s"$expected rows"
          else if (landed < 0) "UNREADABLE"
          else s"$landed of $expected rows — snapshot dir was modified")
      }
    }
    import spark.implicits._
    rows.toDF("link", "table", "ok", "detail")
  }

  /** Register session-scoped TEMP VIEWS over a snapshot chain — query a
    * backup WITHOUT restoring it. Stamped logs read as the union of
    * every link's slice (the chain is append-only between compacts, so
    * the union IS the table); unstamped tables (overwrite-style
    * frontiers) take the newest link's copy. Zero data is moved or
    * shuffled at attach time — the views read the snapshot's parquet in
    * place, so this is the DR "show me yesterday's index right now"
    * read path and the audit path over cold backups. Family verbs work
    * unchanged on the attached name (they resolve through
    * `spark.table`, which sees temp views first) at PLAIN-PARQUET cost:
    * the bucket co-location a [[restore]] re-establishes is not
    * present, so sustained serving should restore instead. Counts are
    * not verified here (the views are lazy); restore is the verified
    * path. Returns the view names registered.
    */
  def attach(spark: SparkSession, dest: String, viewPrefix: String): Seq[String] = {
    val chain = chainOf(spark, dest)
    // suffix -> (schema, stamped, slices base-first); schema drift
    // across links would union wrong, so it is refused loudly
    val perSuffix = scala.collection.mutable.LinkedHashMap.empty[
      String, (String, Boolean, List[String])]
    chain.foreach { case (d, m) =>
      jsonSeq(m.get("tables")).foreach { e =>
        val suffix = e.get("suffix").asText()
        val schemaJson = e.get("schema").asText()
        val stamped = DataType.fromJson(schemaJson).asInstanceOf[StructType]
          .fieldNames.contains("batch_id")
        perSuffix.get(suffix) match {
          case Some((s0, _, dirs)) =>
            require(s0 == schemaJson,
              s"Snapshot.attach: $suffix changed schema mid-chain at $d " +
                "— attach cannot union drifted slices")
            perSuffix(suffix) = (s0, stamped, dirs :+ s"$d/$suffix")
          case None =>
            perSuffix(suffix) = (schemaJson, stamped, List(s"$d/$suffix"))
        }
      }
    }
    perSuffix.map { case (suffix, (schemaJson, stamped, dirs)) =>
      val schema = DataType.fromJson(schemaJson).asInstanceOf[StructType]
      val read = (p: String) => spark.read.schema(schema).parquet(p)
      val df =
        if (stamped) dirs.map(read).reduce(_ unionByName _)
        else read(dirs.last) // newest frontier copy wins
      val viewName = if (suffix == "base") viewPrefix
      else s"${viewPrefix}_$suffix"
      df.createOrReplaceTempView(viewName)
      viewName
    }.toSeq
  }
}
