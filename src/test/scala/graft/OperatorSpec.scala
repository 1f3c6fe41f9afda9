package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.core.{Coercions, RoleResolver}
import graft.operators.{ConnectedComponents, EntityOps}

class OperatorSpec extends SparkSpec {

  // ---------------------------------------------------------------- P1
  test("role resolver: exact synonym beats substring; case-insensitive") {
    import RoleResolver.Role
    val schema = StructType(Seq(
      StructField("COMPANY_TICKER", StringType),
      StructField("issue", StringType),
      StructField("some_name_col", StringType)))
    val bound = RoleResolver.resolve(schema, Seq(
      Role("ticker", Seq("ticker", "company_ticker", "symbol")),
      Role("issue_name", Seq("issue_name", "issue", "name")),
      Role("label", Seq.empty, substrings = Seq("name"), required = false)))
    assert(bound("ticker") == "COMPANY_TICKER")
    assert(bound("issue_name") == "issue")
    assert(bound("label") == "some_name_col")
  }

  test("role resolver: missing required role errors with available columns") {
    import RoleResolver.Role
    val schema = StructType(Seq(StructField("a", StringType), StructField("b", StringType)))
    val e = intercept[IllegalArgumentException] {
      RoleResolver.resolve(schema, Seq(Role("ticker", Seq("ticker"))))
    }
    assert(e.getMessage.contains("a, b"))
  }

  test("role resolver: optional role falls back to named column") {
    import RoleResolver.Role
    val schema = StructType(Seq(StructField("full_name", StringType)))
    val bound = RoleResolver.resolve(schema, Seq(
      Role("name", Seq("full_name")),
      Role("title", Seq("title"), required = false, fallback = Some("full_name"))))
    assert(bound("title") == "full_name")
  }

  // ---------------------------------------------------------------- S2
  test("table discovery probes candidates in order (fs + catalog)") {
    val hit = graft.sources.Discovery.probeTable(
      spark, sfDir, Seq("docs", "document", "documents"))
    assert(hit.map(_._1).contains("documents"))
    assert(hit.get._2.count() > 0)
    assert(graft.sources.Discovery.probeTable(spark, sfDir, Seq("nope")).isEmpty)

    spark.range(1).createOrReplaceTempView("execs_probe")
    val cat = graft.sources.Discovery.probeCatalogTable(
      spark, Seq("executives_probe", "execs_probe"))
    assert(cat.map(_._1).contains("execs_probe"))
  }

  // ---------------------------------------------------------------- P2/F1/F8
  test("coercions: junk numerics → 0.0; normalize; sanitize keys") {
    import spark.implicits._
    val df = Seq(("12.5", "  John   SMITH ", "smith, john jr."),
      ("junk", null, "a.b c")).toDF("num", "name", "key")
    val out = df.select(
      Coercions.numCoerce(col("num")).as("n"),
      Coercions.normalizeString(col("name")).as("nm"),
      Coercions.sanitizeKey(col("key")).as("k")).collect()
    assert(out(0).getDouble(0) == 12.5)
    assert(out(1).getDouble(0) == 0.0)
    assert(out(0).getString(1) == "john smith")
    assert(out(1).getString(1) == "")
    assert(out(0).getString(2) == "smith_john_jr")
    assert(out(1).getString(2) == "ab_c")
  }

  // ---------------------------------------------------------------- F7
  test("position derivation covers all tie cases") {
    import spark.implicits._
    val cases = Seq(
      (0.0, 0.0, 0.0, "NEUTRAL"),   // total 0
      (5.0, 3.0, 2.0, "AGAINST"),
      (2.0, 3.0, 5.0, "PRO"),
      (1.0, 5.0, 1.0, "NEUTRAL"),   // neutral strictly max
      (3.0, 1.0, 3.0, "AGAINST"),   // against/pro tie → AGAINST
      (2.0, 2.0, 2.0, "AGAINST"),   // all equal → AGAINST
      (-1.0, 0.0, 0.0, "NEUTRAL"))  // negative total
    val df = cases.map(c => (c._1, c._2, c._3)).toDF("a", "n", "p")
    val got = df.select(EntityOps.position(col("a"), col("n"), col("p"))).collect()
    for ((c, row) <- cases.zip(got)) assert(row.getString(0) == c._4, s"case $c")
  }

  // ---------------------------------------------------------------- A4
  test("connected components: chain + clique + isolated-pair invariants") {
    import spark.implicits._
    // chain 1-2-3-4, clique {10,11,12}, pair {20,21}
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L),
      (10L, 12L), (20L, 21L)).toDF("src", "dst")
    val comp = ConnectedComponents.run(spark, edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(comp(_) == 1L))
    assert(Seq(10L, 11L, 12L).forall(comp(_) == 10L))
    assert(Seq(20L, 21L).forall(comp(_) == 20L))
  }

  // ---------------------------------------------------------------- A4
  test("connected components drops NULL-endpoint edges on both paths") {
    import spark.implicits._
    val edges = Seq(
      (Some(1L), Some(2L)), (None, Some(3L)), (Some(4L), None),
      (None: Option[Long], None: Option[Long])).toDF("src", "dst")
    for (threshold <- Seq(0L, 100000L)) { // distributed and local paths
      val comp = ConnectedComponents.run(spark, edges, localThreshold = threshold)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(comp == Map(1L -> 1L, 2L -> 1L), s"threshold=$threshold: $comp")
    }
  }

  // ---------------------------------------------------------------- J2
  test("similarity join drops and reports oversized blocks (skew guard)") {
    import spark.implicits._
    val df = (1 to 50).map(i => (i.toLong, s"name_$i", if (i <= 40) "hot" else s"b$i"))
      .toDF("id", "name", "blk")
    val res = graft.operators.SimilarityJoin.selfJoin(
      df, "id", blockKey = col("blk"),
      score = (l, r) => lit(100.0), threshold = 50.0, maxBlockSize = 10)
    assert(res.oversizedBlocks.collect().map(_.getString(0)).toSet == Set("hot"))
    // no pair may involve a record from the dropped hot block
    val ids = res.pairs.select("id_l").as[Long].collect() ++
      res.pairs.select("id_r").as[Long].collect()
    assert(ids.forall(_ > 40), s"hot-block ids leaked: ${ids.toSeq}")
  }

  // ---------------------------------------------------------------- A1 (map shape)
  test("map-shaped nest builds company -> issue -> values maps") {
    import spark.implicits._
    val df = Seq(("c1", "i1", 1.0), ("c1", "i2", 2.0), ("c2", "i1", 3.0))
      .toDF("company", "issue", "v")
    val out = graft.operators.EntityOps
      .groupAndNestMap(df, "company", "issue", Seq("v"))
      .collect().map(r => r.getString(0) -> r.getMap[String, org.apache.spark.sql.Row](1)).toMap
    assert(out("c1").keys.toSet == Set("i1", "i2"))
    assert(out("c1")("i2").getDouble(0) == 2.0)
    assert(out("c2")("i1").getDouble(0) == 3.0)
  }

  // ---------------------------------------------------------------- A1
  test("last-wins dedup keeps the row with max order key") {
    import spark.implicits._
    val df = Seq(("c1", "i1", 1.0, 1), ("c1", "i1", 2.0, 2), ("c1", "i2", 3.0, 1))
      .toDF("company", "issue", "v", "seq")
    val out = EntityOps.lastWins(df, Seq("company", "issue"), col("seq"))
      .orderBy("issue").collect()
    assert(out.length == 2)
    assert(out(0).getDouble(2) == 2.0) // i1 keeps seq=2
  }

  // ---------------------------------------------------------------- A6
  test("banding thresholds are [85, 100] high / [75, 85) uncertain / rest low") {
    import spark.implicits._
    val df = Seq(90.0, 85.0, 84.999, 75.0, 74.999, 0.0).toDF("s")
    val got = df.select(EntityOps.band(col("s"))).collect().map(_.getString(0))
    assert(got.toSeq == Seq("high", "high", "uncertain", "uncertain", "low", "low"))
  }

  // ------------------------------------------------------- packing
  test("sequence packing matches the window-cumsum semantics across partitions") {
    import graft.operators.Packing
    import spark.implicits._
    // weights force boundary crossings at budget 10; include an empty doc
    val docs = Seq((1L, 4L), (2L, 7L), (3L, 0L), (4L, 12L), (5L, 3L), (6L, 10L))
      .toDF("id", "wt").repartition(5) // deliberately scrambled layout
    val got = Packing.packSequences(docs, budget = 10L).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.get(3), r.get(4), r.getLong(5)))).toMap
    // offsets: 0, 4, 11, 11, 23, 26; budget-10 sequences
    assert(got(1L) == ((0L, 0L, 0L, 1L)))   // tokens 0..3
    assert(got(2L) == ((4L, 0L, 1L, 2L)))   // tokens 4..10 crosses seq 0->1
    assert(got(3L) == ((11L, null, null, 0L))) // empty doc occupies nothing
    assert(got(4L) == ((11L, 1L, 2L, 2L)))  // tokens 11..22
    assert(got(5L) == ((23L, 2L, 2L, 1L)))
    assert(got(6L) == ((26L, 2L, 3L, 2L)))
  }

  // ------------------------------------------------------- multimodal
  test("frame sampler emits every stride-th frame of the stub frame count") {
    import graft.operators.Multimodal
    import spark.implicits._
    // payload lengths 11 and 19 -> fake frame counts 2 and 10
    val media = Seq(
      Multimodal.MediaRecord(1L, Array.fill[Byte](11)(7), "video/fake"),
      Multimodal.MediaRecord(2L, Array.fill[Byte](19)(7), "video/fake")).toDS()
    val out = Multimodal.sampleFrames(media, stride = 2).collect()
      .groupBy(_.doc_id).view.mapValues(_.map(_.frame_idx).sorted.toSeq).toMap
    assert(out == Map(1L -> Seq(0), 2L -> Seq(0, 2, 4, 6, 8)))
    // digests are per-(payload, idx) deterministic and distinct per frame
    val digests = Multimodal.sampleFrames(media, stride = 1).collect()
      .filter(_.doc_id == 2L).map(_.frame_digest)
    assert(digests.length == 10 && digests.distinct.length == 10)
    intercept[IllegalArgumentException] { Multimodal.sampleFrames(media, stride = 0) }
  }

  test("upsert: updates replace by key, inserts append, orderCol picks last writer") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val base = Seq((1L, "a", 1), (2L, "b", 1), (3L, "c", 1)).toDF("k", "v", "ver")
    val updates = Seq(
      (2L, "b2", 2), (2L, "b3", 3), // same key twice: ver 3 must win
      (4L, "d", 2)).toDF("k", "v", "ver")
    val merged = graft.operators.Merge.upsert(base, updates, Seq("k"),
      orderCol = Some(col("ver")))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getInt(2))).toMap
    assert(merged == Map(
      1L -> ("a", 1), 2L -> ("b3", 3), 3L -> ("c", 1), 4L -> ("d", 2)), merged.toString)
  }

  test("phash stub: token reorder/duplication collide, content change differs") {
    import spark.implicits._
    import graft.operators.Multimodal
    def rec(id: Long, s: String) =
      Multimodal.MediaRecord(id, s.getBytes("UTF-8"), "image/fake")
    val media = Seq(
      rec(1L, "the quick brown fox"),
      rec(2L, "fox QUICK the brown the"), // reorder + dup + case: same canon
      rec(3L, "an entirely different document")).toDS()
    val h = Multimodal.phashStub(media).collect().map(m => m.doc_id -> m.phash).toMap
    assert(h(1L) == h(2L), s"canonicalization must collapse: $h")
    assert(h(1L) != h(3L), s"different content must differ: $h")
  }

  test("applyChangelog: latest op wins — update, delete, resurrect, insert") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("k", "v")
    val changes = Seq(
      (2L, "b2", "U", 1), (2L, "b3", "U", 3), // superseded update: seq 3 wins
      (3L, null: String, "D", 1),             // plain delete
      (4L, null: String, "D", 1), (4L, "d2", "U", 2), // delete then resurrect
      (5L, "e", "U", 1), (5L, null: String, "D", 2),  // insert then delete: net nothing
      (6L, "f", "U", 1)                       // fresh insert
    ).toDF("k", "v", "op", "seq")
    val out = graft.operators.Merge.applyChangelog(base, changes, Seq("k"),
        col("seq"), col("op"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "a", 2L -> "b3", 4L -> "d2", 6L -> "f"), out.toString)
  }

  test("diff joins keys null-safely: identical NULL-keyed rows are not a change") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("k", LongType, nullable = true), StructField("v", StringType)))
    def snap(rows: Seq[Row]) =
      spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
    val a = snap(Seq(Row(null, "x"), Row(1L, "p")))
    val b = snap(Seq(Row(null, "x"), Row(1L, "q")))
    val d = graft.operators.Merge.diff(a, b, Seq("k"), Seq("v"))
      .collect().map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0))) -> r.getString(1))
    assert(d.toSeq == Seq(Some(1L) -> "changed"), d.mkString(","))
    // and a genuinely changed NULL-keyed row still reports
    val b2 = snap(Seq(Row(null, "y"), Row(1L, "p")))
    val d2 = graft.operators.Merge.diff(a, b2, Seq("k"), Seq("v"))
      .collect().map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0))) -> r.getString(1))
    assert(d2.toSeq == Seq(None -> "changed"), d2.mkString(","))
  }

  test("pagerank: probability mass conserved, symmetry respected, hubs win") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // star: 1 is the hub of 2,3,4 (symmetric edges → no dangling mass)
    val star = Seq((1L, 2L), (2L, 1L), (1L, 3L), (3L, 1L), (1L, 4L), (4L, 1L))
      .toDF("src", "dst")
    val pr = graft.operators.PageRank.run(spark, star, iters = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // no dangling nodes → total mass stays exactly 1 per iteration
    assert(math.abs(pr.values.sum - 1.0) < 1e-9, pr.toString)
    assert(pr(2) == pr(3) && pr(3) == pr(4), "leaves are symmetric")
    assert(pr(1) > pr(2), "hub must outrank leaves")
    // triangle: full symmetry → exactly uniform thirds at any iteration
    val tri = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (1L, 3L), (3L, 1L))
      .toDF("src", "dst")
    val uni = graft.operators.PageRank.run(spark, tri, iters = 3)
      .collect().map(_.getDouble(1))
    assert(uni.forall(v => math.abs(v - 1.0 / 3) < 1e-12), uni.mkString(","))
    // empty edge set: no nodes, no 1/0
    val none = graft.operators.PageRank.run(spark, star.limit(0), iters = 3)
    assert(none.count() == 0)
  }

  test("dataset fingerprint: order/partitioning-invariant, mutation-sensitive") {
    import org.apache.spark.sql.functions._
    import graft.operators.Integrity
    val c = graft.core.Tables(spark, sfDir).customer
    val cols = Seq(col("c_custkey"), col("c_name"), col("c_mktsegment"))
    def digest(df: org.apache.spark.sql.DataFrame) =
      Integrity.fingerprint(df, cols, "t").head()

    val base = digest(c)
    // any layout of the same rows digests identically
    assert(digest(c.repartition(17)) == base)
    assert(digest(c.orderBy(desc("c_name"))) == base)
    // a single changed value flips it
    val mutated = c.withColumn("c_name",
      when(col("c_custkey") === 5L, concat(col("c_name"), lit("x")))
        .otherwise(col("c_name")))
    assert(digest(mutated) != base)
    // xor blind spot covered by sum_hash: duplicating a row twice keeps
    // xor unchanged but must still change the digest row
    val dup = c.unionByName(c.limit(1)).unionByName(c.limit(1))
    val d = digest(dup)
    assert(d != base)
    assert(d.getLong(1) == base.getLong(1) + 2) // n_rows
    assert(d.getLong(2) == base.getLong(2), "even duplication xor-cancels by design")
    assert(d.getLong(3) != base.getLong(3), "sum_hash must catch it")
  }

  test("bucket reconcile: identical snapshots are clean; one mutation dirties exactly one bucket") {
    import org.apache.spark.sql.functions._
    import graft.operators.Integrity
    val c = graft.core.Tables(spark, sfDir).customer
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
    // same rows, any layout → zero dirty buckets
    assert(Integrity.bucketReconcile(c, c.repartition(7), Seq("c_custkey")).isEmpty)
    // one changed value → exactly the victim key's bucket, equal counts
    val mutated = c.withColumn("c_name",
      when(col("c_custkey") === 5L, concat(col("c_name"), lit("x")))
        .otherwise(col("c_name")))
    val dirty = Integrity.bucketReconcile(c, mutated, Seq("c_custkey")).collect()
    assert(dirty.length == 1)
    assert(dirty.head.getLong(1) == dirty.head.getLong(2)) // n_a == n_b
    // one deleted row → that bucket's counts differ by one
    val deleted = c.filter(col("c_custkey") =!= 5L)
    val gone = Integrity.bucketReconcile(c, deleted, Seq("c_custkey")).collect()
    assert(gone.length == 1)
    assert(gone.head.getLong(1) == gone.head.getLong(2) + 1)
  }

  test("runningMax: equals the window formulation across partitionings") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rng = new scala.util.Random(11)
    val rows = (1 to 500).map(i => (i.toLong * 3, rng.nextInt(1000).toLong))
    for (nPart <- Seq(1, 4, 13)) {
      val df = rows.toDF("id", "v").repartition(nPart)
      val got = graft.operators.Packing.runningMax(df, "id", "v")
        .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
      var m = Long.MinValue
      for ((id, v) <- rows) {
        m = math.max(m, v)
        assert(got(id) == m, s"id=$id nPart=$nPart")
      }
    }
  }

  test("jsonl quarantine: every line is either parsed or preserved raw") {
    import org.apache.spark.sql.types._
    val tmp = java.nio.file.Files.createTempDirectory("jsonl")
    val f = tmp.resolve("feed.jsonl")
    java.nio.file.Files.write(f, java.util.Arrays.asList(
      """{"id": 1, "text": "ok row"}""",
      """{"id": 2, "text": "also fine"}""",
      """{"id": "NOT_A_NUMBER", "text": "type clash"}""",
      """{"id": 3 "text": "missing comma"}""",
      """{"id": 4, "text": "fine again"}"""))
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("text", StringType)))
    val (good, bad) = graft.sources.JsonlSource.readWithQuarantine(
      spark, f.toString, schema)
    assert(good.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 4L))
    val rawLines = bad.collect().map(_.getString(0))
    assert(rawLines.length == 2, rawLines.mkString("\n"))
    assert(rawLines.exists(_.contains("NOT_A_NUMBER")))
    assert(rawLines.exists(_.contains("missing comma")), "raw evidence preserved")
    // nothing dropped on the floor: good + quarantined == input lines
    assert(good.count() + bad.count() == 5)
  }

  test("zstd jsonl shards decode per-file and keep the full quarantine contract") {
    import org.apache.spark.sql.types._
    val tmp = java.nio.file.Files.createTempDirectory("jsonlzst")
    def shard(name: String, lines: Seq[String]): Unit = {
      val out = new com.github.luben.zstd.ZstdOutputStream(
        java.nio.file.Files.newOutputStream(tmp.resolve(name)))
      out.write((lines.mkString("\n") + "\n").getBytes("UTF-8"))
      out.close()
    }
    // MANY shard files — the splittability contract the reader documents
    shard("a.json.zst", Seq("""{"id": 1, "text": "ok row"}""",
      """{"id": 3 "text": "missing comma"}"""))
    shard("b.json.zst", Seq("""{"id": 2, "text": "also fine"}"""))
    shard("c.json.zst", Seq("""not json at all""",
      """{"id": 4, "text": "fine again"}"""))
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("text", StringType)))
    val (good, bad) = graft.sources.JsonlSource.readZstdWithQuarantine(
      spark, tmp.toString, schema)
    assert(good.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 4L))
    val rawLines = bad.collect().map(_.getString(0))
    assert(rawLines.length == 2, rawLines.mkString("\n"))
    assert(rawLines.exists(_.contains("missing comma")))
    assert(rawLines.exists(_.contains("not json")), "raw evidence preserved")
    assert(good.count() + bad.count() == 5)
  }

  test("jsonl contract audit: valid-JSON contract violations land in the second quarantine") {
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.functions.col
    val tmp = java.nio.file.Files.createTempDirectory("jsonlc")
    java.nio.file.Files.write(tmp.resolve("feed.jsonl"), java.util.Arrays.asList(
      """{"id": 1, "text": "ok row"}""",
      """{"id": null, "text": "null id — valid JSON, violates contract"}""",
      """{"text": "id absent — PERMISSIVE nulls it silently"}""",
      """{"id": 2}""",
      """{"id": 3 "text": "broken syntax"}""",
      """{"id": 4, "text": "fine"}"""))
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("text", StringType)))
    val (good, syntaxQ, contractQ) = graft.sources.JsonlSource.readWithContract(
      spark, tmp.toString, schema,
      col("id").isNotNull && col("text").isNotNull)
    assert(good.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 4L))
    assert(syntaxQ.count() == 1)
    val rendered = contractQ.collect().map(_.getString(0))
    assert(rendered.length == 3, rendered.mkString("\n"))
    // the re-rendered evidence keeps the fields that DID parse — and a
    // NULL-valued contract predicate (null operand) is a violation,
    // never a silent pass into the good frame
    assert(rendered.exists(_.contains("id absent")))
    assert(good.count() + syntaxQ.count() + contractQ.count() == 6)
  }

  test("scd2: runs collapse, change closes, incremental apply == from-scratch") {
    import org.apache.spark.sql.functions._
    import graft.operators.Merge
    import spark.implicits._
    // hand-built log: k=1 has a repeat (collapses), a change, a same-ts
    // tie (tie order decides), and a late revert; k=2 never changes
    val log = Seq(
      (1L, 10L, 1L, "A"), (1L, 20L, 2L, "A"), (1L, 30L, 3L, "B"),
      (1L, 30L, 4L, "C"), (1L, 50L, 5L, "A"),
      (2L, 10L, 6L, "X"), (2L, 40L, 7L, "X"))
      .toDF("k", "ts", "tie", "a")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("k", "attr", "valid_from", "valid_to", "is_current")
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          Option(r.get(3)).map(_.asInstanceOf[Long]), r.getBoolean(4)))
        .toSet
    val hist = rows(Merge.scd2FromHistory(log, "k", col("ts"), col("tie"), col("a")))
    assert(hist == Set(
      (1L, "A", 10L, Some(30L), false), // 10 and 20 collapsed into one run
      (1L, "B", 30L, Some(30L), false), // tie=3 then tie=4 at the same ts
      (1L, "C", 30L, Some(50L), false),
      (1L, "A", 50L, None, true),       // revert opens a NEW run
      (2L, "X", 10L, None, true)), hist.toString)

    // incremental: every split point of the log must rebuild identically
    for (cut <- Seq(20L, 30L, 45L)) {
      val before = log.filter(col("ts") <= cut)
      val batch = log.filter(col("ts") > cut)
      val cur = Merge.scd2FromHistory(before, "k", col("ts"), col("tie"), col("a"))
      val applied = rows(
        Merge.scd2Apply(cur, batch, "k", col("ts"), col("tie"), col("a")))
      assert(applied == hist, s"cut=$cut: $applied")
    }
    // a batch touching NO existing key, and one extending a current run
    val applied2 = rows(Merge.scd2Apply(
      Merge.scd2FromHistory(log, "k", col("ts"), col("tie"), col("a")),
      Seq((3L, 60L, 8L, "N"), (2L, 60L, 9L, "X")).toDF("k", "ts", "tie", "a"),
      "k", col("ts"), col("tie"), col("a")))
    assert(applied2 == hist + ((3L, "N", 60L, None, true)),
      "new key appends; unchanged attr extends the current run: " + applied2)

    // NON-NUMERIC tie column: apply must preserve its native ordering
    // (a narrowing cast would null it out and garble same-ts ordering)
    val slog = Seq((1L, 10L, "e1", "A"), (1L, 30L, "e3", "B"), (1L, 30L, "e4", "C"))
      .toDF("k", "ts", "tie", "a")
    val sHist = rows(Merge.scd2FromHistory(slog, "k", col("ts"), col("tie"), col("a")))
    val sApplied = rows(Merge.scd2Apply(
      Merge.scd2FromHistory(slog.filter(col("ts") <= 10), "k", col("ts"), col("tie"), col("a")),
      slog.filter(col("ts") > 10), "k", col("ts"), col("tie"), col("a")))
    assert(sApplied == sHist, s"string tie: $sApplied vs $sHist")
  }
}
