package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{Coercions, RoleResolver}
import graft.functions.Similarity
import graft.operators.{ConnectedComponents, EntityOps, SimilarityJoin}

/** The executive entity-resolution pipeline (reference 3.2,
  * `/root/reference/executive_review_tool.py:607-712`) as a distributed
  * plan:
  *
  * scan → role binding w/ name fallback (P1) → normalization (F1) →
  * stable ids → blocked weighted-similarity self-join (J2/F4-F6) →
  * connected-components clustering (A4, deterministic replacement for the
  * reference's order-dependent greedy) → per-cluster average similarity
  * (A5, reusing the join's edge scores instead of recomputing like the
  * reference's second O(k²) pass) → confidence banding (A6) →
  * consolidation (A7/A8/F11/P9) → sanitized person keys (F8) + company
  * link fan-out (J4). The review gate is the `approved` parameter (P7):
  * 'high'-band clusters auto-approve; 'uncertain' ones pass only if listed.
  */
object ExecutiveDedupPipeline {
  import RoleResolver.Role

  /** Role binding per `executive_review_tool.py:252-272` (substring
    * match, optional roles fall back to the name column). */
  def roles(nameFallback: String): Seq[Role] = Seq(
    Role("name", Seq("name", "executive_name", "person_name", "full_name", "exec_name"),
      substrings = Seq("name")),
    Role("title", Seq("title", "job_title", "position", "role", "job", "exec_title"),
      substrings = Seq("title"), required = false, fallback = Some(nameFallback)),
    Role("address", Seq("address", "location", "city", "state", "street", "mailing_address"),
      substrings = Seq("address"), required = false, fallback = Some(nameFallback)),
    Role("company", Seq("company", "company_name", "employer", "organization", "firm"),
      substrings = Seq("company"), required = false, fallback = Some(nameFallback)))

  final case class Result(
      /** (id, name, title, address, company, component) cluster assignment */
      clustered: DataFrame,
      /** per-cluster avg similarity + band + member count (A5/A6) */
      bands: DataFrame,
      /** consolidated person docs for approved clusters (A8) */
      persons: DataFrame,
      /** exploded (company_key, person_key) link rows (J4/F8) */
      links: DataFrame,
      /** 'uncertain' clusters — the human-review export set */
      reviewQueue: DataFrame)

  /** Default block: first character of the token-sorted normalized name +
    * name length bucket. Cheap, stable under token reordering ("Smith,
    * John" vs "John Smith"); callers with other corpora inject their own.
    */
  def defaultBlock: Column =
    concat(
      substring(Similarity.tokenSortKey(col("name")), 1, 1),
      (length(col("name")) / 8).cast("int").cast("string"))

  def run(
      spark: SparkSession,
      executives: DataFrame,
      threshold: Double = 75.0,
      highBand: Double = 85.0,
      approved: Set[Long] = Set.empty,
      blockKey: Column = defaultBlock): Result = {

    // ---- role binding + normalization; stable ids by sorted identity
    val nameCol = RoleResolver.resolve(executives.schema, Seq(roles("").head))("name")
    val bound = RoleResolver.project(executives, roles(nameCol))
    val normalized = bound.select(
      Coercions.normalizeString(col("name")).as("name"),
      Coercions.normalizeString(col("title")).as("title"),
      Coercions.normalizeString(col("address")).as("address"),
      Coercions.normalizeString(col("company")).as("company"))
      .filter(col("name") =!= "")
    // stable ids from a distributed sort + zipWithIndex — a global
    // row_number window would funnel every row through ONE task; the sort
    // is range-partitioned and zipWithIndex is two light passes. Ties
    // (fully identical records) get interchangeable ids, which downstream
    // clustering/consolidation is insensitive to.
    val sorted = normalized.orderBy("name", "title", "address", "company")
    val ids = spark.createDataFrame(
      sorted.rdd.zipWithIndex.map { case (r, i) =>
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ (i + 1L))
      },
      sorted.schema.add("id", org.apache.spark.sql.types.LongType))
      // pin ONE id assignment: downstream consumes ids in five places and
      // replays would re-run the sort (ties could land different ids)
      .localCheckpoint()

    // ---- blocked weighted similarity join (weights per reference :199-231;
    // company is scored with plain indel ratio — the reference uses
    // fuzz.ratio for that one field (`executive_review_tool.py:229`) while
    // the other three use fuzz.token_sort_ratio)
    val joined = SimilarityJoin.selfJoin(
      ids, "id",
      blockKey = blockKey,
      score = (l, r) => Similarity.weightedSimilarity(Seq(
        Similarity.WeightedField(l("name"), r("name"), 0.5, Similarity.tokenSortRatio),
        Similarity.WeightedField(l("address"), r("address"), 0.25, Similarity.tokenSortRatio),
        Similarity.WeightedField(l("title"), r("title"), 0.15, Similarity.tokenSortRatio),
        Similarity.WeightedField(l("company"), r("company"), 0.1, Similarity.indelRatio))),
      threshold = threshold)
    val edges = joined.pairs
      .select(col("id_l").as("src"), col("id_r").as("dst"), col("sim"))
      .localCheckpoint() // reused by clustering + banding; no unpersist bookkeeping

    // ---- clustering + cluster metrics
    val comp = ConnectedComponents.run(spark, edges.select("src", "dst"))
    val clustered = ids.join(comp, ids("id") === comp("id"), "left")
      .select(ids("id"), col("name"), col("title"), col("address"), col("company"),
        coalesce(col("component"), ids("id")).as("component"))

    val bands = edges.join(comp, edges("src") === comp("id"))
      .groupBy("component")
      .agg(avg("sim").as("avg_sim"), count(lit(1)).as("n_edges"))
      .join(clustered.groupBy("component").agg(count(lit(1)).as("n_members")), "component")
      .filter(col("n_members") > 1) // P8: singletons are not groups
      .withColumn("band", EntityOps.band(col("avg_sim"), highBand, threshold))

    // ---- approval gate as data (P7)
    val approvedClusters = bands.filter(
      col("band") === "high" ||
        (col("band") === "uncertain" && col("component").isin(approved.toSeq: _*)))
    val reviewQueue = bands.filter(col("band") === "uncertain")

    // ---- consolidation (A7/A8) over approved clusters
    val members = clustered.join(approvedClusters.select("component"), "component")
    val persons = members
      .groupBy("component")
      .agg(
        max_by(struct(col("name"), col("title"), col("address"), col("company")),
          EntityOps.bestRecordScore(
            Seq(col("name"), col("title"), col("address"), col("company")), col("id")))
          .as("best"),
        sort_array(collect_set(
          when(lower(trim(col("title"))).isNotNull &&
            !lower(trim(col("title"))).isin("", "nan", "none"), col("title"))))
          .as("titles"), // P9 filter inside the set
        sort_array(collect_set(col("company"))).as("companies"), // A7
        sort_array(collect_list(col("name"))).as("all_variations"),
        count(lit(1)).as("grouped_from"))
      .select(
        col("component"),
        Coercions.sanitizeKey(col("best.name")).as("person_key"), // F8
        col("best.name").as("name"),
        col("best.address").as("address"),
        col("titles"), col("companies"), col("all_variations"), col("grouped_from"))

    // ---- link fan-out (J4)
    val links = persons.select(
      col("person_key"),
      explode(col("companies")).as("company"))
      .select(Coercions.sanitizeKey(col("company")).as("company_key"), col("person_key"))

    Result(clustered, bands, persons, links, reviewQueue)
  }
}
