package graft.queries

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

import graft.core.{Num, Tables}

/** Corpus-mining and skew-hardening queries: a salted two-phase
  * aggregation whose result is bit-identical to the plain GROUP BY it
  * protects, asymmetric set-containment pairs (the subsumption case
  * Jaccard under-scores), pairwise Jensen-Shannon divergence between the
  * per-source unigram distributions, and duplicated-span coverage (the
  * exact-substring memorization-risk metric span-level dedup acts on).
  * House rules: decimal-exact reassociated sums ([[graft.core.Num]]),
  * candidate pairs always bounded by a documented blocking contract,
  * rank outputs carry explicit (metric, id...) tie orders.
  */
object MiningOps {
  import Num._

  // --------------------------------------------------------------------
  // q133: per-user event stats through the SALTED two-phase aggregate
  // (operators.Salt.saltedAgg). AQE splits skewed JOIN partitions but
  // cannot split a single aggregation GROUP — one viral user_id still
  // funnels through one reduce task. The salted shape pre-aggregates on
  // (user, salt) so a hot key fans across `salts` reduce groups, then
  // merges the bounded partials. The oracle is the PLAIN GROUP BY: the
  // query's contract is exactly "salting changes the schedule, never the
  // answer" — counts merge as longs, sums as decimals (associative-exact,
  // so the nondeterministic salt assignment can't leak into the result),
  // max as max.
  private def saltedUserStats(spark: SparkSession, dir: String) = {
    val ev = Tables(spark, dir).events
    graft.operators.Salt
      .saltedAgg(ev, col("user_id"), salts = 16, Seq(
        ("n_events", count(lit(1)), (c: String) => sum(col(c))),
        ("sum_value", sum(col("value").cast(DecimalType(38, 6))),
          (c: String) => sum(col(c)).cast(DoubleType)),
        ("max_value", max(col("value")), (c: String) => max(col(c)))))
      .select(col("key").cast(LongType).as("user_id"),
        col("n_events"), round(col("sum_value"), 6).as("sum_value"),
        col("max_value"))
  }

  private val saltedUserStatsSql: String = s"""
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
           round(${dsumSql("value", 6)}, 6) AS sum_value,
           MAX(value) AS max_value
    FROM events GROUP BY user_id""".trim

  // --------------------------------------------------------------------
  // q134: asymmetric containment pairs — |S(a) ∩ S(b)| / |S(a)| over
  // distinct 5-gram shingle sets. Jaccard (q42) misses subsumption: a
  // 100-token doc fully embedded in a 10,000-token doc scores J ≈ 0.01
  // but containment 1.0 — exactly the quote/aggregation case span-level
  // dedup must catch. Shingles, not tokens: this fixture's (and any
  // template-heavy corpus's) raw vocabulary is tiny and near-universal
  // per doc, so token sets carry no containment signal, while 5-gram
  // shingles explode the effective vocabulary and make sharing mean
  // verbatim overlap. Candidates come ONLY from the posting-list
  // equi-join on shingles with df ∈ [2, 50] (Σ df² ≤ 50·|postings|,
  // never all-pairs). A shingle present in BOTH docs of a pair has
  // df ≥ 2 by construction, so the lower cut loses nothing; the upper
  // cut excludes boilerplate shingles from the numerator by documented
  // contract (they'd otherwise be the entire quadratic cost). The
  // denominator is the FULL distinct-shingle count of the contained
  // side. Docs with < 10 shingles are excluded — tiny sets make the
  // ratio degenerate. Top-20 by (containment, d_sub, d_super).
  private def containmentPairs(spark: SparkSession, dir: String) = {
    val sh = Tables(spark, dir).documents
      .select(col("doc_id"),
        filter(split(lower(trim(col("text"))), "\\s+"),
          x => length(x) > 0).as("tk"))
      .filter(size(col("tk")) >= 5)
      .select(col("doc_id"), explode(array_distinct(
        transform(sequence(lit(1), size(col("tk")) - 4),
          i => concat_ws(" ", slice(col("tk"), i, lit(5)))))).as("s"))
      .localCheckpoint() // df counts + sizes + both join sides read it
    val dfc = sh.groupBy("s").agg(count(lit(1)).as("df"))
      .filter(col("df") >= 2 && col("df") <= 50)
    val w = sh.join(dfc.select("s"), "s")
    val sz = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
      .filter(col("sz") >= 10)
    val inter = w.as("a").join(w.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") =!= col("b.doc_id"))
      .groupBy(col("a.doc_id").as("d_sub"), col("b.doc_id").as("d_super"))
      .agg(count(lit(1)).as("n_common"))
    val scored = inter
      .join(sz.withColumnRenamed("doc_id", "d_sub"), "d_sub")
      .select(col("d_sub"), col("d_super"), col("sz").as("n_sub_shingles"),
        col("n_common"),
        (col("n_common").cast(DoubleType) / col("sz").cast(DoubleType)).as("c0"))
    scored
      .orderBy(col("c0").desc, col("d_sub").asc, col("d_super").asc).limit(20)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("c0").desc, col("d_sub").asc, col("d_super").asc)))
      .select(col("d_sub"), col("d_super"), col("n_sub_shingles"), col("n_common"),
        round(col("c0"), 6).as("containment"), col("rank"))
  }

  private val containmentPairsSql: String = """
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(trim(text)), '\s+'),
                         x -> length(x) > 0) AS tk
      FROM documents),
    sh AS (
      SELECT DISTINCT doc_id, array_to_string(list_slice(tk, i, i + 4), ' ') AS s
      FROM (SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 4)) AS i
            FROM toks WHERE len(tk) >= 5)),
    dfc AS (
      SELECT s FROM sh GROUP BY s
      HAVING COUNT(*) >= 2 AND COUNT(*) <= 50),
    w AS (SELECT doc_id, s FROM sh WHERE s IN (SELECT s FROM dfc)),
    sz AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS sz FROM sh GROUP BY doc_id
      HAVING COUNT(*) >= 10),
    inter AS (
      SELECT a.doc_id AS d_sub, b.doc_id AS d_super,
             CAST(COUNT(*) AS BIGINT) AS n_common
      FROM w a JOIN w b ON a.s = b.s AND a.doc_id <> b.doc_id
      GROUP BY a.doc_id, b.doc_id),
    scored AS (
      SELECT d_sub, d_super, sz AS n_sub_shingles, n_common,
             CAST(n_common AS DOUBLE) / CAST(sz AS DOUBLE) AS c0
      FROM inter JOIN sz ON sz.doc_id = d_sub)
    SELECT d_sub, d_super, n_sub_shingles, n_common,
           round(c0, 6) AS containment, CAST(rn AS INTEGER) AS rank
    FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY c0 DESC, d_sub ASC, d_super ASC) AS rn
          FROM scored)
    WHERE rn <= 20""".trim

  // --------------------------------------------------------------------
  // q135: pairwise Jensen-Shannon divergence between per-source unigram
  // distributions — the mixture dashboard's "how different are my
  // shards" matrix (symmetric, bounded by ln 2, defined even where the
  // vocabularies don't overlap — KL is infinite there). Tokens only in
  // one source contribute p·ln2 to the sum, so the whole divergence
  // reduces to SHARED-token terms plus ln2·(1 − shared probability
  // mass): the plan is one token equi-join between the two distribution
  // tables (bounded by vocabulary, not corpus) and never materializes
  // the union of vocabularies per pair. The source-pair spine is a
  // dimension-sized cross join, so pairs with zero shared tokens still
  // appear (js = ln 2).
  private def jsDivergence(spark: SparkSession, dir: String) = {
    val cnt = Tables(spark, dir).documents
      .select(col("source"),
        explode(filter(split(lower(trim(col("text"))), "\\s+"),
          x => length(x) > 0)).as("token"))
      .groupBy("source", "token").agg(count(lit(1)).as("cnt"))
    val tot = cnt.groupBy("source").agg(sum(col("cnt")).as("n"))
    val dist = cnt.join(broadcast(tot), "source")
      .select(col("source"), col("token"),
        (col("cnt").cast(DoubleType) / col("n").cast(DoubleType)).as("p"))
      .localCheckpoint() // both sides of the pair join read it
    val srcs = tot.select(col("source"))
    val spine = srcs.as("x").join(srcs.as("y"), col("x.source") < col("y.source"))
      .select(col("x.source").as("s1"), col("y.source").as("s2"))
    val pq = col("a.p") + col("b.p")
    val shared = dist.as("a").join(dist.as("b"),
        col("a.token") === col("b.token") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("s1"), col("b.source").as("s2"))
      .agg(count(lit(1)).as("n_shared"),
        dsum(col("a.p") * log(lit(2.0) * col("a.p") / pq), 12).as("t1"),
        dsum(col("b.p") * log(lit(2.0) * col("b.p") / pq), 12).as("t2"),
        dsum(col("a.p"), 12).as("sh1"),
        dsum(col("b.p"), 12).as("sh2"))
    val ln2 = lit(math.log(2.0))
    spine.join(shared, Seq("s1", "s2"), "left")
      .select(col("s1"), col("s2"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"),
        round(
          lit(0.5) * (coalesce(col("t1"), lit(0.0))
            + (lit(1.0) - coalesce(col("sh1"), lit(0.0))) * ln2)
            + lit(0.5) * (coalesce(col("t2"), lit(0.0))
              + (lit(1.0) - coalesce(col("sh2"), lit(0.0))) * ln2),
          6).as("js_divergence"))
  }

  private val jsDivergenceSql: String = s"""
    WITH cnt AS (
      SELECT source, token, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
        SELECT source,
               unnest(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                                  x -> length(x) > 0)) AS token
        FROM documents)
      GROUP BY source, token),
    tot AS (SELECT source, CAST(SUM(cnt) AS BIGINT) AS n FROM cnt GROUP BY source),
    dist AS (
      SELECT cnt.source, token, CAST(cnt AS DOUBLE) / CAST(n AS DOUBLE) AS p
      FROM cnt JOIN tot ON cnt.source = tot.source),
    spine AS (
      SELECT x.source AS s1, y.source AS s2
      FROM tot x JOIN tot y ON x.source < y.source),
    shared AS (
      SELECT a.source AS s1, b.source AS s2, CAST(COUNT(*) AS BIGINT) AS n_shared,
             ${dsumSql("a.p * ln(2.0 * a.p / (a.p + b.p))", 12)} AS t1,
             ${dsumSql("b.p * ln(2.0 * b.p / (a.p + b.p))", 12)} AS t2,
             ${dsumSql("a.p", 12)} AS sh1, ${dsumSql("b.p", 12)} AS sh2
      FROM dist a JOIN dist b ON a.token = b.token AND a.source < b.source
      GROUP BY a.source, b.source)
    SELECT spine.s1, spine.s2,
           COALESCE(n_shared, 0) AS n_shared,
           round(0.5 * (COALESCE(t1, 0.0) + (1.0 - COALESCE(sh1, 0.0)) * ln(2.0))
                 + 0.5 * (COALESCE(t2, 0.0) + (1.0 - COALESCE(sh2, 0.0)) * ln(2.0)),
                 6) AS js_divergence
    FROM spine LEFT JOIN shared ON spine.s1 = shared.s1 AND spine.s2 = shared.s2""".trim

  // --------------------------------------------------------------------
  // q136: declarative data-quality audit over `orders` through
  // [[graft.operators.QualityAudit]] — the Deequ-style constraint gate
  // every ingest runs. One row per constraint with its violation count
  // and verdict; the runner compiles all row-local + uniqueness
  // constraints into ONE aggregate over one scan (adding a constraint
  // adds an expression, not a pass) and the referential check into one
  // distinct-key anti-join against the dimension. Violation-catching
  // (injected nulls/dupes/orphans produce exact counts) is pinned in
  // MiningSpec on a doctored table; on the healthy fixture every
  // constraint passes — which is itself the assertion.
  private def qualityAudit(spark: SparkSession, dir: String) = {
    import graft.operators.QualityAudit._
    val t = Tables(spark, dir)
    run(t.orders, Seq(
      NotNull("o_orderkey"),
      NotNull("o_custkey"),
      Expect("range_o_totalprice_pos", !(col("o_totalprice") > 0.0)),
      Expect("set_o_orderstatus", !col("o_orderstatus").isin("O", "F", "P")),
      Expect("range_o_orderdate",
        !col("o_orderdate").between(lit("1992-01-01"), lit("2005-12-31"))),
      Unique(Seq("o_orderkey")),
      ForeignKey("o_custkey", t.customer, "c_custkey")))
  }

  private val qualityAuditSql: String = """
    WITH base AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v_ck,
             CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v_cu,
             CAST(SUM(CASE WHEN NOT (o_totalprice > 0.0) THEN 1 ELSE 0 END) AS BIGINT) AS v_tp,
             CAST(SUM(CASE WHEN o_orderstatus NOT IN ('O','F','P') THEN 1 ELSE 0 END) AS BIGINT) AS v_st,
             CAST(SUM(CASE WHEN o_orderdate NOT BETWEEN '1992-01-01' AND '2005-12-31'
                           THEN 1 ELSE 0 END) AS BIGINT) AS v_dt,
             CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT) AS v_uq
      FROM orders),
    fkv AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS v FROM (
        SELECT DISTINCT o_custkey FROM orders WHERE o_custkey IS NOT NULL) o
      LEFT JOIN customer ON o_custkey = c_custkey
      WHERE c_custkey IS NULL)
    SELECT 'complete_o_orderkey' AS constraint, n_rows, v_ck AS n_violations, v_ck = 0 AS passed FROM base
    UNION ALL SELECT 'complete_o_custkey', n_rows, v_cu, v_cu = 0 FROM base
    UNION ALL SELECT 'range_o_totalprice_pos', n_rows, v_tp, v_tp = 0 FROM base
    UNION ALL SELECT 'set_o_orderstatus', n_rows, v_st, v_st = 0 FROM base
    UNION ALL SELECT 'range_o_orderdate', n_rows, v_dt, v_dt = 0 FROM base
    UNION ALL SELECT 'unique_o_orderkey', n_rows, v_uq, v_uq = 0 FROM base
    UNION ALL SELECT 'fk_o_custkey', n_rows, v, v = 0 FROM base CROSS JOIN fkv""".trim

  // --------------------------------------------------------------------
  // q137: top-20 adjacent-bigram collocations by PMI — the phrase-mining
  // probe ("new york", "machine learning") that feeds tokenizer vocab
  // and boilerplate detection. All statistics derive from ONE bigram
  // count table: c12 from a per-row array transform (no shuffle until
  // the count), the w1/w2 marginals from two vocab-sized re-aggregations
  // of that table, N = Σc12. Self-consistent by construction — no
  // separate unigram pass to drift against. PMI is the identical IEEE
  // expression tree ln(c12·N/(c1·c2)) on both engines over integer
  // counts, so the ranking is bit-exact. Noise floor: c12 ≥ 5 (a PMI on
  // a count of 1 is an artifact). Rank ties break (pmi, w1, w2); top-20
  // is a distributed sort+limit before the rank window (q76 rule).
  private def pmiCollocations(spark: SparkSession, dir: String) = {
    val tk = Tables(spark, dir).documents
      .select(filter(split(lower(trim(col("text"))), "\\s+"),
        x => length(x) > 0).as("tk"))
      .filter(size(col("tk")) >= 2)
    val big = tk.select(explode(transform(sequence(lit(1), size(col("tk")) - 1),
        i => struct(element_at(col("tk"), i).as("w1"),
          element_at(col("tk"), i + 1).as("w2")))).as("b"))
      .groupBy(col("b.w1").as("w1"), col("b.w2").as("w2"))
      .agg(count(lit(1)).as("c12"))
      .localCheckpoint() // marginals + the scored frame all read it
    val m1 = big.groupBy("w1").agg(sum(col("c12")).as("c1"))
    val m2 = big.groupBy("w2").agg(sum(col("c12")).as("c2"))
    val n = big.agg(sum(col("c12")).as("n"))
    val pmi = log(col("c12").cast(DoubleType) * col("n").cast(DoubleType)
      / (col("c1").cast(DoubleType) * col("c2").cast(DoubleType)))
    big.filter(col("c12") >= 5)
      .join(m1, "w1").join(m2, "w2").crossJoin(broadcast(n))
      .select(col("w1"), col("w2"), col("c12"), col("c1"), col("c2"),
        pmi.as("p0"))
      .orderBy(col("p0").desc, col("w1").asc, col("w2").asc).limit(20)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("p0").desc, col("w1").asc, col("w2").asc)))
      .select(col("w1"), col("w2"), col("c12"), col("c1"), col("c2"),
        round(col("p0"), 6).as("pmi"), col("rank"))
  }

  private val pmiCollocationsSql: String = """
    WITH tk AS (
      SELECT list_filter(string_split_regex(lower(trim(text)), '\s+'),
                         x -> length(x) > 0) AS tk
      FROM documents),
    big AS (
      SELECT tk[i] AS w1, tk[i + 1] AS w2, CAST(COUNT(*) AS BIGINT) AS c12
      FROM (SELECT tk, unnest(generate_series(1, len(tk) - 1)) AS i
            FROM tk WHERE len(tk) >= 2)
      GROUP BY tk[i], tk[i + 1]),
    m1 AS (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1 FROM big GROUP BY w1),
    m2 AS (SELECT w2, CAST(SUM(c12) AS BIGINT) AS c2 FROM big GROUP BY w2),
    n AS (SELECT CAST(SUM(c12) AS BIGINT) AS n FROM big),
    scored AS (
      SELECT w1, w2, c12, c1, c2,
             ln(CAST(c12 AS DOUBLE) * CAST(n AS DOUBLE)
                / (CAST(c1 AS DOUBLE) * CAST(c2 AS DOUBLE))) AS p0
      FROM big JOIN m1 USING (w1) JOIN m2 USING (w2) CROSS JOIN n
      WHERE c12 >= 5)
    SELECT w1, w2, c12, c1, c2, round(p0, 6) AS pmi, CAST(rn AS INTEGER) AS rank
    FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY p0 DESC, w1 ASC, w2 ASC) AS rn
          FROM scored)
    WHERE rn <= 20""".trim

  // --------------------------------------------------------------------
  // q138: duplicated-span coverage — per source, the fraction of 8-token
  // sliding windows whose exact text also occurs in at least one OTHER
  // document. This is the signal exact-substring dedup acts on (long
  // verbatim repeats across documents are what models memorize; doc-level
  // fingerprints q41 and set-level Jaccard q42 both miss a copied
  // paragraph inside otherwise-distinct pages). Span generation is a
  // per-row array transform (no shuffle); the span-keyed distinct-doc
  // count is one token-scale aggregate. Spans join back by their exact
  // text here (oracle-expressible); the 100 TB variant keys the postings
  // by a 128-bit digest of the span — q41's digest contract — which
  // changes key width, not plan shape.
  private def spanDupCoverage(spark: SparkSession, dir: String) = {
    val toks = Tables(spark, dir).documents
      .select(col("doc_id"), col("source"),
        filter(split(lower(trim(col("text"))), "\\s+"),
          x => length(x) > 0).as("tk"))
      .filter(size(col("tk")) >= 8)
    val spans = toks.select(col("doc_id"), col("source"),
      explode(transform(sequence(lit(1), size(col("tk")) - 7),
        i => concat_ws(" ", slice(col("tk"), i, lit(8))))).as("span"))
      .localCheckpoint() // span-doc counts + the per-source rollup read it
    val sd = spans.groupBy("span").agg(countDistinct(col("doc_id")).as("nd"))
    spans.join(sd, "span")
      .groupBy("source")
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("total_spans"),
        sum(when(col("nd") >= 2, 1L).otherwise(0L)).as("dup_spans"))
      .select(col("source"), col("n_docs"), col("total_spans"), col("dup_spans"),
        round(col("dup_spans").cast(DoubleType)
          / col("total_spans").cast(DoubleType), 6).as("dup_ratio"))
  }

  private val spanDupCoverageSql: String = """
    WITH toks AS (
      SELECT doc_id, source,
             list_filter(string_split_regex(lower(trim(text)), '\s+'),
                         x -> length(x) > 0) AS tk
      FROM documents),
    ok AS (SELECT * FROM toks WHERE len(tk) >= 8),
    spans AS (
      SELECT doc_id, source, array_to_string(list_slice(tk, i, i + 7), ' ') AS span
      FROM (SELECT doc_id, source, tk,
                   unnest(generate_series(1, len(tk) - 7)) AS i
            FROM ok)),
    sd AS (SELECT span, COUNT(DISTINCT doc_id) AS nd FROM spans GROUP BY span)
    SELECT source, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS total_spans,
           CAST(SUM(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS dup_spans,
           round(CAST(SUM(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS dup_ratio
    FROM spans JOIN sd USING (span)
    GROUP BY source""".trim

  // --------------------------------------------------------------------
  // q140: frequent 3-step behavior paths — top-10 event-type trigrams
  // over each user's time-ordered stream, the sequential-pattern sequel
  // to q89's 2-step transition matrix (a Markov chain can't distinguish
  // view→cart→buy from view→cart→abandon; the trigram table can). One
  // shuffle orders each user's timeline (two lag windows over the SAME
  // (user, ts, event_id) sort — Spark computes both in one Window
  // operator), then one agg over ≤ |types|³ groups. Per-user state never
  // leaves its partition; top-10 is a distributed sort+limit before the
  // rank window (q76 rule).
  private def pathTrigrams(spark: SparkSession, dir: String) = {
    val ev = Tables(spark, dir).events
      .withColumn("ms", unix_millis(col("ts").cast("timestamp")))
    val w = Window.partitionBy("user_id")
      .orderBy(col("ms").asc, col("event_id").asc)
    ev.withColumn("p1", lag(col("event_type"), 1).over(w))
      .withColumn("p2", lag(col("event_type"), 2).over(w))
      .filter(col("p2").isNotNull)
      .groupBy(col("p2").as("s1"), col("p1").as("s2"),
        col("event_type").as("s3"))
      .agg(count(lit(1)).as("n_paths"))
      .orderBy(col("n_paths").desc, col("s1").asc, col("s2").asc, col("s3").asc)
      .limit(10)
      .withColumn("rank", row_number().over(Window.orderBy(
        col("n_paths").desc, col("s1").asc, col("s2").asc, col("s3").asc)))
  }

  private val pathTrigramsSql: String = """
    WITH t AS (
      SELECT user_id, event_id, event_type, epoch_ms(ts) AS ms,
             LAG(event_type, 1) OVER (PARTITION BY user_id
               ORDER BY epoch_ms(ts) ASC, event_id ASC) AS p1,
             LAG(event_type, 2) OVER (PARTITION BY user_id
               ORDER BY epoch_ms(ts) ASC, event_id ASC) AS p2
      FROM events),
    c AS (
      SELECT p2 AS s1, p1 AS s2, event_type AS s3,
             CAST(COUNT(*) AS BIGINT) AS n_paths
      FROM t WHERE p2 IS NOT NULL
      GROUP BY p2, p1, event_type)
    SELECT s1, s2, s3, n_paths, CAST(rn AS INTEGER) AS rank
    FROM (SELECT *, ROW_NUMBER() OVER (
            ORDER BY n_paths DESC, s1 ASC, s2 ASC, s3 ASC) AS rn
          FROM c)
    WHERE rn <= 10""".trim

  // --------------------------------------------------------------------
  // q141: per-source Gini of document lengths — the inequality scalar a
  // mixture dashboard tracks per shard (0 = uniform lengths, → 1 = a few
  // giant docs own the shard; a drift here means the source's scraping
  // or chunking changed). Exact rank formula G = (2·Σ i·xᵢ)/(n·Σx) −
  // (n+1)/n over the (n_chars, doc_id)-sorted ranks: ALL sums are
  // integer (rank × chars fits a long at any realistic shard size), so
  // only the final division is IEEE — the same expression tree on both
  // engines, bit-exact. The rank windows shuffle on the source key and
  // parallelize across sources; a single 100 TB-scale source would use
  // the two-pass range-partitioned prefix-scan (operators.Packing's
  // shape) instead of one source-keyed window task — documented scale
  // path, same numbers.
  private def giniLengths(spark: SparkSession, dir: String) = {
    val docs = Tables(spark, dir).documents
      .select(col("source"), col("doc_id"), col("n_chars"))
    val w = Window.partitionBy("source")
      .orderBy(col("n_chars").asc, col("doc_id").asc)
    val nD = col("n").cast(DoubleType)
    docs.withColumn("i", row_number().over(w))
      .groupBy("source")
      .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("tot"),
        sum(col("i").cast(LongType) * col("n_chars")).as("six"))
      .select(col("source"), col("n").as("n_docs"), col("tot").as("total_chars"),
        round(lit(2.0) * col("six").cast(DoubleType)
          / (nD * col("tot").cast(DoubleType))
          - (nD + lit(1.0)) / nD, 6).as("gini"))
  }

  private val giniLengthsSql: String = """
    WITH r AS (
      SELECT source, n_chars,
             ROW_NUMBER() OVER (PARTITION BY source
               ORDER BY n_chars ASC, doc_id ASC) AS i
      FROM documents),
    s AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(n_chars) AS BIGINT) AS tot,
             CAST(SUM(i * n_chars) AS BIGINT) AS six
      FROM r GROUP BY source)
    SELECT source, n AS n_docs, tot AS total_chars,
           round(2.0 * CAST(six AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(tot AS DOUBLE))
                 - (CAST(n AS DOUBLE) + 1.0) / CAST(n AS DOUBLE), 6) AS gini
    FROM s""".trim

  // --------------------------------------------------------------------
  // q143: last-touch attribution — each purchase is credited to the SAME
  // user's most recent preceding engagement event (click or view) within
  // 1 hour, the canonical conversion-attribution rule. One window per
  // user timeline (the q89/q140 sort) carrying the last engagement
  // forward as a (ms, event_id, type) struct with IGNORE NULLS — the
  // struct keeps the three fields from the SAME row even under
  // same-millisecond ties, where three independent carry columns could
  // mix rows. Purchases outside the hour (or with no prior engagement)
  // land in the 'none' bucket, so the rollup partitions ALL purchases:
  // Σ n_purchases is an invariant the spec pins. Mean gap is
  // decimal-exact; the rollup is ≤ 3 rows.
  private def lastTouch(spark: SparkSession, dir: String) = {
    val ev = Tables(spark, dir).events
      .withColumn("ms", unix_millis(col("ts").cast("timestamp")))
    val w = Window.partitionBy("user_id")
      .orderBy(col("ms").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val eng = when(col("event_type").isin("click", "view"),
      struct(col("ms"), col("event_id"), col("event_type")))
    ev.withColumn("prev", last(eng, ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("ms"), col("prev"),
        (col("ms") - col("prev.ms")).as("gap_ms"))
      .select(when(col("prev").isNotNull && col("gap_ms") <= 3600000L,
        col("prev.event_type")).otherwise(lit("none")).as("attributed_type"),
        col("gap_ms"))
      .groupBy("attributed_type")
      .agg(count(lit(1)).as("n_purchases"),
        round(when(col("attributed_type") =!= "none",
          dsum(col("gap_ms").cast(DoubleType), 2)
            / count(lit(1)).cast(DoubleType)), 2).as("avg_gap_ms"))
  }

  private val lastTouchSql: String = """
    WITH t AS (
      SELECT user_id, event_id, event_type, epoch_ms(ts) AS ms,
             LAST_VALUE(CASE WHEN event_type IN ('click', 'view')
                             THEN struct_pack(pms := epoch_ms(ts),
                                              pid := event_id,
                                              pty := event_type)
                        END IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY epoch_ms(ts) ASC, event_id ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev
      FROM events),
    p AS (
      SELECT CASE WHEN prev IS NOT NULL AND ms - prev['pms'] <= 3600000
                  THEN prev['pty'] ELSE 'none' END AS attributed_type,
             ms - prev['pms'] AS gap_ms
      FROM t WHERE event_type = 'purchase')
    SELECT attributed_type, CAST(COUNT(*) AS BIGINT) AS n_purchases,
           round(CASE WHEN attributed_type <> 'none'
                      THEN CAST(SUM(CAST(gap_ms AS DECIMAL(38,2))) AS DOUBLE)
                           / CAST(COUNT(*) AS DOUBLE) END, 2) AS avg_gap_ms
    FROM p GROUP BY attributed_type""".trim

  // --------------------------------------------------------------------
  // q144: edit-distance variant mining through the ENGINE'S SQL SURFACE
  // — the query text is plain SQL (`levenshtein(a, b) BETWEEN 1 AND 3`
  // over adjective-blocked name pairs) executed on a session with
  // `GraftExtensions.register` applied, so the SimilarityPrefilter
  // optimizer rule injects the |len(a)-len(b)| <= 3 prebound
  // automatically (PrefilterRuleSpec asserts the guard in this exact
  // plan). Two scale moves, both in the SQL itself:
  //  - DISTINCT-COLLAPSE FIRST (q42's identical-set move): p_name is
  //    Zipf-heavy (20k rows, 64 distinct names at sf0.1), so the DP
  //    runs on distinct names with a MIN-partkey representative and a
  //    per-name support count — kernel cost ∝ vocabulary², never
  //    corpus rows (a raw-key formulation of this query measured 88 s
  //    at sf0.1; this one is sub-second).
  //  - candidates only from the first-word blocking equi-join (names
  //    are "<adjective> <noun>"), keyed rep_a < rep_b — never
  //    all-pairs.
  // dist >= 1 drops identical names (exact dedup's job, q40's family);
  // pair_support = n_parts(a)·n_parts(b) is how many raw pairs each
  // variant pair stands for. Top-100 under the (dist, name_a, name_b)
  // total order so the LIMIT is deterministic. The DuckDB twin is the
  // IDENTICAL query text — the point of staying in ANSI SQL.
  private def levBandPairs(spark: SparkSession, dir: String) = {
    graft.GraftExtensions.register(spark)
    Tables(spark, dir).part.createOrReplaceTempView("graft_q144_part")
    spark.sql(levBandPairsBody("graft_q144_part"))
  }

  private def levBandPairsBody(table: String): String = s"""
    WITH names AS (
      SELECT p_name, MIN(p_partkey) AS rep_id, COUNT(*) AS n_parts
      FROM $table GROUP BY p_name)
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           levenshtein(a.p_name, b.p_name) AS dist,
           a.n_parts * b.n_parts AS pair_support
    FROM names a JOIN names b
      ON substring(a.p_name, 1, instr(a.p_name, ' ')) =
         substring(b.p_name, 1, instr(b.p_name, ' '))
     AND a.rep_id < b.rep_id
    WHERE levenshtein(a.p_name, b.p_name) BETWEEN 1 AND 3
    ORDER BY dist, name_a, name_b
    LIMIT 100""".trim

  // --------------------------------------------------------------------
  // q161: q144's move for the INDEL tier — the query text is plain SQL
  // with `indel_ratio(a, b) >= 65.0` (the engine's custom codegen'd
  // expression through the SQL surface), so the SimilarityPrefilter
  // optimizer rule — not a hand-written guard — injects the length-gap
  // prebound that makes the DP feasible; PrefilterRuleSpec asserts the
  // injected conjunct in THIS query's optimized plan. One template,
  // two renderings: the engine side renders `sim` as indel_ratio, the
  // oracle side as Similarity.indelRatioSql's LCS-fold twin — the same
  // bit-identical double, so ORDER BY sim cross-engine-stable (the
  // (name_a, name_b) tie-break covers equal scores). Distinct-name
  // collapse + first-word blocking as in q144: kernel cost ∝ vocab².
  private def indelSqlPairsBody(table: String, sim: (String, String) => String): String = s"""
    WITH names AS (
      SELECT p_name, MIN(p_partkey) AS rep_id, COUNT(*) AS n_parts
      FROM $table GROUP BY p_name)
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           ${sim("a.p_name", "b.p_name")} AS sim,
           a.n_parts * b.n_parts AS pair_support
    FROM names a JOIN names b
      ON substring(a.p_name, 1, instr(a.p_name, ' ')) =
         substring(b.p_name, 1, instr(b.p_name, ' '))
     AND a.rep_id < b.rep_id
    WHERE ${sim("a.p_name", "b.p_name")} >= 65.0
    ORDER BY sim DESC, name_a, name_b
    LIMIT 100""".trim

  private def indelSqlPairs(spark: SparkSession, dir: String) = {
    graft.GraftExtensions.register(spark)
    Tables(spark, dir).part.createOrReplaceTempView("graft_q161_part")
    spark.sql(indelSqlPairsBody("graft_q161_part",
      (a, b) => s"indel_ratio($a, $b)"))
  }

  // --------------------------------------------------------------------
  // q146: blocking-scheme evaluation — the entity-resolution
  // meta-metric pair for q25's brand blocking: REDUCTION RATIO
  // (1 − candidates/all-pairs: how much of the quadratic pair space the
  // blocking discards) and PAIRS COMPLETENESS (captured/all true
  // matches at levRatio ≥ 70: how many real matches survive the
  // discard). This is the harness that justifies — or indicts — a
  // blocking key before a 100 TB linkage run; on this fixture it
  // reports RR ≈ 0.96, PC ≈ 0.04: brand blocking is cheap and captures
  // only same-brand duplicates, which IS q25's reference contract
  // (same-brand dedup), but would be the wrong key for brand-blind
  // matching — exactly the trade the metric exists to expose.
  //
  // Scale shape: every count is computed in COLLAPSED space — name
  // counts (64 distinct), (brand, name) counts (≤ 8·64), brand sizes
  // (8) — so "all pairs" is pure integer arithmetic (Σ n·(n−1)/2,
  // n·m supports), and the only pair JOIN is the bounded 64×64
  // distinct-name triangle (the q53 ≤-bounded-triangular rule; at
  // larger vocabularies the true-match side would switch to the q42
  // PPJoin candidates). One corpus scan feeds all three aggregates
  // (pinned projection); the two ratios are the only IEEE divisions,
  // over identical BIGINTs on both engines.
  private val pcThreshold = 70.0

  private def blockingQuality(spark: SparkSession, dir: String) = {
    val p = Tables(spark, dir).part
      .select(col("p_brand"), col("p_name")).localCheckpoint()
    val nRows = p.count()
    val names = p.groupBy("p_name").agg(count(lit(1)).as("n")).localCheckpoint()
    val bn = p.groupBy("p_brand", "p_name").agg(count(lit(1)).as("n"))
      .localCheckpoint()
    def levOk(a: Column, b: Column): Column =
      lit(100.0) * (lit(1.0) -
        levenshtein(a, b).cast(DoubleType) /
          greatest(length(a), length(b)).cast(DoubleType)) >= pcThreshold
    // true matches: identical-name pairs (sim 100 by definition) plus
    // the distinct-name triangle at the threshold, expanded by support
    val sameName = names.agg(
      coalesce(sum(expr("n * (n - 1) div 2")), lit(0L)).as("s"))
    val crossName = names.as("a").join(names.as("b"),
        col("a.p_name") < col("b.p_name") &&
          levOk(col("a.p_name"), col("b.p_name")))
      .agg(coalesce(sum(col("a.n") * col("b.n")), lit(0L)).as("s"))
    // captured: the same two terms inside a brand block
    val sameBn = bn.agg(
      coalesce(sum(expr("n * (n - 1) div 2")), lit(0L)).as("s"))
    val crossBn = bn.as("a").join(bn.as("b"),
        col("a.p_brand") === col("b.p_brand") &&
          col("a.p_name") < col("b.p_name") &&
          levOk(col("a.p_name"), col("b.p_name")))
      .agg(coalesce(sum(col("a.n") * col("b.n")), lit(0L)).as("s"))
    val candidates = p.groupBy("p_brand").agg(count(lit(1)).as("c"))
      .agg(coalesce(sum(expr("c * (c - 1) div 2")), lit(0L)).as("s"))
    val get = (df: org.apache.spark.sql.DataFrame) => df.head.getLong(0)
    val (truePairs, captured, cand) =
      (get(sameName) + get(crossName), get(sameBn) + get(crossBn), get(candidates))
    // guard, don't wrap: past ~4.29e9 rows the pair count exceeds a
    // signed long and plain Scala arithmetic would wrap SILENTLY into a
    // negative total (and a reduction ratio outside [0,1]); the oracle
    // side would widen to HUGEINT and diverge. Fail loudly instead.
    val totalPairsBig = (BigInt(nRows) * BigInt(nRows - 1)) / 2
    require(totalPairsBig.isValidLong,
      s"blockingQuality: $nRows rows -> $totalPairsBig pairs overflows a long")
    val totalPairs = totalPairsBig.toLong
    import spark.implicits._
    Seq((nRows, totalPairs, cand, truePairs, captured)).toDF(
      "n_rows", "total_pairs", "candidate_pairs", "true_pairs", "captured_true")
      .select(col("*"),
        (lit(1.0) - col("candidate_pairs").cast(DoubleType)
          / col("total_pairs").cast(DoubleType)).as("reduction_ratio"),
        (col("captured_true").cast(DoubleType)
          / col("true_pairs").cast(DoubleType)).as("pairs_completeness"))
  }

  private val blockingQualitySql: String = {
    val lev = (a: String, b: String) => s"""
      100.0 * (1.0 - CAST(levenshtein($a, $b) AS DOUBLE)
               / CAST(greatest(length($a), length($b)) AS DOUBLE)) >= $pcThreshold"""
    s"""
    WITH src AS (SELECT p_brand, p_name FROM part),
    tot AS (SELECT COUNT(*) AS n_rows FROM src),
    names AS (SELECT p_name, COUNT(*) AS n FROM src GROUP BY p_name),
    bn AS (SELECT p_brand, p_name, COUNT(*) AS n FROM src GROUP BY p_brand, p_name),
    same_name AS (SELECT COALESCE(SUM(n * (n - 1) // 2), 0) AS s FROM names),
    cross_name AS (SELECT COALESCE(SUM(a.n * b.n), 0) AS s
                   FROM names a JOIN names b
                     ON a.p_name < b.p_name AND ${lev("a.p_name", "b.p_name")}),
    same_bn AS (SELECT COALESCE(SUM(n * (n - 1) // 2), 0) AS s FROM bn),
    cross_bn AS (SELECT COALESCE(SUM(a.n * b.n), 0) AS s
                 FROM bn a JOIN bn b
                   ON a.p_brand = b.p_brand AND a.p_name < b.p_name
                  AND ${lev("a.p_name", "b.p_name")}),
    cand AS (SELECT COALESCE(SUM(c * (c - 1) // 2), 0) AS s
             FROM (SELECT COUNT(*) AS c FROM src GROUP BY p_brand))
    SELECT CAST(n_rows AS BIGINT) AS n_rows,
           CAST(n_rows * (n_rows - 1) // 2 AS BIGINT) AS total_pairs,
           CAST(cand.s AS BIGINT) AS candidate_pairs,
           CAST(same_name.s + cross_name.s AS BIGINT) AS true_pairs,
           CAST(same_bn.s + cross_bn.s AS BIGINT) AS captured_true,
           1.0 - CAST(cand.s AS DOUBLE)
             / CAST(n_rows * (n_rows - 1) // 2 AS DOUBLE) AS reduction_ratio,
           CAST(same_bn.s + cross_bn.s AS DOUBLE)
             / CAST(same_name.s + cross_name.s AS DOUBLE) AS pairs_completeness
    FROM tot, same_name, cross_name, same_bn, cross_bn, cand""".trim
  }

  // --------------------------------------------------------------------
  // q156: multi-touch LINEAR attribution — q143's last-touch sibling:
  // each purchase splits its credit equally across ALL the same user's
  // click/view touches in the strictly-preceding 24 h (same-ms touches
  // excluded by the RANGE frame's -1 upper bound), purchases with no
  // touch credit 'none' in full. Touch counts come from ONE
  // user-partitioned RANGE window (two conditional sums — the q91
  // frame); the per-purchase shares n_t/n are IEEE divisions of
  // identical longs, and the cross-purchase credit sum takes the q135
  // discipline (round each share to 12, decimal-sum, round the total
  // to 6) because rationals with varying denominators have no exact
  // decimal representation. One shuffle + one ≤3-group agg.
  private def linearTouch(spark: SparkSession, dir: String) = {
    val ev = Tables(spark, dir).events
      .withColumn("ms", unix_millis(col("ts")))
    val w = Window.partitionBy("user_id").orderBy(col("ms"))
      .rangeBetween(-86400000L, -1L)
    // an EMPTY frame (no same-user event in the preceding 24 h) makes
    // SUM OVER return NULL, not 0 — uncoalesced, such purchases would
    // fall through ALL three branches and silently vanish from the
    // attribution (caught by the conservation check below, not by the
    // oracle: both engines would drop the same rows)
    val p = ev
      .withColumn("cl", coalesce(
        sum(when(col("event_type") === "click", 1L).otherwise(0L)).over(w), lit(0L)))
      .withColumn("vw", coalesce(
        sum(when(col("event_type") === "view", 1L).otherwise(0L)).over(w), lit(0L)))
      .filter(col("event_type") === "purchase")
      .select(col("cl"), col("vw"), (col("cl") + col("vw")).as("n"))
      .localCheckpoint() // three UNION branches read it
    def branch(t: String, c: Column) = p.filter(c > 0)
      .select(lit(t).as("attributed_type"),
        (c.cast(DoubleType) / col("n").cast(DoubleType)).as("share"))
    branch("click", col("cl"))
      .unionByName(branch("view", col("vw")))
      .unionByName(p.filter(col("n") === 0)
        .select(lit("none").as("attributed_type"), lit(1.0).as("share")))
      .groupBy("attributed_type")
      .agg(count(lit(1)).as("n_terms"), round(dsum(col("share"), 12), 6).as("credit"))
  }

  private val linearTouchSql: String = s"""
    WITH e AS (SELECT user_id, event_type, epoch_ms(ts) AS ms FROM events),
    p AS (
      SELECT cl, vw, cl + vw AS n FROM (
        SELECT event_type,
               COALESCE(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) OVER w, 0) AS cl,
               COALESCE(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) OVER w, 0) AS vw
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY ms
                     RANGE BETWEEN 86400000 PRECEDING AND 1 PRECEDING))
      WHERE event_type = 'purchase'),
    terms AS (
      SELECT 'click' AS attributed_type,
             CAST(cl AS DOUBLE) / CAST(n AS DOUBLE) AS share FROM p WHERE cl > 0
      UNION ALL
      SELECT 'view', CAST(vw AS DOUBLE) / CAST(n AS DOUBLE) FROM p WHERE vw > 0
      UNION ALL
      SELECT 'none', 1.0 FROM p WHERE n = 0)
    SELECT attributed_type, CAST(COUNT(*) AS BIGINT) AS n_terms,
           round(${dsumSql("share", 12)}, 6) AS credit
    FROM terms GROUP BY attributed_type""".trim

  def all: Seq[GraftQuery] = Seq(
    GraftQuery("q133_salted_user_stats", Some(saltedUserStatsSql), saltedUserStats),
    GraftQuery("q134_containment_pairs", Some(containmentPairsSql), containmentPairs),
    GraftQuery("q135_js_divergence", Some(jsDivergenceSql), jsDivergence),
    GraftQuery("q136_quality_audit", Some(qualityAuditSql), qualityAudit),
    GraftQuery("q137_pmi_collocations", Some(pmiCollocationsSql), pmiCollocations),
    GraftQuery("q138_span_dedup", Some(spanDupCoverageSql), spanDupCoverage),
    GraftQuery("q140_path_trigrams", Some(pathTrigramsSql), pathTrigrams),
    GraftQuery("q141_gini_lengths", Some(giniLengthsSql), giniLengths),
    GraftQuery("q143_last_touch", Some(lastTouchSql), lastTouch),
    GraftQuery("q144_lev_band_pairs", Some(levBandPairsBody("part")), levBandPairs),
    GraftQuery("q161_indel_sql_pairs",
      Some(indelSqlPairsBody("part",
        (a, b) => graft.functions.Similarity.indelRatioSql(a, b))),
      indelSqlPairs),
    GraftQuery("q146_blocking_quality", Some(blockingQualitySql), blockingQuality),
    GraftQuery("q156_linear_touch", Some(linearTouchSql), linearTouch))
}
