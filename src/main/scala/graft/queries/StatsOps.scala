package graft.queries

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.core.{Num, Tables}

/** Statistical data-quality probes over the corpus and the sales tables:
  * closed-form trend regression, per-source token entropy, MAD-robust
  * outlier detection, and sparse TF-IDF cosine near-duplicate pairs.
  * House rules apply throughout: every reassociated double sum goes
  * through the decimal-exact [[graft.core.Num]] helpers, medians are
  * rank-based (engine-independent integer logic, no interpolation
  * formula to disagree on), and candidate pair generation is always
  * bounded by a documented blocking contract — never all-pairs.
  */
object StatsOps {
  import Num._

  // --------------------------------------------------------------------
  // q127: per-nation revenue trend — ordinary least squares of monthly
  // revenue against the month index, closed form. The per-(nation,
  // month) revenue roll-up is one map-side-combined aggregate; the
  // regression reduces 25 nations × ~n months to five decimal-exact
  // sums per nation, so slope/intercept are the same IEEE expression
  // tree on both engines. x (month index) and Σx/Σx² are exact longs;
  // only y carries a decimal cast. The 100 TB cost is the fact-table
  // scan; everything after the first aggregate is dimension-sized.
  private def salesTrend(spark: SparkSession, dir: String) = {
    val t = Tables(spark, dir)
    val rev = t.lineitem
      .join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .join(t.customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"),
        ((year(col("o_orderdate")) - 2000) * 12 + month(col("o_orderdate")) - 1).as("m"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("r"))
      .groupBy("n_name", "m").agg(dsum(col("r"), 4).as("y"))
    val s = rev.groupBy("n_name").agg(
      count(lit(1)).as("n"),
      sum(col("m")).as("sx"),
      sum(col("m") * col("m")).as("sxx"),
      dsum(col("y"), 6).as("sy"),
      dsum(col("m") * col("y"), 6).as("sxy"))
    val nD = col("n").cast(DoubleType)
    val sxD = col("sx").cast(DoubleType)
    val slope = (nD * col("sxy") - sxD * col("sy")) /
      (nD * col("sxx").cast(DoubleType) - sxD * sxD)
    s.select(col("n_name").as("nation"), col("n").as("n_months"),
      round(slope, 6).as("slope"),
      round((col("sy") - slope * sxD) / nD, 6).as("intercept"))
  }

  private val salesTrendSql: String = s"""
    WITH rev AS (
      SELECT n_name,
             (year(o_orderdate) - 2000) * 12 + month(o_orderdate) - 1 AS m,
             ${dsumSql("l_extendedprice * (1.0 - l_discount)", 4)} AS y
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      GROUP BY n_name, (year(o_orderdate) - 2000) * 12 + month(o_orderdate) - 1),
    s AS (
      SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(m) AS BIGINT) AS sx, CAST(SUM(m * m) AS BIGINT) AS sxx,
             ${dsumSql("y", 6)} AS sy, ${dsumSql("m * y", 6)} AS sxy
      FROM rev GROUP BY n_name)
    SELECT n_name AS nation, n AS n_months,
           round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                 / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS slope,
           round((sy - (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                       / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                       * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE), 6) AS intercept
    FROM s""".trim

  // --------------------------------------------------------------------
  // q128: per-source Shannon entropy of the token distribution — the
  // information-density probe curation tracks per shard (templated or
  // repetitive sources collapse toward low entropy; natural text sits
  // near its normalized ceiling). Token counts are one map-side-combined
  // aggregate; each (source, token) contributes one −p·ln(p) term, and
  // the reassociated term sum is decimal-exact, so entropy and its
  // ln(V)-normalized form match bit-for-bit cross-engine. Distinct from
  // q120 (Zipf slope, corpus-global) and q95 (cross-source lift): this
  // is the per-shard scalar a mixture dashboard plots over time.
  private def tokenEntropy(spark: SparkSession, dir: String) = {
    val tok = Tables(spark, dir).documents
      .select(col("source"),
        explode(filter(split(lower(trim(col("text"))), "\\s+"),
          x => length(x) > 0)).as("token"))
    val ct = tok.groupBy("source", "token").agg(count(lit(1)).as("cnt"))
    val tot = ct.groupBy("source").agg(
      sum(col("cnt")).as("n_tokens"), count(lit(1)).as("n_distinct"))
    val p = col("cnt").cast(DoubleType) / col("n_tokens").cast(DoubleType)
    ct.join(broadcast(tot), "source")
      .select(col("source"), col("n_tokens"), col("n_distinct"),
        (-p * log(p)).as("term"))
      .groupBy("source", "n_tokens", "n_distinct")
      .agg(dsum(col("term"), 12).as("h"))
      .select(col("source"), col("n_tokens"), col("n_distinct"),
        round(col("h"), 6).as("entropy"),
        round(col("h") / log(col("n_distinct").cast(DoubleType)), 6)
          .as("norm_entropy"))
  }

  private val tokenEntropySql: String = s"""
    WITH tok AS (
      SELECT source,
             unnest(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                                x -> length(x) > 0)) AS token
      FROM documents),
    ct AS (
      SELECT source, token, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM tok GROUP BY source, token),
    tot AS (
      SELECT source, CAST(SUM(cnt) AS BIGINT) AS n_tokens,
             CAST(COUNT(*) AS BIGINT) AS n_distinct
      FROM ct GROUP BY source),
    h AS (
      SELECT source, n_tokens, n_distinct,
             ${dsumSql(
               "-(CAST(cnt AS DOUBLE) / CAST(n_tokens AS DOUBLE))" +
                 " * ln(CAST(cnt AS DOUBLE) / CAST(n_tokens AS DOUBLE))", 12)} AS h
      FROM ct JOIN tot USING (source)
      GROUP BY source, n_tokens, n_distinct)
    SELECT source, n_tokens, n_distinct, round(h, 6) AS entropy,
           round(h / ln(CAST(n_distinct AS DOUBLE)), 6) AS norm_entropy
    FROM h""".trim

  // --------------------------------------------------------------------
  // q129: MAD-robust outliers — order values more than 3 scaled-MADs
  // from their market segment's median. The robust twin of q92's
  // z-score gate: one fat-tailed order inflates a standard deviation
  // but leaves the median-absolute-deviation untouched. Medians are
  // RANK-BASED (lower median = element at row (n+1)/2 under a total
  // (value, key) order): pure integer logic both engines compute
  // identically — deliberately NOT interpolating percentile functions,
  // whose engine-specific IEEE formulas can differ in the last ulp.
  // The per-segment windows shuffle on 5 keys; at 100 TB the same
  // statistic ships as a KLL sketch (q103) — this exact variant is the
  // oracle-checkable twin and the correctness pin for that sketch.
  private def madOutliers(spark: SparkSession, dir: String) = {
    val t = Tables(spark, dir)
    val seg = t.orders.join(t.customer, col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("segment"), col("o_orderkey"),
        col("o_totalprice").as("x"))
    val w1 = Window.partitionBy("segment").orderBy(col("x").asc, col("o_orderkey").asc)
    val med = seg
      .withColumn("rn", row_number().over(w1))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("segment")))
      .filter(col("rn") === expr("(n + 1) div 2")) // integer div: `/` on longs is double
      .select(col("segment"), col("x").as("med"))
    val dev = seg.join(broadcast(med), "segment")
      .withColumn("d", abs(col("x") - col("med")))
    val w2 = Window.partitionBy("segment").orderBy(col("d").asc, col("o_orderkey").asc)
    val mad = dev
      .withColumn("rn", row_number().over(w2))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("segment")))
      .filter(col("rn") === expr("(n + 1) div 2"))
      .select(col("segment"), col("d").as("mad"))
    dev.join(broadcast(mad), "segment")
      .groupBy(col("segment"), round(col("med"), 2).as("median"),
        round(col("mad"), 2).as("mad"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("d") > lit(3.0) * lit(1.4826) * col("mad"), 1L)
          .otherwise(0L)).as("n_outliers"))
  }

  private val madOutliersSql: String = """
    WITH seg AS (
      SELECT c_mktsegment AS segment, o_orderkey, o_totalprice AS x
      FROM orders JOIN customer ON o_custkey = c_custkey),
    med AS (
      SELECT segment, x AS med FROM (
        SELECT segment, x,
               ROW_NUMBER() OVER (PARTITION BY segment
                                  ORDER BY x ASC, o_orderkey ASC) AS rn,
               COUNT(*) OVER (PARTITION BY segment) AS n
        FROM seg)
      WHERE rn = (n + 1) // 2),
    dev AS (
      SELECT seg.segment, o_orderkey, abs(x - med) AS d, med
      FROM seg JOIN med USING (segment)),
    mad AS (
      SELECT segment, d AS mad FROM (
        SELECT segment, d,
               ROW_NUMBER() OVER (PARTITION BY segment
                                  ORDER BY d ASC, o_orderkey ASC) AS rn,
               COUNT(*) OVER (PARTITION BY segment) AS n
        FROM dev)
      WHERE rn = (n + 1) // 2)
    SELECT segment, round(med, 2) AS median, round(mad.mad, 2) AS mad,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN d > 3.0 * 1.4826 * mad.mad THEN 1 ELSE 0 END)
                AS BIGINT) AS n_outliers
    FROM dev JOIN mad USING (segment)
    GROUP BY segment, round(med, 2), round(mad.mad, 2)""".trim

  // --------------------------------------------------------------------
  // q130: sparse TF-IDF cosine near-duplicate pairs — the lexical twin
  // of q53's embedding cosine, over 5-GRAM SHINGLES: weight each
  // (doc, shingle) by cnt·ln(N/df), drop shingles with df > 50 (the
  // boilerplate cut — a shingle in many documents carries no
  // discrimination AND is the entire quadratic cost; with the cut,
  // candidate pairs are bounded by Σ_{df≤50} df² ≤ 50·postings, never
  // all-pairs) and df < 2 (a singleton shingle can't link a pair), then
  // score candidates from the posting-list equi-join. Shingles, not
  // tokens, deliberately: this fixture's (and any template-heavy
  // corpus's) raw vocabulary is ~31 near-universal words, so EVERY
  // token fails any df cap at scale and the token-space query returns
  // an empty — hence trivially "correct" — result at sf0.1; the shingle
  // space stays Zipf-shaped at every scale factor. Norms are over the
  // SAME pruned space on both sides, dot products and norms are
  // decimal-exact, so the top-20 ranking is bit-identical cross-engine.
  // N (corpus size) is one bounded driver scalar, the house-sanctioned
  // collect shape.
  private def tfidfCosinePairs(spark: SparkSession, dir: String) = {
    val docs = Tables(spark, dir).documents
    val nDocs = docs.count() // bounded: one long
    val tok = docs
      .select(col("doc_id"),
        filter(split(lower(trim(col("text"))), "\\s+"),
          x => length(x) > 0).as("tk"))
      .filter(size(col("tk")) >= 5)
      .select(col("doc_id"), explode(transform(sequence(lit(1), size(col("tk")) - 4),
        i => concat_ws(" ", slice(col("tk"), i, lit(5))))).as("token"))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("cnt"))
    val df = tok.groupBy("token").agg(count(lit(1)).as("df"))
      .filter(col("df") >= 2 && col("df") <= 50)
    val w = tok.join(df, "token")
      .select(col("doc_id"), col("token"),
        (col("cnt").cast(DoubleType)
          * log(lit(nDocs.toDouble) / col("df").cast(DoubleType))).as("w"))
      .localCheckpoint() // norms + both join sides read it
    val nrm = w.groupBy("doc_id").agg(sqrt(dsum(col("w") * col("w"), 12)).as("nrm"))
    val dot = w.as("a").join(w.as("b"),
        col("a.token") === col("b.token") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .agg(dsum(col("a.w") * col("b.w"), 12).as("dot"))
    val scored = dot
      .join(nrm.withColumnRenamed("doc_id", "d1").withColumnRenamed("nrm", "n1"), "d1")
      .join(nrm.withColumnRenamed("doc_id", "d2").withColumnRenamed("nrm", "n2"), "d2")
      .select(col("d1"), col("d2"), (col("dot") / (col("n1") * col("n2"))).as("cos0"))
    scored.orderBy(col("cos0").desc, col("d1").asc, col("d2").asc).limit(20)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("cos0").desc, col("d1").asc, col("d2").asc)))
      .select(col("d1"), col("d2"), round(col("cos0"), 6).as("cosine"), col("rank"))
  }

  private val tfidfCosinePairsSql: String = s"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                         x -> length(x) > 0) AS tk
      FROM documents),
    tok AS (
      SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
        SELECT doc_id, array_to_string(list_slice(tk, i, i + 4), ' ') AS token
        FROM (SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 4)) AS i
              FROM toks WHERE len(tk) >= 5))
      GROUP BY doc_id, token),
    ndocs AS (SELECT CAST(COUNT(*) AS DOUBLE) AS nd FROM documents),
    df AS (
      SELECT token, CAST(COUNT(*) AS BIGINT) AS df FROM tok GROUP BY token
      HAVING COUNT(*) >= 2 AND COUNT(*) <= 50),
    w AS (
      SELECT doc_id, tok.token,
             CAST(cnt AS DOUBLE) * ln(nd / CAST(df AS DOUBLE)) AS w
      FROM tok JOIN df ON tok.token = df.token CROSS JOIN ndocs),
    nrm AS (
      SELECT doc_id, sqrt(${dsumSql("w * w", 12)}) AS nrm FROM w GROUP BY doc_id),
    dot AS (
      SELECT a.doc_id AS d1, b.doc_id AS d2, ${dsumSql("a.w * b.w", 12)} AS dot
      FROM w a JOIN w b ON a.token = b.token AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id),
    scored AS (
      SELECT d1, d2, dot / (na.nrm * nb.nrm) AS cos0
      FROM dot JOIN nrm na ON na.doc_id = d1 JOIN nrm nb ON nb.doc_id = d2)
    SELECT d1, d2, round(cos0, 6) AS cosine, CAST(rn AS INTEGER) AS rank
    FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY cos0 DESC, d1 ASC, d2 ASC) AS rn
          FROM scored)
    WHERE rn <= 20""".trim

  // --------------------------------------------------------------------
  // q131: weighted sample without replacement — 200 documents drawn with
  // probability proportional to length via the deterministic exponential
  // race (operators.Sampling.weightedTopK, Efraimidis–Spirakis): each
  // row's t = −ln(u)/w comes from a salted hash of its doc_id, the 200
  // smallest t win. Length-weighted draws are how curation samples
  // "tokens, not documents" (a 10k-token doc should be 100× likelier
  // than a 100-token one); the race makes membership a pure key
  // property — reruns, retries, and cluster size never change the
  // sample, and the plan is a narrow projection + distributed top-k, no
  // full-input window. Both engines evaluate the identical race
  // expression, so the winner set and order hash-match.
  private def weightedSample(spark: SparkSession, dir: String) = {
    val docs = Tables(spark, dir).documents.select(col("doc_id"), col("n_chars"))
    graft.operators.Sampling
      .weightedTopK(docs, col("doc_id"), col("n_chars"), k = 200)
      .select(col("doc_id"), col("n_chars"),
        round(col("race_t"), 6).as("race_t"), col("sample_rank"))
  }

  private val weightedSampleSql: String = s"""
    WITH r AS (
      SELECT doc_id, n_chars,
             ${graft.operators.Sampling.raceKeySql("doc_id", "n_chars")} AS race_t
      FROM documents WHERE doc_id IS NOT NULL AND CAST(n_chars AS DOUBLE) > 0.0)
    SELECT doc_id, n_chars, round(race_t, 6) AS race_t,
           CAST(rn AS INTEGER) AS sample_rank
    FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY race_t ASC, doc_id ASC) AS rn
          FROM r)
    WHERE rn <= 200""".trim

  // --------------------------------------------------------------------
  // q132: temperature-scaled mixture weights — the multilingual-training
  // reweighting p_i ∝ n_i^α (α = 0.3, the mT5/XLM-R convention): raw
  // proportions starve small sources, uniform over-trains them, the
  // power law in between is what production mixtures actually ship.
  // One source-keyed count, a |sources|-row weight table (decimal-exact
  // normalizer), and the per-source effective epoch factor
  // p_i·N/n_i — the number every mixture dashboard reports. Bounded
  // arithmetic end-to-end; the corpus is scanned once.
  private def mixtureAlpha(spark: SparkSession, dir: String) = {
    val c = Tables(spark, dir).documents
      .groupBy("source").agg(count(lit(1)).as("n"))
    val pw = pow(col("n").cast(DoubleType), 0.3)
    val t = c.agg(sum(col("n")).as("total"), dsum(pw, 12).as("psum"))
    c.crossJoin(broadcast(t))
      .select(col("source"), col("n").as("n_docs"),
        round(pw / col("psum"), 6).as("weight"),
        round(pw / col("psum")
          * col("total").cast(DoubleType) / col("n").cast(DoubleType), 6)
          .as("eff_epochs"))
  }

  private val mixtureAlphaSql: String = s"""
    WITH c AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM documents GROUP BY source),
    t AS (
      SELECT CAST(SUM(n) AS BIGINT) AS total,
             ${dsumSql("pow(CAST(n AS DOUBLE), 0.3)", 12)} AS psum
      FROM c)
    SELECT source, n AS n_docs,
           round(pow(CAST(n AS DOUBLE), 0.3) / psum, 6) AS weight,
           round(pow(CAST(n AS DOUBLE), 0.3) / psum
                 * CAST(total AS DOUBLE) / CAST(n AS DOUBLE), 6) AS eff_epochs
    FROM c CROSS JOIN t""".trim

  // --------------------------------------------------------------------
  // q153: population-stability drift (PSI) — the model-monitoring
  // metric for "did this feature's distribution move between windows":
  // events.value binned over fixed literal edges (0,5,10,20,40,80,160,
  // 320,∞ — chosen for the fixture's right-skewed range), compared
  // between the first and second half of the stream's time range, with
  // per-bin PSI terms (pA − pB)·ln(pA/pB). Rules of the house: the
  // midpoint is exact integer arithmetic over epoch-ms min/max (one
  // 1-row agg cross-joined back — no driver round trip), counts are
  // exact longs, the smoothed probabilities (+1 Laplace, so empty bins
  // stay finite) are IEEE divisions of identical longs, and each ln
  // term is rounded to 8 decimals — past any libm-vs-JVM ulp
  // divergence (the q135 discipline). One scan, one ≤8-group agg.
  private val psiEdges = Seq(5.0, 10.0, 20.0, 40.0, 80.0, 160.0, 320.0)
  private val psiBins = psiEdges.size + 1

  private def psiDrift(spark: SparkSession, dir: String) = {
    val ev = Tables(spark, dir).events
      .select(unix_millis(col("ts")).as("ms"), col("value"))
    val mid = ev.agg(((min(col("ms")) + max(col("ms"))) / 2).cast("long").as("mid"))
    val bin = psiEdges.zipWithIndex.foldRight(lit(s"b${psiBins - 1}"): Column) {
      case ((edge, i), acc) => when(col("value") < edge, s"b$i").otherwise(acc)
    }
    val counts = ev.crossJoin(broadcast(mid))
      .select(bin.as("bin"), (col("ms") < col("mid")).as("in_a"))
      .groupBy("bin")
      .agg(sum(when(col("in_a"), 1L).otherwise(0L)).as("n_a"),
        sum(when(!col("in_a"), 1L).otherwise(0L)).as("n_b"))
    // full bin spine: a bin empty in BOTH halves still owns a nonzero
    // smoothed term whenever the half sizes differ — dropping its row
    // would under-report the summed PSI and break Σp = 1
    val spine = {
      import spark.implicits._
      (0 until psiBins).map(i => s"b$i").toDF("bin")
    }
    val c = spine.join(counts, Seq("bin"), "left")
      .select(col("bin"),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"))
    val tot = c.agg(sum(col("n_a")).as("ta"), sum(col("n_b")).as("tb"))
    c.crossJoin(broadcast(tot))
      .select(col("bin"), col("n_a"), col("n_b"), {
        val pa = (col("n_a") + 1L).cast(DoubleType) / (col("ta") + psiBins).cast(DoubleType)
        val pb = (col("n_b") + 1L).cast(DoubleType) / (col("tb") + psiBins).cast(DoubleType)
        round((pa - pb) * log(pa / pb), 8).as("psi_term")
      })
  }

  private val psiDriftSql: String = {
    val binCase = psiEdges.zipWithIndex
      .map { case (e, i) => s"WHEN value < $e THEN 'b$i'" }
      .mkString("CASE ", " ", s" ELSE 'b${psiBins - 1}' END")
    val spineValues = (0 until psiBins).map(i => s"('b$i')").mkString(", ")
    s"""
    WITH ev AS (SELECT epoch_ms(ts) AS ms, value FROM events),
    mid AS (SELECT (MIN(ms) + MAX(ms)) // 2 AS mid FROM ev),
    counts AS (SELECT $binCase AS bin,
                 CAST(COUNT(*) FILTER (WHERE ms < mid) AS BIGINT) AS n_a,
                 CAST(COUNT(*) FILTER (WHERE ms >= mid) AS BIGINT) AS n_b
          FROM ev, mid GROUP BY 1),
    c AS (SELECT s.bin, COALESCE(n_a, 0) AS n_a, COALESCE(n_b, 0) AS n_b
          FROM (VALUES $spineValues) s(bin) LEFT JOIN counts ON s.bin = counts.bin),
    tot AS (SELECT CAST(SUM(n_a) AS BIGINT) AS ta,
                   CAST(SUM(n_b) AS BIGINT) AS tb FROM c)
    SELECT bin, n_a, n_b,
           round((CAST(n_a + 1 AS DOUBLE) / CAST(ta + $psiBins AS DOUBLE)
                  - CAST(n_b + 1 AS DOUBLE) / CAST(tb + $psiBins AS DOUBLE))
                 * ln((CAST(n_a + 1 AS DOUBLE) / CAST(ta + $psiBins AS DOUBLE))
                      / (CAST(n_b + 1 AS DOUBLE) / CAST(tb + $psiBins AS DOUBLE))),
                 8) AS psi_term
    FROM c, tot""".trim
  }

  // --------------------------------------------------------------------
  // q166: exact two-sample Kolmogorov–Smirnov — the distribution-free
  // sibling of q153's PSI (PSI sees only its 8 fixed bins; KS sweeps
  // EVERY observed value and reports the largest CDF gap, catching a
  // shift PSI's binning straddles). Same time-half split as q153. The
  // statistic stays in EXACT integers to the last step: collapse to
  // distinct values (the Zipf rule) with per-half counts, then the two
  // cumulative counts come from the SCALE path (round-10:
  // Ranks.globalRunningSums — the Packing two-pass range-partitioned
  // scan; no single-task WindowExec in the plan, PlanSpec pins it;
  // the oracle keeps the global-window SQL, bit-identical because
  // integer prefix sums depend only on the (value) total order), then
  //   D·nₐ·n_b = max over v of |cumₐ(v)·n_b − cum_b(v)·nₐ|
  // — an integer argmax, so the winning row and the (d_num desc,
  // value asc) tie-break are float-free; the one IEEE division at the
  // end produces d_stat. Long bounds: cum·n ≤ nₐ·n_b, overflowing past
  // ~3e9 rows per half — the documented decimal upgrade point.
  private def ksDrift(spark: SparkSession, dir: String) = {
    val ev = Tables(spark, dir).events
      .select(unix_millis(col("ts")).as("ms"), col("value"))
    val mid = ev.agg(((min(col("ms")) + max(col("ms"))) / 2).cast("long").as("mid"))
    val byVal = ev.crossJoin(broadcast(mid))
      .select(col("value"), (col("ms") < col("mid")).as("in_a"))
      .groupBy("value")
      .agg(sum(when(col("in_a"), 1L).otherwise(0L)).as("ca"),
        sum(when(!col("in_a"), 1L).otherwise(0L)).as("cb"))
    val cum = graft.core.Ranks.globalRunningSums(
      byVal, Seq(col("value").asc), Seq("ca", "cb"))
    // totals read the PINNED scan frame, not a second byVal evaluation
    val tot = cum.agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"))
    cum
      .crossJoin(broadcast(tot))
      .select(col("value"), col("na"), col("nb"),
        abs(col("ca_cum") * col("nb") - col("cb_cum") * col("na")).as("d_num"))
      .orderBy(col("d_num").desc, col("value").asc)
      .limit(1)
      .select(col("na").as("n_a"), col("nb").as("n_b"), col("d_num"),
        (col("d_num").cast(DoubleType)
          / (col("na") * col("nb")).cast(DoubleType)).as("d_stat"),
        col("value").as("at_value"))
  }

  private val ksDriftSql: String = """
    WITH ev AS (SELECT epoch_ms(ts) AS ms, value FROM events),
    mid AS (SELECT (MIN(ms) + MAX(ms)) // 2 AS mid FROM ev),
    byval AS (
      SELECT value,
             CAST(COUNT(*) FILTER (WHERE ms < mid) AS BIGINT) AS ca,
             CAST(COUNT(*) FILTER (WHERE ms >= mid) AS BIGINT) AS cb
      FROM ev, mid GROUP BY value),
    tot AS (SELECT CAST(SUM(ca) AS BIGINT) AS na,
                   CAST(SUM(cb) AS BIGINT) AS nb FROM byval),
    cum AS (
      SELECT value,
             CAST(SUM(ca) OVER (ORDER BY value ASC
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cca,
             CAST(SUM(cb) OVER (ORDER BY value ASC
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS ccb
      FROM byval)
    SELECT na AS n_a, nb AS n_b,
           CAST(abs(cca * nb - ccb * na) AS BIGINT) AS d_num,
           CAST(abs(cca * nb - ccb * na) AS DOUBLE)
             / CAST(na * nb AS DOUBLE) AS d_stat,
           value AS at_value
    FROM cum, tot
    ORDER BY d_num DESC, value ASC
    LIMIT 1""".trim

  // --------------------------------------------------------------------
  // q168: bootstrap confidence interval for a corpus metric (mean
  // tokens/doc) via the POISSON bootstrap — the resampling scheme that
  // actually distributes: classical n-out-of-n resampling needs a
  // per-replica global draw, while Poisson(1) multiplicities are a pure
  // per-row function of (replica, doc_id) (Sampling.poissonMultiplicity:
  // 32-bit salted hash inverted through SHARED INTEGER CDF thresholds —
  // no float CDF on either side), so B = 100 replicas cost one
  // broadcast spine join and re-runs/re-partitionings draw identical
  // replicas. Replica means are exact-long ratios (Σ mult·tokens /
  // Σ mult — one IEEE division of identical integers); the CI is
  // rank-based (3rd and 98th of the 100 means under the (mean, replica)
  // total order — the deterministic 2.5th/97.5th percentile convention,
  // means already identical doubles so the order crosses engines).
  // Error bars for data metrics: the difference between "the corpus
  // changed" and "the sample wiggled".
  private def bootstrapCi(spark: SparkSession, dir: String) = {
    import spark.implicits._
    import graft.operators.Sampling
    val docs = Tables(spark, dir).documents
      .select(col("doc_id"),
        graft.functions.TextFunctions.tokenCount(col("text"))
          .cast("long").as("n_tokens"))
      .localCheckpoint() // spine join + point estimate share one pass
    val spine = (0 until 100).toDF("replica")
    val means = docs.crossJoin(broadcast(spine))
      .select(col("replica"),
        Sampling.poissonMultiplicity(col("doc_id"), col("replica")).as("m"),
        col("n_tokens"))
      .filter(col("m") > 0)
      .groupBy("replica")
      .agg(sum(col("m") * col("n_tokens")).as("tok"), sum(col("m")).as("n"))
      .select(col("replica"),
        (col("tok").cast(DoubleType) / col("n").cast(DoubleType)).as("mean"))
    val w = Window.orderBy(col("mean").asc, col("replica").asc)
    val ranked = means.withColumn("rn", row_number().over(w))
    val point = docs.agg(
      (sum(col("n_tokens")).cast(DoubleType)
        / count(lit(1)).cast(DoubleType)).as("point_est"))
    point.crossJoin(broadcast(ranked.agg(
      count(lit(1)).as("n_replicas"),
      min(when(col("rn") === 3, col("mean"))).as("ci_lo"),
      min(when(col("rn") === 98, col("mean"))).as("ci_hi"))))
      .select(col("n_replicas"), col("point_est"), col("ci_lo"), col("ci_hi"))
  }

  private val bootstrapCiSql: String = {
    val tok = "len(list_filter(string_split_regex(trim(text), '\\s+'), t -> length(t) > 0))"
    val mult = graft.operators.Sampling.poissonMultiplicitySql("doc_id", "replica")
    s"""
    WITH docs AS (SELECT doc_id, CAST($tok AS BIGINT) AS n_tokens FROM documents),
    spine AS (SELECT unnest(generate_series(0, 99)) AS replica),
    drawn AS (
      SELECT replica, $mult AS m, n_tokens
      FROM docs, spine),
    means AS (
      SELECT replica,
             CAST(SUM(m * n_tokens) AS DOUBLE) / CAST(SUM(m) AS DOUBLE) AS mean
      FROM drawn WHERE m > 0 GROUP BY replica),
    ranked AS (
      SELECT mean, ROW_NUMBER() OVER (ORDER BY mean ASC, replica ASC) AS rn
      FROM means)
    SELECT CAST((SELECT COUNT(*) FROM ranked) AS BIGINT) AS n_replicas,
           (SELECT CAST(SUM(n_tokens) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
            FROM docs) AS point_est,
           (SELECT mean FROM ranked WHERE rn = 3) AS ci_lo,
           (SELECT mean FROM ranked WHERE rn = 98) AS ci_hi""".trim
  }

  def all: Seq[GraftQuery] = Seq(
    GraftQuery("q166_ks_drift", Some(ksDriftSql), ksDrift),
    GraftQuery("q168_bootstrap_ci", Some(bootstrapCiSql), bootstrapCi),
    GraftQuery("q153_psi_drift", Some(psiDriftSql), psiDrift),
    GraftQuery("q127_sales_trend", Some(salesTrendSql), salesTrend),
    GraftQuery("q128_token_entropy", Some(tokenEntropySql), tokenEntropy),
    GraftQuery("q129_mad_outliers", Some(madOutliersSql), madOutliers),
    GraftQuery("q130_tfidf_cosine", Some(tfidfCosinePairsSql), tfidfCosinePairs),
    GraftQuery("q131_weighted_sample", Some(weightedSampleSql), weightedSample),
    GraftQuery("q132_mixture_alpha", Some(mixtureAlphaSql), mixtureAlpha))
}
