package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Similarity search over embedding columns (`Array[Float]`).
  *
  * Two tiers:
  *  - brute-force cosine top-k: exact baseline — a broadcast join of the
  *    query set against the corpus, codegen'd `zip_with`/`aggregate`
  *    arithmetic, per-query top-k via window. Linear scan of the corpus:
  *    right answer at any scale when the query set is small (it ships with
  *    the broadcast), since the corpus is never shuffled.
  *  - LSH-bucketed (random hyperplane signs): the approximate scale path —
  *    corpus hashed once to `2^bits` buckets, probing only matching
  *    buckets; recall/speed traded via `bits`.
  */
object VectorOps {

  /** Elementwise dot product of two array<double> columns (codegen'd
    * loop — see [[graft.functions.DoubleDot]]; identical summation order
    * to the `aggregate(zip_with(...))` formulation).
    */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.doubleDot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; 0 when either side has zero norm. */
  def cosine(a: Column, b: Column): Column = {
    val d = norm(a) * norm(b)
    when(d === 0.0, 0.0).otherwise(dot(a, b) / d)
  }

  /** Exact top-k neighbors for each query vector (brute force).
    *
    * @param corpus  (id: long, vec: array<float>)
    * @param queries (qid: long, qvec: array<float>) — small, broadcast
    * @param k       neighbors per query
    * @param scale   round cosine to this many decimals for deterministic,
    *                engine-portable ranking (ties broken by neighbor id)
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int, scale: Int = 4): DataFrame = {
    val joined = corpus.select(col("id"), col("vec").cast("array<double>").as("vec"))
      .crossJoin(broadcast(
        queries.select(col("qid"), col("qvec").cast("array<double>").as("qvec"))))
      .filter(col("id") =!= col("qid"))
      .withColumn("cos", round(cosine(col("vec"), col("qvec")), scale))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("id").asc)
    joined.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("id").as("neighbor"), col("cos"), col("rank"))
  }

  /** Maximal-Marginal-Relevance re-ranking of brute-force candidates —
    * diversified retrieval: greedily pick `kOut` of each query's `kCand`
    * nearest neighbors, each step taking the candidate maximizing
    * `0.7·cos(q,d) − 0.3·max_{s∈selected} cos(d,s)` (λ = 0.7, the
    * classic relevance/diversity trade; Carbonell & Goldstein 1998).
    * Near-duplicate neighbors — which embedding corpora are full of —
    * stop crowding out distinct results.
    *
    * Engine shape: the greedy loop is `kOut − 1` unrolled tiny-frame
    * steps (the PageRank/Lloyd move): anti-join remaining vs selected,
    * one (remaining × selected-per-qid) penalty join bounded by
    * kCand·kOut rows per query, an argmax window per qid. The candidate
    * pool (with its vectors) is pinned once; every per-step frame is
    * ∝ |queries|·kCand, never corpus-sized — the corpus is touched only
    * by the initial [[bruteForceTopK]] scan (or any ANN tier swapped in
    * for it).
    *
    * Determinism contract: all cosines AND the MMR score are rounded to
    * `scale` decimals with neighbor-id tie-breaks (the ANN family's
    * rule), and λ enters as the literal pair 0.7/0.3 — never `1 − λ`,
    * whose double value 0.30000000000000004 would diverge from an
    * external engine's 0.3 literal — so the greedy path is reproducible
    * cross-engine and the oracle unrolls the same steps as CTEs.
    *
    * @return (qid, neighbor, cos, mmr_rank) — mmr_rank 1..kOut in
    *         selection order
    */
  def mmrRerank(corpus: DataFrame, queries: DataFrame,
      kCand: Int = 20, kOut: Int = 5, scale: Int = 4): DataFrame = {
    val vecs = corpus.select(col("id").as("neighbor"),
      col("vec").cast("array<double>").as("nvec"))
    // candidate pool + vectors: re-read by every greedy step — pin once
    val cand = bruteForceTopK(corpus, queries, kCand, scale)
      .join(vecs, "neighbor")
      .select("qid", "neighbor", "cos", "rank", "nvec")
      .localCheckpoint()
    var selected = cand.filter(col("rank") === 1)
      .select(col("qid"), col("neighbor"), col("cos"),
        lit(1).as("mmr_rank"), col("nvec"))
      .localCheckpoint()
    for (t <- 2 to kOut) {
      val remaining = cand.join(
        selected.select("qid", "neighbor"), Seq("qid", "neighbor"), "left_anti")
      val pen = remaining.select("qid", "neighbor", "nvec")
        .join(selected.select(col("qid"), col("nvec").as("svec")), "qid")
        .withColumn("sim", round(cosine(col("nvec"), col("svec")), scale))
        .groupBy("qid", "neighbor")
        .agg(max(col("sim")).as("pen"))
      val w = Window.partitionBy("qid")
        .orderBy(col("mmr").desc, col("neighbor").asc)
      val pick = remaining.join(pen, Seq("qid", "neighbor"))
        .withColumn("mmr",
          round(lit(0.7) * col("cos") - lit(0.3) * col("pen"), scale))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("qid"), col("neighbor"), col("cos"),
          lit(t).as("mmr_rank"), col("nvec"))
      selected = selected.unionByName(pick).localCheckpoint()
    }
    selected.select("qid", "neighbor", "cos", "mmr_rank")
  }

  /** Per-vector int8 scalar quantization — the storage tier under every
    * large ANN index (IVF-SQ / flat-SQ): each vector is mapped to 8-bit
    * codes over its own [min, max] range, shrinking an `array<float>`
    * corpus 4× (embedding storage is a first-order cost at 100 TB). Pure
    * per-row expression work — no shuffle at any scale — and arithmetic-
    * only (min/max/round), so an external SQL oracle can replicate it
    * bit-for-bit.
    *
    * Constant vectors (max = min) quantize to all-zero codes and
    * reconstruct exactly. `max_err` is the per-vector reconstruction sup
    * error — bounded by qscale/2, the invariant VectorSpec asserts.
    *
    * @param df  input frame
    * @param id  vector id column
    * @param vec array<float|double> embedding column
    * @return (id, n_dims, qmin, qscale, codes: array<int>, max_err)
    */
  def scalarQuantize(df: DataFrame, id: Column, vec: Column): DataFrame = {
    val v = vec.cast("array<double>")
    df.select(id.as("id"), v.as("v"))
      .withColumn("qmin", array_min(col("v")))
      .withColumn("qscale", (array_max(col("v")) - col("qmin")) / 255.0)
      .withColumn("codes", transform(col("v"), x =>
        when(col("qscale") === 0.0, 0)
          .otherwise(least(round((x - col("qmin")) / col("qscale")), lit(255.0)).cast("int"))))
      .withColumn("max_err", array_max(zip_with(col("v"), col("codes"), (x, c) =>
        abs(x - (col("qmin") + c.cast(DoubleType) * col("qscale"))))))
      .select(col("id"), size(col("v")).cast("long").as("n_dims"),
        col("qmin"), col("qscale"), col("codes"), col("max_err"))
  }

  /** ANN over the int8-quantized corpus (flat-SQ): corpus vectors are
    * stored as [[scalarQuantize]] codes (4× smaller scan), dequantized
    * in-expression at probe time, and scored against the FULL-precision
    * query vectors — the memory/accuracy trade every large flat index
    * ships. Deterministic given the codes, so unlike IVF this compressed
    * tier is exactly oracle-checkable; recall vs the uncompressed scan is
    * asserted in VectorSpec.
    */
  def sqTopK(corpus: DataFrame, queries: DataFrame, k: Int, scale: Int = 4): DataFrame = {
    val dq = scalarQuantize(corpus, col("id"), col("vec"))
      .select(col("id"), transform(col("codes"),
        c => col("qmin") + c.cast(DoubleType) * col("qscale")).as("vec"))
    bruteForceTopK(dq, queries, k, scale)
  }

  /** Deterministic random hyperplanes: `bits` × `dim` Gaussian
    * coefficients, rounded to 6 decimals. The rounding makes every
    * coefficient exactly re-emittable as a plain SQL literal (≤ 7
    * significant digits parse to the identical IEEE double on any
    * engine), so an oracle can rebuild the same buckets from the same
    * numbers; hyperplane quality is unaffected. Public so oracle SQL
    * generators can read the coefficients.
    */
  def hyperplanes(bits: Int, dim: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(bits, dim)(math.rint(rnd.nextGaussian() * 1e6) / 1e6)
  }

  /** Sign-bit LSH bucket id of a vector column (array<double>, fixed dim).
    *
    * Each projection is `aggregate(zip_with(vec, <plane literal>, *), +)` —
    * a generated LOOP over the array rather than `dim` inlined adds, which
    * keeps the emitted Java small enough that janino compilation stays
    * negligible even at bits × tables hash functions.
    */
  def lshBucket(vec: Column, bits: Int, dim: Int, seed: Long = 7L): Column = {
    val planes = hyperplanes(bits, dim, seed)
    planes.zipWithIndex.map { case (p, i) =>
      val plane = array(p.map(lit): _*)
      val proj = aggregate(zip_with(vec, plane, (x, w) => x * w), lit(0.0), (acc, v) => acc + v)
      when(proj >= 0.0, shiftleft(lit(1L), i)).otherwise(0L)
    }.reduce(_ bitwiseOR _)
  }

  /** IVF (inverted-file) approximate ANN: a k-means coarse quantizer
    * assigns every corpus vector to one of `nCells` cells; each query
    * probes only its `nProbe` nearest cells. Lloyd iterations are plain
    * DataFrame aggregations (assignment = argmin of per-centroid distance
    * expressions; update = per-dimension mean via posexplode); only the
    * nCells×dim centroid matrix ever reaches the driver, so training and
    * probing both scale with the corpus partitioning. Centroid means sum
    * floats in shuffle order → cell boundaries are approximate-stable,
    * which is inherent to IVF (results are approximate by design).
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      nCells: Int = 16, nProbe: Int = 4, iters: Int = 3, scale: Int = 4): DataFrame = {
    val c = corpus.select(col("id"), col("vec").cast("array<double>").as("vec"))
    val centroids = trainIvfCentroids(c, nCells, iters)
    // degenerate corpus (fewer than 2 cells' worth of vectors): the
    // quantizer is meaningless and `least` needs >= 2 branches — the exact
    // scan IS the cheap path here
    if (centroids.length < 2) return bruteForceTopK(corpus, queries, k, scale)
    val assigned = c.withColumn("cell", ivfCellOf(centroids, col("vec")))
    ivfServe(assigned, queries, centroids, k, nProbe, scale)
  }

  /** argmin_c ‖v−c‖² = argmin_c (‖c‖² − 2⟨v,c⟩) as a literal expression
    * tree over the (bounded-metadata) centroid matrix — shared by the
    * in-query IVF and the persisted [[IvfIndex]].
    */
  private[operators] def ivfCellOf(centroids: Array[Array[Double]],
      vec: Column): Column = {
    import graft.functions.VectorExpressions.doubleDot
    def centroidLit(p: Array[Double]): Column = array(p.map(lit): _*)
    val scored = centroids.zipWithIndex.map { case (p, i) =>
      val d2 = lit(p.map(x => x * x).sum) - lit(2.0) * doubleDot(vec, centroidLit(p))
      struct(d2.as("d"), lit(i).as("cell"))
    }
    least(scored: _*).getField("cell")
  }

  /** Deterministic Lloyd training (first-nCells-by-id init, decimal-
    * exact per-dimension means): a plain avg() is an order-dependent
    * double sum, which would make the trained centroids partitioning-
    * dependent AND unreproducible by the oracle's unrolled-Lloyd twin —
    * the decimal sum is exact, so both engines derive bit-identical
    * centroids from the same members. Only nCells×dim doubles reach the
    * driver.
    */
  private[operators] def trainIvfCentroids(c: DataFrame, nCells: Int,
      iters: Int): Array[Array[Double]] = {
    var centroids: Array[Array[Double]] = c.orderBy("id").limit(nCells)
      .select("vec").collect().map(_.getSeq[Double](0).toArray)
    if (centroids.length < 2) return centroids
    var it = 0
    while (it < iters) {
      val means = c.withColumn("cell", ivfCellOf(centroids, col("vec")))
        .select(col("cell"), posexplode(col("vec")).as(Seq("pos", "x")))
        .groupBy("cell", "pos")
        .agg((sum(col("x").cast(org.apache.spark.sql.types.DecimalType(38, 18)))
          .cast(DoubleType) / count(lit(1)).cast(DoubleType)).as("m"))
        .collect()
      val next = centroids.map(_.clone())
      means.foreach(r => next(r.getInt(0))(r.getInt(1)) = r.getDouble(2))
      centroids = next
      it += 1
    }
    centroids
  }

  /** The IVF probe/rank phase over an already-assigned corpus: each
    * query ranks its nProbe nearest cells from the broadcast centroid
    * matrix, candidates stream from the probed cells only, ranking is
    * the rounded-cosine (desc, id asc) total order.
    */
  private[operators] def ivfServe(assigned: DataFrame, queries: DataFrame,
      centroids: Array[Array[Double]], k: Int, nProbe: Int,
      scale: Int): DataFrame = {
    import graft.functions.VectorExpressions.doubleDot
    val q = queries.select(col("qid"), col("qvec").cast("array<double>").as("qvec"))
    val centroidDf = q.sparkSession.createDataFrame(
      centroids.toIndexedSeq.zipWithIndex.map { case (p, i) => (i, p.toSeq) })
      .toDF("cell", "cvec")
    val probed = q.crossJoin(broadcast(centroidDf))
      .withColumn("d2", doubleDot(col("cvec").cast("array<double>"), col("cvec").cast("array<double>"))
        - lit(2.0) * doubleDot(col("qvec"), col("cvec").cast("array<double>")))
      .withColumn("rk", row_number().over(
        Window.partitionBy("qid").orderBy(col("d2").asc, col("cell").asc)))
      .filter(col("rk") <= nProbe)
      .select(col("qid"), col("qvec"), col("cell"))
    val joined = assigned.join(broadcast(probed), Seq("cell"))
      .filter(col("id") =!= col("qid"))
      .withColumn("cos", round(cosine(col("vec"), col("qvec")), scale))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("id").asc)
    joined.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("id").as("neighbor"), col("cos"), col("rank"))
  }

  /** Approximate top-k with multi-table sign LSH: `tables` independent
    * hash tables of `bits` bits; a corpus vector is a candidate if it
    * shares a bucket with the query in ANY table (union, dedup). Per-
    * neighbor recall ≈ 1-(1-p^bits)^tables with p = 1-θ/π — tune
    * (bits, tables) to the corpus geometry. Same output shape as
    * [[bruteForceTopK]]; recall measured in VectorSpec.
    */
  /** Product-quantization ANN (Jégou, Douze & Schmid, "Product
    * quantization for nearest neighbor search"): the vector splits into
    * `m` subspaces, each learns its own tiny `nCodes`-centroid codebook
    * (the IVF Lloyd loop per subspace — driver holds m·nCodes·(dim/m)
    * doubles, bounded metadata), and a corpus vector is stored as m
    * small codes — dim·4 bytes shrink to m bytes (here 64·4 → 8, 32×),
    * which is what makes a 10⁹-vector corpus fit a cluster's memory.
    *
    * Queries score candidates by ADC (asymmetric distance computation):
    * each query precomputes a lookup table of its subvector·centroid dot
    * products (m·nCodes doubles, broadcast with the query), so a
    * candidate's approximate dot product is m ARRAY LOOKUPS, no float
    * vector in sight. The ADC top-`rerank·k` then re-rank EXACTLY by
    * cosine (one id-keyed join back to the float corpus, candidate-set
    * sized), so emitted scores are true cosines — only membership is
    * approximate (recall measured in VectorSpec).
    *
    * @param corpus  (id: long, vec: array<float>), dim divisible by m
    * @param queries (qid: long, qvec: array<float>) — small, collected
    *                to build the ADC tables (the brute-force tier already
    *                broadcasts this set)
    */
  def pqTopK(corpus: DataFrame, queries: DataFrame, k: Int, dim: Int,
      m: Int = 8, nCodes: Int = 16, iters: Int = 2, rerank: Int = 3,
      scale: Int = 4): DataFrame = {
    import graft.functions.VectorExpressions.doubleDot
    require(m > 0 && dim % m == 0, s"dim=$dim must divide into m=$m subspaces")
    val sub = dim / m
    val c = corpus.select(col("id"), col("vec").cast("array<double>").as("vec"))
      .localCheckpoint() // codebook training + encoding + re-rank all read it

    // per-subspace codebooks via the IVF Lloyd shape (deterministic init:
    // first nCodes vectors by id supply each subspace's seeds)
    val seeds = c.orderBy("id").limit(nCodes).select("vec")
      .collect().map(_.getSeq[Double](0).toArray)
    if (seeds.length < 2) return bruteForceTopK(corpus, queries, k, scale)
    var books: Array[Array[Array[Double]]] = // [m][nCodes][sub]
      Array.tabulate(m)(j => seeds.map(_.slice(j * sub, (j + 1) * sub)))

    def subvec(j: Int): Column = slice(col("vec"), j * sub + 1, sub)

    // (id, j, sv): the per-subspace slices — iteration-invariant, exploded
    // and pinned ONCE. Every Lloyd pass and the final encode join this
    // frame against the CURRENT codebook travelling as broadcast DATA, so
    // the plan (and its generated code) is identical across iterations;
    // centroid literals baked into the expression tree would recompile
    // whole-stage codegen for every pass of every run
    val sv = c.select(col("id"),
        posexplode(array((0 until m).map(subvec): _*)).as(Seq("j", "sv")))
      .localCheckpoint()

    def bookDf = {
      val rows = for (j <- 0 until m; code <- books(j).indices)
        yield (j, code, books(j)(code).toSeq)
      c.sparkSession.createDataFrame(rows.toIndexedSeq).toDF("j", "code", "cent")
    }
    // argmin over (d2, code): min of the struct is the same lexicographic
    // tie-break as a least() over per-code structs; d2 = ‖cent‖² − 2⟨sv,cent⟩
    // (‖sv‖² is constant per (id,j) and cancels from the ranking); the
    // norm's left-fold sum matches the driver-side p.map(x*x).sum order,
    // so assignments are bit-identical to the literal-expression form
    def assign = sv.join(broadcast(bookDf), "j")
      .withColumn("d2",
        aggregate(col("cent"), lit(0.0), (acc, x) => acc + x * x)
          - lit(2.0) * doubleDot(col("sv"), col("cent")))
      .groupBy("id", "j")
      .agg(min(struct(col("d2"), col("code"))).getField("code").as("code"))

    var it = 0
    while (it < iters) {
      // decimal-exact mean, same rationale as ivfTopK: reproducible
      // codebooks are what let the q99 oracle unroll this training
      val means = assign
        .join(sv, Seq("id", "j"))
        .select(col("j"), col("code"), posexplode(col("sv")).as(Seq("pos", "x")))
        .groupBy("j", "code", "pos")
        .agg((sum(col("x").cast(org.apache.spark.sql.types.DecimalType(38, 18)))
          .cast(DoubleType) / count(lit(1)).cast(DoubleType)).as("mean"))
        .collect() // bounded: ≤ m·nCodes·sub rows (1024 at the defaults)
      val next = books.map(_.map(_.clone()))
      means.foreach(r => next(r.getInt(0))(r.getInt(1))(r.getInt(2)) = r.getDouble(3))
      books = next
      it += 1
    }

    // encode: the corpus as m small codes per id, ordered by subspace
    val codes = assign
      .groupBy("id")
      .agg(transform(array_sort(collect_list(struct(col("j"), col("code")))),
        s => s.getField("code")).as("codes"))

    // ADC tables per query: lut[j][code] = <q_sub_j, centroid_{j,code}>
    val qRows = queries.select(col("qid"), col("qvec").cast("array<double>").as("qv"))
      .collect()
    val luts = qRows.map { r =>
      val qv = r.getSeq[Double](1).toArray
      val lut = Array.tabulate(m) { j =>
        val qs = qv.slice(j * sub, (j + 1) * sub)
        books(j).map(p => p.zip(qs).map { case (a, b) => a * b }.sum).toSeq
      }.toSeq
      (r.getLong(0), lut)
    }
    val lutDf = c.sparkSession.createDataFrame(luts.toIndexedSeq).toDF("qid", "lut")

    // score = Σ_j lut[j][code_j] — m array lookups per candidate
    val adc = (0 until m)
      .map(j => element_at(element_at(col("lut"), j + 1), col("codes")(j) + 1))
      .reduce(_ + _)
    val cand = codes.crossJoin(broadcast(lutDf))
      .filter(col("id") =!= col("qid"))
      .withColumn("adc", adc)
      .withColumn("crk", row_number().over(
        Window.partitionBy("qid").orderBy(col("adc").desc, col("id").asc)))
      .filter(col("crk") <= rerank * k)
      .select("qid", "id")

    // exact re-rank of the candidate set only
    val q = queries.select(col("qid").as("rq"), col("qvec").cast("array<double>").as("qvec"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("id").asc)
    cand.join(c, "id")
      .join(broadcast(q), col("qid") === col("rq"))
      .withColumn("cos", round(cosine(col("vec"), col("qvec")), scale))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("id").as("neighbor"), col("cos"), col("rank"))
  }

  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int, bits: Int, dim: Int,
      tables: Int = 8, scale: Int = 4): DataFrame = {
    def bucketed(df: DataFrame, vecCol: String, idCols: Seq[String]) =
      df.select(idCols.map(col) :+ col(vecCol) :+
        explode(array((0 until tables).map { t =>
          struct(lit(t).as("table"),
            lshBucket(col(vecCol), bits, dim, seed = 7L + t).as("bucket"))
        }: _*)).as("tb"): _*)
        .select(idCols.map(col) :+ col(vecCol) :+
          col("tb.table").as("table") :+ col("tb.bucket").as("bucket"): _*)

    val c = bucketed(
      corpus.select(col("id"), col("vec").cast("array<double>").as("vec")), "vec", Seq("id"))
    val q = bucketed(
      queries.select(col("qid"), col("qvec").cast("array<double>").as("qvec")), "qvec", Seq("qid"))
    val joined = c.join(broadcast(q), Seq("table", "bucket"))
      .filter(col("id") =!= col("qid"))
      .dropDuplicates("qid", "id")
      .withColumn("cos", round(cosine(col("vec"), col("qvec")), scale))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("id").asc)
    joined.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("id").as("neighbor"), col("cos"), col("rank"))
  }

  /** All-pairs cosine-similar pairs: (id_a, id_b, cos) with id_a < id_b
    * and round(cos, `scale`) ≥ `threshold` — the corpus×corpus twin of
    * [[bruteForceTopK]]/[[lshTopK]]'s query→corpus search, feeding
    * semantic dedup (SemDeDup-style keep-lists, embedding near-dup
    * clusters).
    *
    * Measured-path (the same idiom as
    * [[ConnectedComponents]].localThreshold): at or below
    * `localThreshold` MEASURED corpus rows, pairs come from the exact
    * triangular comparison — n(n−1)/2 cosines, a nested-loop join by
    * construction, which is both affordable and the only EXACT shape at
    * that size. Above the bound, candidates come from a multi-table
    * sign-LSH bucket EQUI-join (a pair is a candidate iff some table
    * assigns both vectors the same bucket) and only candidates pay an
    * exact-cosine verification, so the at-scale plan contains no
    * cartesian product / nested loop anywhere (asserted in PlanSpec).
    *
    * The bucketed tier is approximate with the standard sign-LSH recall
    * 1−(1−p^bits)^tables, p = 1−θ/π: at the near-dup thresholds semantic
    * dedup runs at (cos ≥ 0.9 → p ≈ 0.9) the defaults give ≥ 98% recall;
    * low thresholds (≲ 0.5) need fewer bits / more tables — and an
    * all-pairs result that dense is quadratic in SIZE anyway, no
    * candidate scheme escapes that. Candidate rows are THIN (bkey + two
    * ids); vectors are re-fetched per side AFTER dedup, broadcast when
    * the measured corpus volume (n·dim doubles ≤ ~100 MB) allows, shuffle
    * otherwise. A bucket holding the same half-space m times yields
    * m(m−1)/2 candidate rows per table — size `bits` to the corpus
    * (buckets ≈ 2^bits ≫ skew) and let AQE split stragglers.
    *
    * @param corpus (id: long, vec: array<float|double>)
    */
  def cosinePairs(corpus: DataFrame, threshold: Double, dim: Int,
      bits: Int = 8, tables: Int = 8, scale: Int = 4,
      localThreshold: Long = 10000L): DataFrame = {
    val e = corpus
      .select(col("id"), col("vec").cast("array<double>").as("v"))
      .withColumn("nrm", norm(col("v")))
      .localCheckpoint() // measured below; reused by candidates + verify
    val n = e.count()
    val cosCol = round(
      when(col("n_a") * col("n_b") === 0.0, 0.0)
        .otherwise(dot(col("v_a"), col("v_b")) / (col("n_a") * col("n_b"))), scale)

    val va = e.select(col("id").as("id_a"), col("v").as("v_a"), col("nrm").as("n_a"))
    val vb = e.select(col("id").as("id_b"), col("v").as("v_b"), col("nrm").as("n_b"))
    if (n <= localThreshold) {
      va.join(vb, col("id_a") < col("id_b"))
        .withColumn("cos", cosCol)
        .filter(col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    } else {
      val keyed = e.select(col("id"),
        lshPostingKey(col("v"), bits, dim, tables).as("bkey"))
      val cand = keyed.select(col("bkey"), col("id").as("id_a"))
        .join(keyed.select(col("bkey"), col("id").as("id_b")), Seq("bkey"))
        .filter(col("id_a") < col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates("id_a", "id_b")
      // checkpointed frames carry no size stats → hint from measured volume
      val bcastOk = n <= 100000L && n * dim <= 12500000L
      def hinted(df: DataFrame) = if (bcastOk) broadcast(df) else df
      cand.join(hinted(va), "id_a").join(hinted(vb), "id_b")
        .withColumn("cos", cosCol)
        .filter(col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    }
  }

  /** Flattened (table, bucket) posting key for the persisted index. */
  private def lshPostingKey(vec: Column, bits: Int, dim: Int, tables: Int): Column =
    explode(array((0 until tables).map { t =>
      lit(t.toLong * (1L << bits)) + lshBucket(vec, bits, dim, seed = 7L + t)
    }: _*))

  /** Persist the multi-table sign-LSH index as a BUCKETED postings table —
    * "hash once at ingest, probe many times": each corpus vector writes one
    * posting row per hash table, keyed by a flattened (table, bucket) id
    * and laid out with [[graft.sources.TableWriter.writeBucketed]] so the
    * posting key determines the FILE a row lands in. Probes then prune at
    * the scan ([[probeLshIndex]]); re-hashing the corpus per query batch —
    * what [[lshTopK]] does — disappears entirely. Postings carry the
    * vector (tables× duplication) so probing never joins back to the
    * corpus; for fatter vectors store (bkey, id) postings and join the
    * candidates to a corpus table by id instead — same probe shape.
    */
  def buildLshIndex(corpus: DataFrame, table: String, path: String,
      bits: Int, dim: Int, tables: Int = 8, nBuckets: Int = 16): Unit = {
    val c = corpus.select(col("id"), col("vec").cast("array<double>").as("vec"))
    graft.sources.TableWriter.writeBucketed(
      c.select(col("id"), col("vec"),
        lshPostingKey(col("vec"), bits, dim, tables).as("bkey")),
      table, path, "bkey", nBuckets)
  }

  /** Probe a [[buildLshIndex]] table: the query batch's posting keys are
    * collected (|queries| × tables values — bounded metadata) into an IN
    * filter, which Spark turns into BUCKET PRUNING on the index scan —
    * only the files holding matching buckets are read. Candidates then
    * score and rank exactly as [[lshTopK]]; given the same (bits, dim,
    * tables) the output is row-identical to the in-memory path.
    */
  def probeLshIndex(spark: org.apache.spark.sql.SparkSession, table: String,
      queries: DataFrame, k: Int, bits: Int, dim: Int,
      tables: Int = 8, scale: Int = 4): DataFrame = {
    val q = queries.select(col("qid"), col("qvec").cast("array<double>").as("qvec"))
      .select(col("qid"), col("qvec"),
        lshPostingKey(col("qvec"), bits, dim, tables).as("bkey"))
      .localCheckpoint() // tiny; feeds both the pruning-key collect + the join
    val keys = q.select("bkey").distinct().collect().map(_.getLong(0))
    val cand = spark.table(table)
      .filter(col("bkey").isin(keys.map(Long.box): _*))
      .join(broadcast(q), Seq("bkey"))
      .filter(col("id") =!= col("qid"))
      .dropDuplicates("qid", "id")
      .withColumn("cos", round(cosine(col("vec"), col("qvec")), scale))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("id").asc)
    cand.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("id").as("neighbor"), col("cos"), col("rank"))
  }
}
