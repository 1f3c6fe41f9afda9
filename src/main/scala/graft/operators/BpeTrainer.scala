package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding vocabulary induction as iterative DataFrame
  * aggregation — the subword-tokenizer trainer of the LLM-pipeline
  * suite (Sennrich et al. 2016's word-internal BPE, the scheme the
  * mainstream tokenizer trainers implement).
  *
  * The scale shape is the same collapse the dedup family leans on: the
  * corpus is reduced ONCE to its distinct-word table with frequencies
  * (one shuffle — token-count scale, map-side combined; Zipf keeps the
  * distinct table orders of magnitude smaller than the corpus), and
  * every merge iteration then runs over that weighted word table alone.
  * Per iteration: adjacent-pair explode → grouped weighted count →
  * global argmax via sort+limit(1) (the q76 rule — never a global
  * window), and a one-row collect. Driver state is the merge table
  * itself (`nMerges` rows) — nothing else ever leaves the cluster, so
  * the trainer survives a 100 TB corpus exactly as well as its word
  * count does.
  *
  * Determinism: pair counts are exact long sums; argmax ties break on
  * (freq DESC, left ASC, right ASC). Same corpus → same merge table,
  * bit for bit, regardless of partitioning — pinned by the
  * naive-local-parity property test.
  */
object BpeTrainer {

  /** End-of-word marker symbol (a distinct sentinel token, not a
    * character that can appear inside a word after whitespace split).
    */
  val EndOfWord = "</w>"

  /** (rank, left, right, freq) merge table learned from `docs(textCol)`.
    *
    * @param nMerges     maximum merges to learn
    * @param minPairFreq stop early once the best pair's weighted count
    *                    falls below this (rare-tail merges are noise)
    */
  def train(docs: DataFrame, textCol: String, nMerges: Int,
      minPairFreq: Long = 2L): DataFrame = {
    val spark = docs.sparkSession
    require(nMerges >= 1, s"nMerges must be >= 1, got $nMerges")

    // corpus -> distinct weighted words, ONCE; iterations only see this
    val words = docs
      .select(explode(split(coalesce(col(textCol), lit("")), "\\s+")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("freq"))

    // each iteration pins a fresh checkpoint of the (shrinking) word
    // table; the previous iterations' copies are dead weight the moment
    // the new one materializes, so release them instead of letting
    // nMerges pinned block sets pile up (tokenizer vocabs run to 10k+
    // merges). Ownership is the checkpointed RDD reference ITSELF —
    // diffing the context's persistent-RDD set would race with any
    // concurrent checkpoint on a shared session and unpersist a foreign
    // frame, which for truncated-lineage localCheckpoints is fatal.
    var owned: Option[org.apache.spark.rdd.RDD[org.apache.spark.sql.Row]] = None
    def checkpointOwned(df: DataFrame): DataFrame = {
      val r = df.rdd
      r.localCheckpoint()
      r.count() // eager: materialized before the predecessor is released
      owned.foreach(_.unpersist(blocking = false))
      owned = Some(r)
      spark.createDataFrame(r, df.schema)
    }

    // initial symbol sequence: characters + the end-of-word sentinel;
    // iterations re-read this frame, never the corpus
    var cur = checkpointOwned(
      words.select(col("freq"), charSyms(col("word")).as("syms")))

    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var rank = 0
    var done = false
    while (rank < nMerges && !done) {
      val best = cur
        // a fully-merged word (one symbol left) has no adjacent pairs —
        // and sequence(0, -1) would count DOWN, so filter, don't clamp
        .filter(size(col("syms")) >= 2)
        .select(col("freq"),
          explode(transform(sequence(lit(0), size(col("syms")) - 2),
            i => struct(element_at(col("syms"), i + 1).as("l"),
              element_at(col("syms"), i + 2).as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("freq")).as("pf"))
        .orderBy(col("pf").desc, col("l").asc, col("r").asc)
        .limit(1)
        .collect() // bounded: one row per iteration
      if (best.isEmpty || best(0).getLong(2) < minPairFreq) done = true
      else {
        val (l, r, pf) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        rank += 1
        merges += ((rank, l, r, pf))
        // apply the merge and truncate lineage: the word table is small
        // (and shrinks), so the per-iteration pin is cheap insurance
        // against an nMerges-deep HOF chain
        cur = checkpointOwned(
          cur.select(col("freq"), mergeAdjacent(col("syms"), l, r).as("syms")))
      }
    }
    // the merge table lives on the driver — the last word-table
    // checkpoint is dead weight the moment the loop ends
    owned.foreach(_.unpersist(blocking = false))
    import spark.implicits._
    merges.toSeq.toDF("rank", "left", "right", "freq")
  }

  /** One greedy left-to-right, non-overlapping pass replacing adjacent
    * (a, b) with their concatenation — BPE's merge-application step, as
    * a single `aggregate` HOF scan carrying (emitted, pending) state.
    * Non-overlap falls out of the carry: merging consumes both symbols,
    * so "l l l" under (l, l) yields ["ll", "l"], and "l l l l" yields
    * ["ll", "ll"] — the reference implementations' semantics.
    */
  def mergeAdjacent(syms: Column, a: String, b: String): Column = {
    val zero = struct(
      typedLit(Seq.empty[String]).as("out"),
      lit(null).cast("string").as("carry"))
    val step = (acc: Column, x: Column) => {
      val out = acc.getField("out")
      val carry = acc.getField("carry")
      when(carry.isNull, struct(out.as("out"), x.as("carry")))
        .when(carry === lit(a) && x === lit(b),
          struct(concat(out, array(lit(a + b))).as("out"),
            lit(null).cast("string").as("carry")))
        .otherwise(struct(concat(out, array(carry)).as("out"), x.as("carry")))
    }
    val finish = (acc: Column) => {
      val out = acc.getField("out")
      val carry = acc.getField("carry")
      when(carry.isNull, out).otherwise(concat(out, array(carry)))
    }
    aggregate(syms, zero, step, finish)
  }

  /** Tokenize a symbol sequence with a learned merge table: fold the
    * merges in rank order, each a [[mergeAdjacent]] pass — how the
    * trainer's output becomes a tokenizer. `merges` is driver-side rows
    * (rank, left, right, *) — the merge table IS bounded by contract.
    */
  def applyMerges(syms: Column, merges: Seq[(String, String)]): Column =
    merges.foldLeft(syms) { case (c, (l, r)) => mergeAdjacent(c, l, r) }

  /** Initial character+sentinel symbols of one word column. The empty
    * word is guarded explicitly: `sequence(1, 0)` counts DOWN (the same
    * descending-sequence trap the trainer's pair generation filters
    * against), which would fabricate two empty-string symbols.
    */
  def charSyms(word: Column): Column =
    when(length(word) === 0, array(lit(EndOfWord)))
      .otherwise(concat(
        transform(sequence(lit(1), length(word)), i => word.substr(i, lit(1))),
        array(lit(EndOfWord))))

  /** DuckDB twin: the same `nMerges` training iterations unrolled as
    * chained CTEs over a `documents(text)` relation — the
    * [[PageRank.unrolledSql]] move applied to BPE. Each iteration is one
    * argmax CTE (pair explode → weighted count → ORDER BY pf DESC, l, r
    * LIMIT 1 — [[train]]'s exact tie order) and one merge-application
    * CTE. The sequential greedy merge ([[mergeAdjacent]]'s (out, carry)
    * fold) maps onto `list_reduce` directly: DuckDB's fold is
    * left-to-right with the first element as the seed, so symbols are
    * first lifted to (out := [], carry := sym) structs — the lifted first
    * element IS [[mergeAdjacent]]'s zero after its first step, and the
    * lambda is the same three-way carry logic, with the finish step
    * flushing the trailing carry.
    *
    * Caveat (documented, spec-covered): [[train]]'s `minPairFreq` early
    * stop is not expressed — on a corpus where the best pair's count
    * drops below the floor inside `nMerges` iterations the twin would
    * emit low-frequency merges the trainer refuses. The fixture corpora
    * never trigger it at 10 merges (every emitted pf ≫ 2); BpeSpec pins
    * the stop behavior locally.
    */
  def unrolledSql(nMerges: Int): String = {
    // lift: syms -> [{o: '', c: sym}]; reduce: mergeAdjacent.step; the
    // CASE arms mirror the Column `when` chain one-for-one. The emitted
    // prefix `o` is a chr(31)-joined VARCHAR, NOT a list: DuckDB 1.0's
    // list_reduce drops the accumulated value between steps when the
    // struct carries a LIST field (scalar fields fold correctly —
    // verified empirically), so the out-list is string-encoded through
    // the fold and split back after the finish step. ASSUMPTION, not a
    // guarantee: symbols are never empty (chars + merges of non-empties),
    // but 0x1F is NOT whitespace, so a corpus with a literal 0x1F inside
    // a word would carry the separator into a symbol and corrupt the
    // round-trip — the fixtures contain none; pick a different separator
    // before pointing this twin at a corpus that might.
    def mergeApply: String = s"""
      list_filter(string_split(
        CASE WHEN st.c IS NULL THEN st.o ELSE st.o || chr(31) || st.c END,
        chr(31)), x -> x <> '')"""
    def lifted = s"[struct_pack(o := '', c := s) for s in syms]"
    def step(l: String, r: String): String = s"""(a, b) ->
        CASE WHEN a.c IS NULL THEN struct_pack(o := a.o, c := b.c)
             WHEN a.c = $l AND b.c = $r
               THEN struct_pack(o := a.o || chr(31) || $l || $r, c := CAST(NULL AS VARCHAR))
             ELSE struct_pack(o := a.o || chr(31) || a.c, c := b.c) END"""
    val steps = (1 to nMerges).map { i =>
      s"""b$i AS (
      SELECT pr.l AS l, pr.r AS r, CAST(SUM(freq) AS BIGINT) AS pf FROM (
        SELECT freq,
               unnest([struct_pack(l := syms[p], r := syms[p + 1])
                       for p in generate_series(1, len(syms) - 1)]) AS pr
        FROM w${i - 1})
      GROUP BY pr.l, pr.r
      ORDER BY pf DESC, l ASC, r ASC LIMIT 1),
    w$i AS (
      SELECT freq, $mergeApply AS syms FROM (
        SELECT w.freq,
               list_reduce($lifted, ${step("bi.l", "bi.r")}) AS st
        FROM w${i - 1} w CROSS JOIN b$i bi))"""
    }.mkString(",\n    ")
    val out = (1 to nMerges)
      .map(i => s"""SELECT $i AS rank, l AS "left", r AS "right", pf AS freq FROM b$i""")
      .mkString("\n    UNION ALL ")
    s"""
    WITH words AS (
      SELECT word, COUNT(*) AS freq FROM (
        SELECT unnest(string_split_regex(COALESCE(text, ''), '\\s+')) AS word
        FROM documents)
      WHERE length(word) > 0 GROUP BY word),
    w0 AS (
      SELECT freq,
             [word[p] for p in generate_series(1, length(word))] || ['$EndOfWord'] AS syms
      FROM words),
    $steps
    $out""".trim
  }

  /** DuckDB twin of the ENCODE path: the same `nMerges` unrolled training
    * iterations, but the word chain carries the word itself so the final
    * `w$nMerges` doubles as the distinct-word tokenization table —
    * train-then-apply in one statement. The per-document scoring joins
    * the document word stream against that table, mirroring the engine's
    * tokenize-each-distinct-word-once shape (the oracle cannot collect a
    * merge table out of band, so it re-derives it inline; q110 already
    * proves the two derivations agree rank-for-rank).
    */
  def encodeSql(nMerges: Int): String = {
    def mergeApply: String = s"""
      list_filter(string_split(
        CASE WHEN st.c IS NULL THEN st.o ELSE st.o || chr(31) || st.c END,
        chr(31)), x -> x <> '')"""
    def lifted = s"[struct_pack(o := '', c := s) for s in syms]"
    def step(l: String, r: String): String = s"""(a, b) ->
        CASE WHEN a.c IS NULL THEN struct_pack(o := a.o, c := b.c)
             WHEN a.c = $l AND b.c = $r
               THEN struct_pack(o := a.o || chr(31) || $l || $r, c := CAST(NULL AS VARCHAR))
             ELSE struct_pack(o := a.o || chr(31) || a.c, c := b.c) END"""
    val steps = (1 to nMerges).map { i =>
      s"""b$i AS (
      SELECT pr.l AS l, pr.r AS r, CAST(SUM(freq) AS BIGINT) AS pf FROM (
        SELECT freq,
               unnest([struct_pack(l := syms[p], r := syms[p + 1])
                       for p in generate_series(1, len(syms) - 1)]) AS pr
        FROM w${i - 1})
      GROUP BY pr.l, pr.r
      ORDER BY pf DESC, l ASC, r ASC LIMIT 1),
    w$i AS (
      SELECT word, freq, $mergeApply AS syms FROM (
        SELECT w.word, w.freq,
               list_reduce($lifted, ${step("bi.l", "bi.r")}) AS st
        FROM w${i - 1} w CROSS JOIN b$i bi))"""
    }.mkString(",\n    ")
    s"""
    WITH words AS (
      SELECT word, COUNT(*) AS freq FROM (
        SELECT unnest(string_split_regex(COALESCE(text, ''), '\\s+')) AS word
        FROM documents)
      WHERE length(word) > 0 GROUP BY word),
    w0 AS (
      SELECT word, freq,
             [word[p] for p in generate_series(1, length(word))] || ['$EndOfWord'] AS syms
      FROM words),
    $steps,
    enc AS (
      SELECT word, CAST(len(syms) AS BIGINT) AS n_toks,
             CAST(length(word) + 1 AS BIGINT) AS raw_syms
      FROM w$nMerges),
    docw AS (
      SELECT doc_id, word FROM (
        SELECT doc_id,
               unnest(string_split_regex(COALESCE(text, ''), '\\s+')) AS word
        FROM documents)
      WHERE length(word) > 0)
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(n_toks) AS BIGINT) AS n_bpe_tokens,
           round(CAST(SUM(raw_syms) AS DOUBLE) / CAST(SUM(n_toks) AS DOUBLE), 6)
             AS compression
    FROM docw JOIN enc USING (word)
    GROUP BY doc_id""".trim
  }
}
