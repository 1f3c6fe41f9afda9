package graft

import org.apache.spark.sql.functions._

import graft.operators.BpeTrainer

class BpeSpec extends SparkSpec {

  /** Reference implementation: Sennrich-style BPE over a weighted word
    * table, all in local Scala — the distributed trainer must reproduce
    * its merge table exactly.
    */
  // code-POINT symbols, matching Spark's substr/length semantics — a
  // UTF-16 code-unit split (w.map(_.toString)) would halve
  // supplementary-plane characters into surrogate fragments
  private def codePoints(w: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out.result()
  }

  private def naiveBpe(wordFreq: Map[String, Long], nMerges: Int,
      minPairFreq: Long = 2L): Seq[(Int, String, String, Long)] = {
    var table: Map[Vector[String], Long] = wordFreq.map { case (w, f) =>
      (codePoints(w) :+ BpeTrainer.EndOfWord) -> f
    }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var rank = 0
    var done = false
    while (rank < nMerges && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      table.foreach { case (syms, f) =>
        syms.sliding(2).filter(_.size == 2).foreach { p =>
          counts((p(0), p(1))) = counts.getOrElse((p(0), p(1)), 0L) + f
        }
      }
      val best = counts.toSeq
        .sortBy { case ((l, r), pf) => (-pf, l, r) }
        .headOption
      best match {
        case Some(((l, r), pf)) if pf >= minPairFreq =>
          rank += 1
          merges += ((rank, l, r, pf))
          table = table.map { case (syms, f) => (localMerge(syms, l, r), f) }
            .groupBy(_._1).map { case (k, vs) => k -> vs.values.sum }
        case _ => done = true
      }
    }
    merges.toSeq
  }

  private def localMerge(syms: Vector[String], a: String, b: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  private val corpus = Seq(
    "low low low low low",
    "lower lower newest newest",
    "newest newest newest newest",
    "widest widest widest",
    "the newest gadget is the widest one",
    // supplementary-plane characters: one emoji = ONE symbol on both
    // engines (code points, not UTF-16 halves)
    "😀😀ha 😀😀ha naïve naïve")

  test("distributed merge table equals the naive local trainer exactly") {
    import spark.implicits._
    val docs = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val got = BpeTrainer.train(docs, "text", nMerges = 12)
      .orderBy("rank")
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    val wordFreq = corpus.flatMap(_.split("\\s+")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, ws) => w -> ws.size.toLong }
    val want = naiveBpe(wordFreq, nMerges = 12)
    assert(got == want, s"\ngot:  $got\nwant: $want")
    assert(got.nonEmpty && got.size <= 12)
  }

  test("mergeAdjacent is greedy left-to-right and non-overlapping") {
    import spark.implicits._
    val rows = Seq(
      Seq("l", "l", "l"),           // odd run: first pair merges, tail stays
      Seq("l", "l", "l", "l"),      // even run: two merges
      Seq("a", "l", "l", "b"),      // interior pair
      Seq("l", "x", "l"),           // no adjacency, untouched
      Seq("ll", "l"),               // merged symbol does not re-match (l,l)
      Seq.empty[String])
    val out = rows.toDF("s")
      .select(BpeTrainer.mergeAdjacent(col("s"), "l", "l").as("m"))
      .collect().map(_.getSeq[String](0).toList)
    assert(out(0) == List("ll", "l"))
    assert(out(1) == List("ll", "ll"))
    assert(out(2) == List("a", "ll", "b"))
    assert(out(3) == List("l", "x", "l"))
    assert(out(4) == List("ll", "l"))
    assert(out(5) == Nil)
  }

  test("charSyms of the empty word is just the sentinel (descending-sequence guard)") {
    import spark.implicits._
    val out = Seq("", "a").toDF("w")
      .select(BpeTrainer.charSyms(col("w")).as("s")).collect()
    assert(out(0).getSeq[String](0) == Seq(BpeTrainer.EndOfWord))
    assert(out(1).getSeq[String](0) == Seq("a", BpeTrainer.EndOfWord))
  }

  test("applyMerges tokenizes unseen words with the learned table") {
    import spark.implicits._
    val docs = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val merges = BpeTrainer.train(docs, "text", nMerges = 12)
      .orderBy("rank").collect().map(r => (r.getString(1), r.getString(2))).toSeq
    // "lowest" never appears in the corpus, but its pieces do
    val toks = Seq("lowest").toDF("w")
      .select(BpeTrainer.applyMerges(BpeTrainer.charSyms(col("w")), merges).as("t"))
      .collect().head.getSeq[String](0).toList
    // whatever the exact segmentation, it must reassemble the word + sentinel
    assert(toks.mkString == "lowest" + BpeTrainer.EndOfWord, toks.toString)
    assert(toks.length < "lowest".length + 1, s"no compression learned: $toks")
  }

  test("training is deterministic across partitionings") {
    import spark.implicits._
    val docs = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val a = BpeTrainer.train(docs.repartition(7), "text", nMerges = 8)
      .orderBy("rank").collect().toSeq
    val b = BpeTrainer.train(docs.coalesce(1), "text", nMerges = 8)
      .orderBy("rank").collect().toSeq
    assert(a == b)
  }

  test("q117 encode: covers every wordful doc; tokens bounded by raw symbols") {
    val rows = SparkEntry.queries("q117_bpe_encode")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nWords, nToks, comp) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      // each word yields between 1 and len+1 symbols; 10 merges can only shrink
      assert(nToks >= nWords, s"each word is at least one token: $r")
      assert(comp >= 1.0, s"merges cannot expand the symbol stream: $r")
    }
    // coverage: exactly the docs with >= 1 whitespace word
    val expected = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(size(org.apache.spark.sql.functions.filter(
        split(coalesce(col("text"), lit("")), "\\s+"),
        x => length(x) > 0)).as("n"))
      .filter(col("n") >= 1).count()
    assert(rows.length.toLong == expected)
  }
}
