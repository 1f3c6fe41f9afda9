package graft

import org.apache.spark.sql.SparkSession
import graft.pipeline._
import graft.sources._
/** Example entry point: both reference pipelines end-to-end on inline
  * fixture data — role resolution, coercion, lookup join, position, nest,
  * KV sink, entity dedup, consolidation, link fan-out, SQL functions.
  * Run: `sbt "runMain graft.Demo"`.
  */
object Demo extends App {
  val spark = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions","4").config("spark.ui.enabled","false").getOrCreate()
  spark.sparkContext.setLogLevel("ERROR")
  import spark.implicits._
  val issues = Seq(
    ("AAPL","Climate","10","5","3"),("AAPL","Board","1","2","9"),
    ("MSFT","Climate","4","4","4"),("ZZZZ","Gone","1","1","1"))
    .toDF("TICKER","ISSUE_NAME","against","neutral","pro")
  val tickers = Seq(("AAPL","c_apple"),("MSFT","c_msft")).toDF("ticker","company_id")
  val res = IssuesPipeline.run(issues, tickers)
  println("== derived =="); res.derived.show(false)
  println("== nested =="); res.nested.show(false)
  println("== unmapped =="); res.unmappedTickers.show(false)
  val dir = "/tmp/demo_sink"
  val report = KeyValueSink.write(
    res.nested.selectExpr("company_id","to_json(entries) AS doc"), "company_id",
    () => new FsKeyValueSink(dir))
  println(s"sink report: $report")
  val execs = Seq(
    ("John Smith","CEO","1 Main St","Acme"),("Smith, John","CEO","1 Main St","Acme Corp"),
    ("Jane Doe","CTO","2 Oak Av","Globex")).toDF("name","title","address","company")
  val er = ExecutiveDedupPipeline.run(spark, execs)
  println("== persons =="); er.persons.show(false)
  println("== links =="); er.links.show(false)
  GraftExtensions.register(spark)
  spark.sql("SELECT token_sort_ratio('musk, elon','elon musk') AS sim").show()

  // the LLM-curation composition: quality gate -> dedup -> benchmark
  // decontamination -> token-budget shards + digest manifest
  val corpus = Seq(
    (10L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (11L, "the quick brown fox jumps over the lazy dog near the river bank today"), // exact dup
    (12L, "a careful survey of distributed query engines and their shuffle strategies"),
    // contaminated: scores ABOVE the gate, then shares 4 distinct 5-gram
    // spans with the benchmark doc — decontamination's catch, not quality's
    (13L, "the quick brown fox near the river bank benchmark question alpha beta gamma delta epsilon zeta"),
    (14L, "zzz qqq xxx kkk jjj vvv www"), // junk: negative logit, quality-dropped
    (15L, "partitioned joins broadcast the small side and shuffle the large one by key"))
    .toDF("id", "text")
  val benchDocs = Seq(
    (1L, "benchmark question alpha beta gamma delta epsilon zeta eta theta iota kappa"))
    .toDF("id", "text")
  val cur = CorpusCuration.run(spark, corpus, benchDocs, shardBudget = 24L)
  println("== curation funnel =="); cur.funnel.orderBy("stage").show(false)
  println("== curated shards =="); cur.kept.orderBy("off").show(false)
  println("== shard manifest =="); cur.manifest.orderBy("shard").show(false)

  // tokenizer induction on what SURVIVED curation (train on the data you
  // ship, not the data you dropped), then tokenize an unseen word
  val merges = graft.operators.BpeTrainer.train(cur.kept, "text", nMerges = 8)
  println("== BPE merges =="); merges.orderBy("rank").show(false)
  val learned = merges.orderBy("rank").collect()
    .map(r => (r.getString(1), r.getString(2))).toSeq
  Seq("quickest").toDF("w")
    .select(org.apache.spark.sql.functions.col("w"),
      graft.operators.BpeTrainer.applyMerges(
        graft.operators.BpeTrainer.charSyms(
          org.apache.spark.sql.functions.col("w")), learned).as("tokens"))
    .show(false)
}
