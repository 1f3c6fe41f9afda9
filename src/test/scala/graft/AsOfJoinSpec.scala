package graft

import graft.operators.AsOfJoin

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  lazy val right = Seq(
    (1L, 1L, Option(5L), Option.empty[Long]), // t=1: (a=5, b=null)
    (1L, 2L, Option.empty[Long], Option(7L))) // t=2: (a=null, b=7)
    .toDF("k", "t", "a", "b")

  test("carried values always come from the single matched right row") {
    val left = Seq((1L, 3L, "x")).toDF("k", "t", "payload")
    val out = AsOfJoin.asof(left, right, Seq("k"), "t", "t").collect()
    assert(out.length == 1)
    val r = out.head
    // must be the t=2 row verbatim: (null, 7) — NOT a stitched (5, 7)
    assert(r.isNullAt(r.fieldIndex("a")) && r.getLong(r.fieldIndex("b")) == 7L, r.toString)
  }

  test("inner drops unmatched lefts; outer keeps them with null payload") {
    val left = Seq((2L, 9L, "y")).toDF("k", "t", "payload")
    assert(AsOfJoin.asof(left, right, Seq("k"), "t", "t").count() == 0)
    val outer = AsOfJoin.asof(left, right, Seq("k"), "t", "t", inner = false).collect()
    assert(outer.length == 1 && outer.head.isNullAt(outer.head.fieldIndex("b")))
  }

  test("equal timestamps match (<= semantics) and earlier rights are shadowed") {
    val left = Seq((1L, 2L, "x"), (1L, 1L, "y")).toDF("k", "t", "payload")
    val out = AsOfJoin.asof(left, right, Seq("k"), "t", "t").collect()
      .map(r => r.getLong(r.fieldIndex("t")) ->
        (Option(r.get(r.fieldIndex("a"))), Option(r.get(r.fieldIndex("b"))))).toMap
    assert(out(2L) == (None, Some(7L)), "left at t=2 matches right t=2")
    assert(out(1L) == (Some(5L), None), "left at t=1 matches right t=1")
  }

  test("payload name collisions and reserved __ columns are rejected") {
    import spark.implicits._
    val l = Seq((1L, 10L, "x")).toDF("k", "t", "v")
    val r = Seq((1L, 5L, "y")).toDF("k", "rt", "v") // payload "v" on both sides
    val e = intercept[IllegalArgumentException] {
      graft.operators.AsOfJoin.asof(l, r, Seq("k"), "t", "rt")
    }
    assert(e.getMessage.contains("v"))
    // right payload colliding with the LEFT TIME column name
    val rt = Seq((1L, 5L, "y")).toDF("k", "rt", "t")
    val et = intercept[IllegalArgumentException] {
      graft.operators.AsOfJoin.asof(l.select("k", "t"), rt, Seq("k"), "t", "rt")
    }
    assert(et.getMessage.contains("t"))
    val lr = Seq((1L, 10L, "x")).toDF("k", "t", "__r")
    val e2 = intercept[IllegalArgumentException] {
      graft.operators.AsOfJoin.asof(lr, r.toDF("k", "rt", "w"), Seq("k"), "t", "rt")
    }
    assert(e2.getMessage.contains("__r"))
  }
}
