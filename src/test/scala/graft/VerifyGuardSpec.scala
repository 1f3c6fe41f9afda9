package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The Verify preflight guard (round-5 lesson): the driver's comparator
  * coerces DecimalType cells to float on one side only, so a raw decimal
  * output column hash-mismatches even when values are identical
  * ("1234.5" vs "1234.50"). q152 shipped one and cost a round; this guard
  * makes the next violation fail loudly at dump time instead.
  */
class VerifyGuardSpec extends AnyFunSuite {

  test("trips on a DecimalType output column, naming it") {
    val schema = StructType(Seq(
      StructField("k", LongType),
      StructField("revenue", DecimalType(38, 2))))
    val e = intercept[IllegalArgumentException] {
      Verify.assertNoDecimalOutput("q_decimal_test", schema)
    }
    assert(e.getMessage.contains("revenue"))
    assert(e.getMessage.contains("q_decimal_test"))
  }

  test("passes a schema whose sums were cast to DOUBLE (Num.dsum rule)") {
    val schema = StructType(Seq(
      StructField("k", LongType),
      StructField("revenue", DoubleType)))
    Verify.assertNoDecimalOutput("q_ok", schema) // must not throw
  }

  test("trips on decimals nested anywhere in the top-level column list") {
    val schema = StructType(Seq(
      StructField("a", StringType),
      StructField("b", DecimalType(10, 0)),
      StructField("c", DecimalType(38, 6))))
    val e = intercept[IllegalArgumentException] {
      Verify.assertNoDecimalOutput("q_two", schema)
    }
    assert(e.getMessage.contains("b") && e.getMessage.contains("c"))
  }
}
