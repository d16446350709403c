package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.EngineSession

/** Pins the BPE merge-application algebra (Q-llm-38): greedy
  * left-to-right NON-overlapping pair gluing over a space-separated
  * symbol sequence — the exact fold both engines run (Spark aggregate()
  * == DuckDB list_reduce by construction; the oracle hash-match proves
  * cross-engine equality, this spec proves the semantics are BPE's). */
class BpeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = EngineSession.getOrCreate("graft-test")

  private def mergeOnce(s: String, a: String, b: String): String = {
    import spark.implicits._
    Seq(s).toDF("s").select(expr(
      s"""aggregate(slice(split(s, ' '), 2, size(split(s, ' ')) - 1),
          split(s, ' ')[0],
          (acc, x) -> CASE WHEN x = '$b'
                            AND (acc = '$a' OR acc LIKE '% $a')
                      THEN concat(substr(acc, 1, length(acc) - ${a.length}), '$a$b')
                      ELSE concat(acc, ' ', x) END)""").as("m"))
      .head().getString(0)
  }

  test("merges every non-adjacent occurrence") {
    assert(mergeOnce("x a b a b y", "a", "b") == "x ab ab y")
  }

  test("self-pair merges are greedy and non-overlapping") {
    assert(mergeOnce("a a a", "a", "a") == "aa a")
    assert(mergeOnce("a a a a", "a", "a") == "aa aa")
  }

  test("a freshly merged token does not re-merge in the same round") {
    // pair (a, b) over "a b b": first two glue to ab; 'ab' != 'a' so the
    // trailing b stays
    assert(mergeOnce("a b b", "a", "b") == "ab b")
  }

  test("token-boundary safety: 'xa b' does not match pair (a, b)") {
    assert(mergeOnce("xa b", "a", "b") == "xa b")
  }

  test("single-symbol sequences fold to themselves") {
    assert(mergeOnce("ab", "a", "b") == "ab")
  }

  test("multi-char merged symbols participate in later rounds") {
    assert(mergeOnce("er t", "er", "t") == "ert")
    assert(mergeOnce("x er t", "er", "t") == "x ert")
  }
}
