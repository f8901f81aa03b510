package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LineDedupSpec extends SparkSpec {
  import spark.implicits._

  // lineTokens = 2 keeps the fixtures readable: each pair of tokens is a line
  private def run(docs: Seq[(Long, String)], minDocs: Int = 2) =
    LineDedup.dropBoilerplateLines(docs.toDF("doc_id", "text"), lineTokens = 2, minDocs = minDocs)
      .select("doc_id", "text", "n_lines", "n_removed")
      .as[(Long, String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3, r._4)).toMap

  test("a line shared by two docs is scrubbed from both; unique lines survive in order") {
    val out = run(Seq(
      (1L, "hello world foo bar tail one"), // lines: "hello world", "foo bar", "tail one"
      (2L, "foo bar something else")))      // lines: "foo bar", "something else"
    assert(out(1L) == (("hello world tail one", 3L, 1L)))
    assert(out(2L) == (("something else", 2L, 1L)))
  }

  test("full copies are fully scrubbed, clean docs pass through untouched") {
    val out = run(Seq(
      (1L, "a b c d"),
      (2L, "a b c d"),   // exact copy → every line duplicated
      (3L, "x y z w")))
    assert(out(1L) == (("", 2L, 2L)))
    assert(out(2L) == (("", 2L, 2L)))
    assert(out(3L) == (("x y z w", 2L, 0L)))
  }

  test("minDocs bar: a line in only 2 docs survives at minDocs = 3") {
    val out = run(Seq((1L, "a b"), (2L, "a b"), (3L, "c d")), minDocs = 3)
    assert(out(1L) == (("a b", 1L, 0L)))
    assert(out(2L) == (("a b", 1L, 0L)))
  }

  test("within-doc repetition is NOT boilerplate: distinct-doc count stays 1") {
    val out = run(Seq((1L, "a b a b"), (2L, "c d")))
    // "a b" occurs twice but only in doc 1 → kept both times
    assert(out(1L) == (("a b a b", 2L, 0L)))
  }

  test("empty and whitespace-only docs survive as ('', 0, 0) — never silently dropped") {
    val out = run(Seq((1L, ""), (2L, "   "), (3L, "a b")))
    assert(out(1L) == (("", 0L, 0L)))
    assert(out(2L) == (("", 0L, 0L)))
    assert(out(3L) == (("a b", 1L, 0L)))
  }

  test("ragged tail chunk forms its own line and can itself be boilerplate") {
    val out = run(Seq(
      (1L, "p q r"),   // lines: "p q", "r"
      (2L, "s t r")))  // lines: "s t", "r"  → "r" shared
    assert(out(1L) == (("p q", 2L, 1L)))
    assert(out(2L) == (("s t", 2L, 1L)))
  }
}
