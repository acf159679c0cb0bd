package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class BpeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("merge application is greedy left-to-right BPE, overlap-safe") {
    val aa = Array("a", "a")
    // [a,a,a] -> [aa,a]; [a,a,a,a] -> [aa,aa]
    assert(Bpe.tokenCount("aaa", aa) == 2)
    assert(Bpe.tokenCount("aaaa", aa) == 2)
    assert(Bpe.tokenCount("aaaaa", aa) == 3)
    // rank order matters: (a,b) then (ab,c) chains; (b,c) never fires after
    val chain = Array("a", "b", "ab", "c")
    assert(Bpe.tokenCount("abc", chain) == 1)   // a+b -> ab, ab+c -> abc
    assert(Bpe.tokenCount("cab", chain) == 2)   // c, ab
    // no merges: one token per char
    assert(Bpe.tokenCount("xyz", Array.empty[String]) == 3)
  }

  test("pre-tokenizer splits words, numbers and punctuation like the oracle regex") {
    assert(Bpe.preTokens("Hello, world 42!").toSeq
      == Seq("hello", ",", "world", "42", "!"))
  }

  test("countTokens sums cached per-word counts over a text") {
    val flat = Bpe.Merges60.flatMap(m => Seq(m._1, m._2))
    val one = Bpe.tokenCount("batch", flat)
    assert(one == 1) // "batch" is fully merged by the trained table
    val s = org.apache.spark.unsafe.types.UTF8String.fromString("batch batch scan")
    assert(Bpe.countTokens(s, flat) == one * 2 + Bpe.tokenCount("scan", flat))
  }

  test("Merges60 is exactly what training on the documents corpus yields") {
    val docs = graft.Tables(spark, "/root/testdata/sf0.01", "documents")
    val trained = Bpe.train(docs, "text", 60)
    assert(trained.toSeq == Bpe.Merges60.toSeq,
      "embedded merge table no longer matches its training provenance")
  }

  test("trainWordTypes bounds the driver collect: floor drops singletons, cap takes top-N") {
    import spark.implicits._
    // 200 singleton types + 3 heavy types; unfloored would collect 203.
    // Letter-only singletons: the pre-tokenizer would split digits off.
    val docs = ((0 until 200).map(i =>
      s"${('a' + i / 26).toChar}${('a' + i % 26).toChar}zz") ++
      Seq.fill(9)("alpha") ++ Seq.fill(7)("beta") ++ Seq.fill(5)("gamma"))
      .map(w => Tuple1(w)).toDF("text")
    val floored = Bpe.trainWordTypes(docs, "text", minCount = 2L, maxWordTypes = 0)
    assert(floored.map(_._1).sorted.toSeq == Seq("alpha", "beta", "gamma"))
    assert(floored.forall(_._2 >= 2L))
    val capped = Bpe.trainWordTypes(docs, "text", minCount = 2L, maxWordTypes = 2)
    assert(capped.map(_._1).toSet == Set("alpha", "beta"),
      "cap must keep the highest-count types deterministically")
    // uncapped, unfloored really does see every singleton (the 100 TB hazard)
    val unbounded = Bpe.trainWordTypes(docs, "text", minCount = 1L, maxWordTypes = 0)
    assert(unbounded.length == 203)
  }

  test("bpe_token_count stays codegen (no UDF in the plan)") {
    import spark.implicits._
    val df = Seq("the customer batch").toDF("text")
      .select(Bpe.bpe_token_count($"text", Bpe.Merges60).as("n"))
    assert(!df.queryExecution.executedPlan.toString.contains("UDF"))
    assert(df.collect().head.getLong(0) > 0)
  }
}
