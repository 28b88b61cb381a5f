package graft.functions

import graft.SparkSupport
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextFunctionsSpec extends AnyFunSuite with SparkSupport {
  import spark.implicits._

  test("tokenCount: whitespace tokens, blank → 0") {
    val r = Seq("a b  c", "  ", "one", "x\ty z").toDF("t")
      .select(TextFunctions.tokenCount($"t")).as[Long].collect().toSeq
    assert(r == Seq(3L, 0L, 1L, 3L))
  }

  test("bpeTokenCount: GPT-2-style pre-tokenizer counts (RE2-safe pattern)") {
    val r = Seq("I'll say it's 42% done... maybe", "hello  world", "", "  ",
      "a1b2", "don't stop, won't quit!").toDF("t")
      .select(TextFunctions.bpeTokenCount($"t")).as[Long].collect().toSeq
    assert(r == Seq(10L, 2L, 0L, 0L, 4L, 8L)) // cross-checked against DuckDB regexp_extract_all
  }

  test("permille ratios are integer-stable") {
    val r = Seq(("abc123", 6)).toDF("t", "len")
      .select(TextFunctions.permille(TextFunctions.alphaCount($"t"), length($"t")))
      .as[Long].head()
    assert(r == 500L) // 3 alpha / 6 chars
  }

  test("langId: argmax with alphabetical tie-break") {
    val en = "the cat and the dog is of note"
    val de = "der hund und die katze nicht hier"
    val r = Seq(en, de).toDF("t")
      .select(TextFunctions.langId($"t")).as[String].collect().toSeq
    assert(r == Seq("en", "de"))
    // no markers at all → first alphabetical (de) wins
    val none = Seq("xyzzy plugh").toDF("t")
      .select(TextFunctions.langId($"t")).as[String].head()
    assert(none == "de")
  }

  test("shingles: distinct k-char windows; short text → one padded shingle") {
    val r = Seq("abcde").toDF("t")
      .select(TextFunctions.shingles($"t", 3)).as[Seq[String]].head()
    assert(r == Seq("abc", "bcd", "cde"))
    val short = Seq("ab").toDF("t")
      .select(TextFunctions.shingles($"t", 3)).as[Seq[String]].head()
    assert(short == Seq("ab"))
  }

  test("shingles: CODEPOINT windows on multibyte text — parity with the " +
    "substr-based HOF formulation the compiled expression replaced") {
    // 2-byte (é, ö), 3-byte (汉, 字), and ASCII mixed; windows must slice
    // on codepoints, never bytes, with first-occurrence dedup order
    val texts = Seq("héllo wörld", "汉字abc汉字", "ééé", "aé汉aé汉")
    val df = texts.toDF("t")
    val got = df.select(TextFunctions.shingles($"t", 3)).as[Seq[String]].collect()
    val want = df.select(
      when(length($"t") < 3, array(substring($"t", 1, 3)))
        .otherwise(array_distinct(transform(
          sequence(lit(1), length($"t") - 2), i => substr($"t", i, lit(3)))))
    ).as[Seq[String]].collect()
    assert(got.toSeq == want.toSeq)
    // and a duplicate-window case keeps exactly the old dedup semantics
    assert(got(2) == Seq("ééé").map(identity)) // "ééé" k=3 → one window
  }

  test("minhash signature: deterministic, jaccard-correlated") {
    val df = Seq("the quick brown fox jumps over the lazy dog",
      "the quick brown fox jumps over the lazy cat",
      "completely different words entirely here now").toDF("t")
      .withColumn("sh", TextFunctions.shingles($"t", 4))
      .withColumn("sig", TextFunctions.minhashSignature($"sh", 64))
    val sigs = df.select($"sig").as[Seq[Long]].collect()
    assert(sigs(0).size == 64)
    def agree(a: Seq[Long], b: Seq[Long]) = a.zip(b).count { case (x, y) => x == y }
    assert(agree(sigs(0), sigs(1)) > agree(sigs(0), sigs(2)),
      "similar docs must agree on more minhash components")
    // determinism across evaluations
    val again = df.select($"sig").as[Seq[Long]].collect()
    assert(sigs.toSeq == again.toSeq)
  }

  test("jaccardPermille exact") {
    val r = Seq((Seq("a", "b", "c"), Seq("b", "c", "d"))).toDF("x", "y")
      .select(TextFunctions.jaccardPermille($"x", $"y")).as[Long].head()
    assert(r == 500L) // |{b,c}| / |{a,b,c,d}| = 2/4
  }

  test("simhash: identical → distance 0, similar < dissimilar") {
    val df = Seq("the quick brown fox jumps over the lazy dog",
      "the quick brown fox jumps over the lazy dog",
      "the quick brown fox jumps over the lazy cat",
      "totally unrelated text with other content").toDF("t")
      .withColumn("s", TextFunctions.simhash64(split($"t", " ")))
    val s = df.select($"s").as[Long].collect()
    assert(s(0) == s(1))
    assert(java.lang.Long.bitCount(s(0) ^ s(2)) < java.lang.Long.bitCount(s(0) ^ s(3)))
  }

  test("fingerprint: whitespace-insensitive-ish rolling min; deterministic") {
    val r = Seq("hello world of rolling hashes", "hello world of rolling hashes")
      .toDF("t").select(TextFunctions.fingerprint($"t", 8)).as[Long].collect()
    assert(r(0) == r(1) && r(0) != 0L)
    // a doc sharing a long window with another shares the min candidate pool
    val diff = Seq("zzz").toDF("t")
      .select(TextFunctions.fingerprint($"t", 8)).as[Long].head()
    assert(diff != r(0))
  }

  test("qualityScore: natural text scores above degenerate text") {
    val r = Seq("The quick brown fox jumps over the lazy dog near the river bank",
      "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa",
      "1 2 3 4 5 6 7 8 9 0 ! @ # $ % ^ & * ( )").toDF("t")
      .select(TextFunctions.qualityScore($"t")).as[Long].collect().toSeq
    assert(r(0) > r(1) && r(0) > r(2))
  }
}
