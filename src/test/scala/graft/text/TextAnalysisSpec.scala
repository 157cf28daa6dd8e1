package graft.text

import graft.sketch.MinHash
import org.scalatest.funsuite.AnyFunSuite

class TextAnalysisSpec extends AnyFunSuite {

  test("language ID on hand-labeled fixtures") {
    assert(TextAnalysis.detectLanguage(
      "the cat sat on the mat and it was happy with this") === "en")
    assert(TextAnalysis.detectLanguage(
      "der Hund und die Katze sind auf dem Tisch mit einem Ball") === "de")
    assert(TextAnalysis.detectLanguage(
      "le chat est dans la maison et les enfants sont pour une pomme") === "fr")
    assert(TextAnalysis.detectLanguage(
      "el perro y la casa son de los niños con una pelota") === "es")
    assert(TextAnalysis.detectLanguage("xyzzy plugh quux") === "und")
    assert(TextAnalysis.detectLanguage("") === "und")
  }

  test("quality score components and range") {
    assert(TextAnalysis.qualityScore("") === 0.0)
    // 100+ distinct alpha tokens → all three components = 1
    val perfect = (1 to 120).map(i => "w" + ('a' + i % 26).toChar + i.toString)
      .map(_.filter(_.isLetter)) // alpha-only tokens
    val distinctPerfect = (1 to 120).map(i => ("abcdefghij" * 3).substring(i % 10, i % 10 + 5) + "x" * (i / 10))
    val s = TextAnalysis.qualityScore(distinctPerfect.mkString(" "))
    assert(s > 0.9 && s <= 1.0, s.toString)
    // repetitive junk scores low on diversity
    val junk = Array.fill(100)("11!").mkString(" ")
    assert(TextAnalysis.qualityScore(junk) < 0.5)
  }

  test("shingles: n-grams of the token stream, degenerate short docs") {
    assert(TextAnalysis.shingles("a b c d", 3) === Set("a b c", "b c d"))
    assert(TextAnalysis.shingles("a b", 3) === Set("a b"))
  }

  test("BPE-ish tokenization splits letter/digit/symbol runs") {
    assert(TextAnalysis.bpeIshTokens("abc123+x").toSeq === Seq("abc", "123", "+", "x"))
  }

  test("near-dup docs share most minhash band buckets; unrelated share none") {
    val doc = (1 to 100).map(i => s"tok$i").mkString(" ")
    val nearDup = (1 to 100).map(i => if (i == 50) "CHANGED" else s"tok$i").mkString(" ")
    val unrelated = (1 to 100).map(i => s"other$i").mkString(" ")
    def bands(t: String) = MinHash.bandHashes(
      MinHash.signature(TextAnalysis.shingles(t, 3), 128), 32, 4).toSet
    val shared = bands(doc).intersect(bands(nearDup)).size
    assert(shared >= 16, s"near-dup shares only $shared/32 bands")
    assert(bands(doc).intersect(bands(unrelated)).isEmpty)
  }
}
