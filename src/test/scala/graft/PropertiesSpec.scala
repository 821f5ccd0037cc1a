package graft

import graft.expressions.CanonicalUrl
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based tests (SURVEY.md §5 item 3). The canonicalizer's pure
  * core is checked directly (it's the same static method codegen calls);
  * engine-level idempotency properties (enqueue-twice, upsert-twice) are
  * covered in PipelineSpec/FunctionsSpec with DataFrames. */
class PropertiesSpec extends AnyFunSuite {

  private def check(prop: Prop): Unit = {
    val result = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(result.passed, result.status.toString)
  }

  private val keyGen = Gen.oneOf(
    Gen.oneOf(CanonicalUrl.DropParams.toSeq),
    Gen.alphaLowerStr.suchThat(_.nonEmpty).map(_.take(8)))
  private val paramGen = for {
    k <- keyGen
    v <- Gen.alphaNumStr.map(_.take(6))
  } yield s"$k=$v"
  private val urlGen = for {
    host <- Gen.oneOf("x.com", "jobs.example.org", "boards.greenhouse.io")
    path <- Gen.listOfN(2, Gen.alphaLowerStr.map(_.take(5))).map(_.mkString("/"))
    params <- Gen.listOf(paramGen).map(_.take(6))
    frag <- Gen.oneOf("", "#apply", "#x")
  } yield {
    val q = if (params.isEmpty) "" else params.mkString("?", "&", "")
    s"https://$host/$path$q$frag"
  }

  test("canonicalize is idempotent: f(f(u)) == f(u)") {
    check(Prop.forAll(urlGen) { u =>
      val once = CanonicalUrl.canonicalize(u)
      CanonicalUrl.canonicalize(once) == once
    })
  }

  test("canonicalize never leaves a dropped param in the query") {
    check(Prop.forAll(urlGen) { u =>
      val out = CanonicalUrl.canonicalize(u)
      val qStart = out.indexOf('?')
      if (qStart < 0) true
      else {
        val hashIdx = out.indexOf('#', qStart)
        val qEnd = if (hashIdx < 0) out.length else hashIdx
        val keys = out.substring(qStart + 1, qEnd).split("&", -1)
          .map(p => p.takeWhile(_ != '=')).toSet
        keys.intersect(CanonicalUrl.DropParams).isEmpty
      }
    })
  }

  test("canonicalize preserves scheme+host+path and fragment") {
    check(Prop.forAll(urlGen) { u =>
      val out = CanonicalUrl.canonicalize(u)
      val prefix = u.takeWhile(_ != '?')
      val frag = u.dropWhile(_ != '#')
      out.startsWith(prefix.takeWhile(_ != '#')) &&
        (frag.isEmpty || out.endsWith(frag))
    })
  }

  test("canonicalize keeps non-tracking params in order") {
    check(Prop.forAll(urlGen) { u =>
      def keptParams(s: String): Seq[String] = {
        val qStart = s.indexOf('?')
        if (qStart < 0) Seq.empty
        else {
          val hashIdx = s.indexOf('#', qStart)
          val qEnd = if (hashIdx < 0) s.length else hashIdx
          s.substring(qStart + 1, qEnd).split("&", -1).toSeq
            .filter(p => !CanonicalUrl.DropParams.contains(p.takeWhile(_ != '=')))
        }
      }
      keptParams(CanonicalUrl.canonicalize(u)) == keptParams(u)
    })
  }

  private val hashesGen = Gen.oneOf(8, 16, 24, 32, 48, 64, 96, 128)
  private val jaccardGen = Gen.choose(0.05, 0.95)

  test("chooseBands returns a divisor pair no other divisor beats") {
    check(Prop.forAll(hashesGen, jaccardGen) { (n, t) =>
      val (b, r) = graft.dedup.Dedup.chooseBands(n, t)
      def dist(bb: Int) = math.abs(math.pow(1.0 / bb, bb.toDouble / n) - t)
      b * r == n && (1 to n).filter(n % _ == 0).forall(dist(b) <= dist(_))
    })
  }

  test("candidateProbability is a monotone S-curve within [0, 1]") {
    check(Prop.forAll(jaccardGen, jaccardGen, hashesGen) { (s1, s2, n) =>
      val (b, r) = graft.dedup.Dedup.chooseBands(n, 0.5)
      val (lo, hi) = (math.min(s1, s2), math.max(s1, s2))
      val (pLo, pHi) = (graft.dedup.Dedup.candidateProbability(lo, b, r),
        graft.dedup.Dedup.candidateProbability(hi, b, r))
      pLo >= 0.0 && pHi <= 1.0 && pLo <= pHi
    })
  }
}
