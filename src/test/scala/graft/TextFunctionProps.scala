package graft

import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck properties for the pure-Scala slug truncation algorithm
  * (SURVEY.md §5: property tests for slugify — idempotence, charset, and
  * length behavior are the invariants the reference's golden vector samples).
  */
object TextFunctionProps extends Properties("truncateSlug") {

  private val word: Gen[String] = for {
    n <- Gen.choose(1, 12)
    cs <- Gen.listOfN(n, Gen.alphaLowerChar)
  } yield cs.mkString

  private val slug: Gen[String] = for {
    n <- Gen.choose(1, 30)
    ws <- Gen.listOfN(n, word)
  } yield ws.mkString("-")

  property("short slugs pass through unchanged") = Prop.forAll(slug) { s =>
    TextFunctions.truncateSlug(s, s.length) == s
  }

  property("output only contains slug characters") =
    Prop.forAll(slug, Gen.choose(5, 60)) { (s, cap) =>
      TextFunctions.truncateSlug(s, cap).matches("[a-z-]*")
    }

  property("truncation never grows the slug") =
    Prop.forAll(slug, Gen.choose(5, 60)) { (s, cap) =>
      TextFunctions.truncateSlug(s, cap).length <= math.max(s.length, 2)
    }

  property("long slugs get the head--tail seam") =
    Prop.forAll(slug, Gen.choose(5, 60)) { (s, cap) =>
      val out = TextFunctions.truncateSlug(s, cap)
      (s.length <= cap) || out.contains("--")
    }

  property("truncated output keeps words from the input") =
    Prop.forAll(slug, Gen.choose(5, 60)) { (s, cap) =>
      val words = s.split("-").toSet
      TextFunctions.truncateSlug(s, cap)
        .split("-").filter(_.nonEmpty).forall(words.contains)
    }

  property("null maps to empty") = Prop {
    TextFunctions.truncateSlug(null, 10) == ""
  }
}
