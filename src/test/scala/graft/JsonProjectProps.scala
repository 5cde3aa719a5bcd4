package graft

import org.scalacheck.{Gen, Prop, Properties}
import graft.functions.JsonWriters

/** ScalaCheck pin of the json_project escaping contract: byte-identical to
  * Jackson (the engine behind Spark's to_json) on arbitrary strings — the
  * whole correctness argument for swapping the serializer on the document
  * path rests on this equivalence.
  */
object JsonProjectProps extends Properties("jsonEscape") {

  private def jackson(s: String): String = {
    val w = new java.io.StringWriter()
    val gen = new com.fasterxml.jackson.core.JsonFactory().createGenerator(w)
    gen.writeString(s)
    gen.flush()
    w.toString
  }

  private def native(s: String): String = {
    val sb = new java.lang.StringBuilder
    JsonWriters.writeEscaped(sb, s)
    sb.toString
  }

  property("matches Jackson on arbitrary unicode strings") =
    Prop.forAll { (s: String) => native(s) == jackson(s) }

  private val nasty: Gen[String] = Gen.listOf(Gen.oneOf(
    Gen.choose(0.toChar, 0x1F.toChar),          // every control char
    Gen.oneOf('"', '\\', '/', '\b', '\f', '\n', '\r', '\t'),
    Gen.oneOf('ą', 'Š', 'ž', '€', '中'),
    Gen.alphaNumChar)).map(_.mkString)

  property("matches Jackson on control-char/diacritic-dense strings") =
    Prop.forAll(nasty) { s => native(s) == jackson(s) }

  property("surrogate pairs survive round-trip") =
    Prop.forAll(Gen.listOf(Gen.oneOf("😀", "𝕊", "a", "😀"))) { parts =>
      val s = parts.mkString
      native(s) == jackson(s)
    }
}
