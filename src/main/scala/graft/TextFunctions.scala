package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's scalar string pipeline, re-expressed as native Spark
  * `Column` expressions (whole-stage-codegen friendly) with a single Scala
  * UDF for the one non-relational piece (slug length-capping).
  *
  * Semantics sources (all `/root/reference/`):
  *  - fixcase:            odgovlt.py:32-36
  *  - slugify normalize:  odgovlt.py:39-48   (unidecode at odgovlt.py:44)
  *  - slugify length cap: odgovlt.py:50-69   (golden: tests/test_odgovlt.py:391-399)
  *  - tagify:             odgovlt.py:74-76
  *  - get_package_tags:   odgovlt.py:79-94
  *
  * Everything except the length cap stays inside codegen (no boxing), so the
  * tag/slug pipelines run at scan speed on 100 TB — the UDF is applied only
  * to already-normalized short slugs, never to raw document text.
  */
object TextFunctions {

  /** Transliterate to ASCII (the `unidecode` call at odgovlt.py:44): a
    * native codegen'd expression ([[graft.functions.Unidecode]]) covering
    * the Lithuanian/Latin repertoire (byte-identical to the former
    * `translate` chain), Cyrillic and Greek romanization in Python
    * unidecode's conventions, and an NFD combining-mark-strip fallback for
    * everything decomposable. Unknown scripts pass through to slugify's
    * `[^\w\s-]` strip.
    */
  def unidecode(c: Column): Column = {
    import org.apache.spark.sql.graftbridge.GraftBridge
    GraftBridge.column(graft.functions.Unidecode(GraftBridge.expression(c)))
  }

  /** Lowercase the first letter iff the value starts UpperLower (two cased
    * alphabetic chars, `Xx...`): `Title` → `title`, `ACRONYM` unchanged.
    * (odgovlt.py:32-36 — `value[:2].isalpha() and value[0].isupper() and
    * value[1].islower()`; upper+lower already imply alphabetic.)
    */
  def fixcase(c: Column): Column =
    when(c.rlike("^\\p{Lu}\\p{Ll}"),
      concat(lower(substring(c, 1, 1)), substring(c, 2, Int.MaxValue)))
      .otherwise(c)

  /** Slug normalization (odgovlt.py:39-48): transliterate → drop
    * non-[\w\s-] → trim → lower → collapse [-\s]+ to '-'. Null/empty → ''.
    * Pure codegen'd expression chain — no UDF.
    */
  def slugifyNorm(c: Column): Column = {
    val ascii = unidecode(c)
    val cleaned = regexp_replace(ascii, "[^\\w\\s-]", "")
    val lowered = lower(trim(cleaned))
    val dashed = regexp_replace(lowered, "[-\\s]+", "-")
    when(c.isNull || c === "", lit("")).otherwise(dashed)
  }

  /** The greedy head/tail word-packing length cap (odgovlt.py:50-69).
    *
    * When the slug exceeds `length`: words are taken alternately from the
    * head (first 60%) and the tail (walking backward), with a cost sequence
    * k = 0,2,3,4,... per accepted word; the first word that would overflow
    * stops the loop. Output is `head-words--tail-words` where tail words
    * appear in reverse text order (pinned by the golden test
    * tests/test_odgovlt.py:391-399:
    * `radiacines-saugos--duomenys-saltiniais`).
    */
  def truncateSlug(slug: String, length: Int): String = {
    if (slug == null) ""
    else if (slug.length <= length) slug
    else {
      val words = slug.split("-", -1)
      val split = (words.length * 0.6).toInt
      val head = (0 until split).map(i => (i, true))
      val tail = ((words.length - 1) until (split - 1) by -1).map(i => (i, false))
      val interleaved = (0 until math.max(head.length, tail.length)).flatMap { j =>
        (if (j < head.length) Seq(head(j)) else Nil) ++
          (if (j < tail.length) Seq(tail(j)) else Nil)
      }
      val left = scala.collection.mutable.ArrayBuffer.empty[String]
      val right = scala.collection.mutable.ArrayBuffer.empty[String]
      var total = 0
      var stop = false
      var step = 0
      interleaved.foreach { case (i, isLeft) =>
        if (!stop) {
          val k = if (step == 0) 0 else step + 1
          if (total + words(i).length + k > length) stop = true
          else {
            if (isLeft) left += words(i) else right += words(i)
            total += words(i).length
          }
          step += 1
        }
      }
      left.mkString("-") + "--" + right.mkString("-")
    }
  }

  /** Full slugify (normalize + length cap), default cap 90 as the
    * reference. The cap is a native Catalyst expression
    * ([[graft.functions.SlugTruncate]]) with codegen — no UDF boxing.
    */
  def slugify(c: Column, length: Int = 90): Column = {
    import org.apache.spark.sql.graftbridge.GraftBridge
    GraftBridge.column(graft.functions.SlugTruncate(
      GraftBridge.expression(slugifyNorm(c)),
      org.apache.spark.sql.catalyst.expressions.Literal(length)))
  }

  /** Collapse all non-word runs (unicode-aware, matching Python re.UNICODE
    * at odgovlt.py:75) to single spaces and trim (odgovlt.py:74-76).
    */
  def tagify(c: Column): Column =
    trim(regexp_replace(c, "(?U)\\W+", " "))

  /** The tag pipeline (odgovlt.py:79-94): `;`→`,`, split on `,`, trim,
    * fixcase, drop empties, tagify+lower, keep 2 ≤ len ≤ 100. Preserves
    * input order. Runs as ONE native codegen'd expression
    * ([[graft.functions.TagPipeline]]): the declarative chain below is four
    * stacked higher-order functions whose lambdas are CodegenFallback —
    * interpreted per element, with an intermediate array per layer — on the
    * package-assembly hot path. TagPipelineSpec pins the two forms equal.
    */
  def packageTags(c: Column): Column = graft.functions.TagPipeline(c)

  /** The same pipeline as declarative higher-order functions — kept as the
    * executable specification the native expression is tested against, and
    * as the form to prefer when a step needs to vary per call site.
    */
  def packageTagsHof(c: Column): Column = {
    val parts = split(regexp_replace(c, ";", ","), ",")
    val stripped = transform(parts, t => fixcase(trim(t)))
    val nonEmpty = filter(stripped, t => t =!= "" && t.isNotNull)
    val named = transform(nonEmpty, t => lower(tagify(t)))
    filter(named, t => length(t) >= 2 && length(t) <= 100)
  }
}
