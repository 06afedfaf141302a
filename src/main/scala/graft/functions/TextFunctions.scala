package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for the LLM-data-pipeline operator set
  * (BASELINE.json north star): tokenization, marker-dictionary language ID,
  * quality features. Everything here is built from codegen'd builtin
  * functions (split / filter / size / transform) — no UDFs — so the text
  * pipeline stays inside whole-stage codegen and scales linearly over
  * document partitions with zero shuffle.
  */
object TextFunctions {

  /** Whitespace tokenization (the corpus is single-space separated). */
  def tokens(text: Column): Column = split(text, " ")

  /** Count of tokens (duplicates included) that appear in `markers`. */
  def markerHits(toks: Column, markers: Seq[String]): Column =
    size(filter(toks, t => array_contains(lit(markers.toArray), t)))

  /** Dictionary-based language-ID heuristic: score each language by marker
    * hits, pick the first language (declaration order) whose score is >= all
    * later ones; all-zero scores → "und". The same (ordered) marker map also
    * generates the DuckDB oracle expression via [[langIdSql]] so both
    * engines share one tie-break rule.
    *
    * With a real multilingual corpus the markers are per-language stopwords;
    * the fixture corpus is synthetic, so these sets are arbitrary but the
    * operator mechanics (dictionary match → scored argmax) are the real
    * thing.
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "fast", "slow"),
    "fr" -> Seq("table", "row", "line"),
    "es" -> Seq("query", "data", "value"),
    "de" -> Seq("window", "filter", "stream"),
    "zh" -> Seq("hash", "merge", "join")
  )

  def langId(text: Column): Column = {
    val toks = tokens(text)
    val scores = LangMarkers.map { case (lang, ms) => lang -> markerHits(toks, ms) }
    val anyHit = scores.map(_._2).reduce(_ + _) > 0
    // first-wins argmax: lang i selected iff score_i >= score_j for all j > i
    val cases = scores.zipWithIndex.map { case ((lang, sc), i) =>
      val laterMax = scores.drop(i + 1).map(_._2)
      val cond = laterMax.foldLeft(anyHit)((acc, other) => acc && sc >= other)
      (cond, lang)
    }
    cases.foldRight(lit("und"): Column) { case ((cond, lang), rest) => when(cond, lang).otherwise(rest) }
  }

  /** DuckDB twin of [[langId]], generated from the same marker map. */
  def langIdSql(textExpr: String): String = {
    def hits(ms: Seq[String]) =
      s"length(list_filter(string_split($textExpr, ' '), t -> list_contains([${ms.map("'" + _ + "'").mkString(",")}], t)))"
    val scores = LangMarkers.map { case (lang, ms) => lang -> hits(ms) }
    val anyHit = scores.map(_._2).mkString("(", " + ", ") > 0")
    val whens = scores.zipWithIndex.map { case ((lang, sc), i) =>
      val conds = anyHit +: scores.drop(i + 1).map { case (_, other) => s"$sc >= $other" }
      s"WHEN ${conds.mkString(" AND ")} THEN '$lang'"
    }
    s"CASE ${whens.mkString(" ")} ELSE 'und' END"
  }

  /** PII patterns shared by the Spark redactor and the DuckDB oracle.
    * Restricted to syntax with identical semantics in Java regex and RE2
    * (character classes, bounded repetition, `\b` word boundaries — no
    * backreferences or lookaround, which RE2 lacks). Order matters:
    * emails are redacted before phones/IPs so an address' digit runs are
    * consumed as part of the email match, not re-matched as a number.
    */
  val PiiPatterns: Seq[(String, String)] = Seq(
    """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}""" -> "<EMAIL>",
    """\b\d{3}-\d{3}-\d{4}\b""" -> "<PHONE>",
    """\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b""" -> "<IP>"
  )

  /** Replace every PII occurrence with its tag. Chained `regexp_replace`
    * stays codegen'd; at 100 TB this is a pure map over document
    * partitions — no shuffle, no UDF. */
  def redactPii(text: Column): Column =
    PiiPatterns.foldLeft(text) { case (c, (re, tag)) => regexp_replace(c, re, tag) }

  /** DuckDB twin of [[redactPii]] (needs the explicit 'g' flag — DuckDB
    * replaces only the first match by default, Spark replaces all). */
  def redactPiiSql(expr: String): String =
    PiiPatterns.foldLeft(expr) { case (e, (re, tag)) =>
      s"regexp_replace($e, '$re', '$tag', 'g')"
    }
}
