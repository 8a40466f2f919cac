package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Name-normalization semantics of the scout gazetteer.
  *
  * Two distinct normalizers exist and MUST stay distinct (reference:
  * `sql/migrations/000_init.sql:5-11` vs `ranking.py:5-12`): the SQL-side
  * [[canon]] maps every non-alphanumeric (including `-`) to space, while
  * the query-side [[norm]] keeps `-` and non-ASCII punctuation. The
  * asymmetry is observable (hyphenated query tokens never match canon'd
  * columns) and is preserved here by design (SURVEY.md §7.4).
  *
  * [[canon]] is a pure `Column` composition — it inlines into Catalyst
  * like the reference's DuckDB macro, so predicate pushdown and
  * whole-stage codegen are retained (no UDF boundary).
  */
object Norm {

  /** F1 — `gaz.canon(s)`: NULL→'', non-alphanumerics→space, collapse
    * whitespace runs, lowercase, trim. (`000_init.sql:5-11`)
    *
    * Java `\p{Alnum}` and DuckDB/RE2 `[[:alnum:]]` are both ASCII-only,
    * so the two engines agree on non-ASCII input (both strip it).
    *
    * Documented deviation: the reference macro omits DuckDB's `'g'`
    * flag, so it literally replaces only the FIRST punctuation char /
    * whitespace run — almost certainly an upstream bug (the macro's
    * evident intent, and what its index/normalization design assumes,
    * is global replacement). This engine pins the intended GLOBAL
    * semantics, as declared in SURVEY.md §2.6 F1 and enforced
    * cross-engine by the `g1_canon` oracle (which carries the `'g'`).
    */
  def canon(s: Column): Column =
    trim(
      lower(
        regexp_replace(
          regexp_replace(coalesce(s, lit("")), "[^\\p{Alnum}\\s]", " "),
          "\\s+", " ")))

  /** [[canon]] over a driver-side string (same semantics, no Spark).
    * Locale.ROOT: Spark's `lower()` is locale-independent; the default
    * JVM locale would diverge under tr/az (dotless-ı) and break token
    * matching against column-normalized values. */
  def canonStr(s: String): String = {
    val x = if (s == null) "" else s
    x.replaceAll("[^\\p{Alnum}\\s]", " ").replaceAll("\\s+", " ")
      .toLowerCase(java.util.Locale.ROOT).trim
  }

  /** Punctuation mapped to space by F2 `norm` (`ranking.py:5-12`).
    * Note: `-` and `#`/`@` handling — `#` and `@` are included, `-` is
    * deliberately NOT (the reference keeps hyphens in query text).
    */
  private val Punct: Set[Char] =
    """!"$%&'()*+,./:;<=>?@[\]^_`{|}~""".toSet ++ Set('#', '@')

  /** F2 — query-text normalization (`ranking.py:5-12`): lowercase, map
    * punctuation (minus hyphen) to space, collapse whitespace. */
  def norm(s: String): String = {
    val x = if (s == null) "" else s
    x.toLowerCase(java.util.Locale.ROOT)
      .map(c => if (Punct(c) || Character.isWhitespace(c)) ' ' else c)
      .split(' ')
      .filter(_.nonEmpty)
      .mkString(" ")
  }

  /** Column twin of [[norm]] for distributed query-text normalization
    * (used by the batch/streaming geocode join, where query text is a
    * column rather than a driver-side request string). Parity with the
    * scalar form is spec-tested. */
  def normCol(s: Column): Column = {
    val punct = """!"$%&'()*+,./:;<=>?@[\]^_`{|}~""" + "#@"
    trim(regexp_replace(
      translate(lower(coalesce(s, lit(""))), punct, " " * punct.length),
      "\\s+", " "))
  }

  /** F3 — tokens of a name (`ranking.py:15-16`). */
  def tokenize(s: String): Seq[String] =
    norm(s).split(' ').filter(_.nonEmpty).toIndexedSeq

  /** F4 — first-occurrence-wins ordered dedup across candidate texts'
    * tokens (`app.py:88-95`). */
  def dedupTokens(tokenLists: Seq[Seq[String]]): Seq[String] =
    tokenLists.flatten.distinct
}
