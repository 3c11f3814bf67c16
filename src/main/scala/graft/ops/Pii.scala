package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection and redaction — the scrub pass a training-data
  * pipeline runs before any release: emails, separator-shaped phone
  * numbers, SSN- and card-shaped digit groups, IPv4 addresses.
  * Extension surface (discoproject/disco has no PII op); the patterns
  * are the standard conservative regex shapes — separator-anchored so
  * plain digit runs in ordinary text never trip them.
  *
  * Deterministic and oracle-replayable by construction: every pattern
  * stays inside the Java∩RE2 regex subset (no backreferences, no
  * lookaround, ASCII `\b` word boundaries), so Spark's codegen'd
  * `regexp_count`/`regexp_replace` and DuckDB's RE2 engine accept the
  * same language with the same leftmost non-overlapping global-match
  * semantics. Redaction applies the patterns in the FIXED [[Patterns]]
  * order (a span consumed by an earlier type is invisible to later
  * ones); per-type counts are taken on the ORIGINAL text (types count
  * independently of the redaction sequence).
  *
  * 100 TB shape: pure row-local scan work inside whole-stage codegen —
  * no shuffle, no UDF, no driver involvement; column pruning reaches
  * the parquet scan, and the regex automata compile once per task.
  */
object Pii {

  /** (type, pattern, placeholder) in application order. */
  val Patterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "[EMAIL]"),
    ("credit_card", "\\b\\d{4}[ -]\\d{4}[ -]\\d{4}[ -]\\d{4}\\b", "[CARD]"),
    ("ssn", "\\b\\d{3}-\\d{2}-\\d{4}\\b", "[SSN]"),
    ("phone", "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b", "[PHONE]"),
    ("ip", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "[IP]"))

  /** The text with every [[Patterns]] type replaced by its placeholder,
    * in order.
    */
  def redactCol(text: Column): Column =
    Patterns.foldLeft(text) { case (acc, (_, p, repl)) =>
      regexp_replace(acc, lit(p), lit(repl))
    }

  /** Per-document profile: `(id, text_redacted, n_email, n_credit_card,
    * n_ssn, n_phone, n_ip, n_pii)` — counts on the original text, the
    * redacted text beside them. Feed `n_pii == 0` to a keep-gate or the
    * redacted column to the release sink.
    */
  def profile(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val counts = Patterns.map { case (name, p, _) =>
      regexp_count(t, lit(p)).cast("long").as(s"n_$name")
    }
    val total = Patterns.map { case (_, p, _) =>
      regexp_count(t, lit(p)).cast("long")
    }.reduce(_ + _).as("n_pii")
    df.select(col(idCol).as("id") +:
      redactCol(t).as("text_redacted") +: counts :+ total: _*)
  }
}
