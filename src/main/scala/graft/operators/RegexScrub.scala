package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pattern scrubbing for training text: count and redact PII-shaped
  * spans (emails, URLs, long digit runs) and caller-supplied canary /
  * sensitive-term patterns in one pass.
  *
  * Pure per-row Catalyst expressions (regexp_count / regexp_replace):
  * runs inside the scan stage under whole-stage codegen, no shuffle,
  * no UDF — the 100 TB cost is exactly one pass over the text bytes.
  * Patterns are restricted to the regex subset on which Java regex and
  * RE2 agree (character classes, greedy quantifiers, \b, alternation
  * of literals) so results are engine-portable and oracle-checkable.
  */
object RegexScrub {

  /** A scrub rule: counter column name, regex, replacement token. */
  final case class Rule(name: String, regex: String, repl: String)

  val EMAIL = Rule("n_email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")
  val URL = Rule("n_url", "https?://\\S+", "<URL>")
  val LONG_DIGITS = Rule("n_digits", "[0-9]{7,}", "<NUM>")

  /** Adds one `n_<rule>` count column per rule plus `redacted` — the
    * text with every rule's matches replaced, applied in rule order.
    *
    * Counts are DETECTION counts over the original text; redaction is
    * sequential, so a span matched by two rules (a digit run inside a
    * URL) is counted by both but redacted by the first. The SQL oracle
    * replicates exactly this convention.
    */
  def scrub(df: DataFrame, textCol: Column, rules: Seq[Rule]): DataFrame = {
    val counted = rules.foldLeft(df) { (d, r) =>
      d.withColumn(r.name, regexp_count(textCol, lit(r.regex)))
    }
    val redacted = rules.foldLeft(textCol) { (c, r) =>
      regexp_replace(c, r.regex, r.repl)
    }
    counted.withColumn("redacted", redacted)
  }
}
