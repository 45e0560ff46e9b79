package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * PII detection and redaction — the compliance pass a training-data
 * pipeline runs before anything ships to a trainer: count and mask emails,
 * phone numbers, and IPv4 addresses in document text.
 *
 * Patterns are deliberately restricted to the regex subset whose semantics
 * are IDENTICAL under Java's engine (Spark) and RE2 (DuckDB, Go tooling):
 * character classes, bounded repetition, and ASCII `\b` word boundaries —
 * no alternation (where leftmost-longest RE2 vs leftmost-first Java can
 * diverge), no backreferences, no lookaround (RE2 has none). That makes
 * redaction a deterministic cross-engine function of the text, so a
 * redacted corpus can be byte-audited by an independent engine — the same
 * determinism contract every operator here obeys.
 *
 * Scale shape: pure per-row projection (codegen'd regexp expressions), no
 * shuffle, no UDF — scales like the scan itself. Masking order is fixed
 * (email, phone, IPv4) and an engine-independent part of the contract:
 * on overlap-adversarial text (e.g. "10.0.0.1@host.com", where the email
 * pattern subsumes an IPv4) whichever pattern runs first wins, so both
 * sides of an audit must apply the same order — as [[redact]] and the
 * oracle SQL do.
 */
object Pii {
  /** ASCII email. Both engines: leftmost match, greedy quantifiers. */
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** NANP-style dashed phone: 555-123-4567, word-bounded. */
  val phonePattern = "\\b\\d{3}-\\d{3}-\\d{4}\\b"

  /** Dotted-quad IPv4 (syntactic: each octet 1-3 digits), word-bounded. */
  val ipv4Pattern = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  val emailMask = "<EMAIL>"
  val phoneMask = "<PHONE>"
  val ipv4Mask = "<IP>"

  /** Redacted text: all three pattern families masked, fixed order. */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, emailPattern, emailMask),
        phonePattern, phoneMask),
      ipv4Pattern, ipv4Mask)

  /**
   * Per-document PII counts + redacted text. Appends `n_emails`,
   * `n_phones`, `n_ips` (long) and `redacted` (string) to `df`.
   *
   * Counting caveat (mirrors the masking-order contract above): each
   * count runs independently on the RAW text while redaction is
   * sequential, so an entity that overlaps two pattern families (an IPv4
   * or dashed number inside an email address) is counted under BOTH
   * families even though redaction masks it once, under whichever pattern
   * runs first. Counts can therefore exceed masked entities; the oracle
   * SQL counts the same way, so cross-engine parity holds. Counting on
   * the progressively redacted text would under-count instead (the mask
   * token destroys later matches) — raw-text counts are the contract.
   */
  def scrub(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    df.withColumn("n_emails",
        coalesce(regexp_count(t, lit(emailPattern)), lit(0)).cast("long"))
      .withColumn("n_phones",
        coalesce(regexp_count(t, lit(phonePattern)), lit(0)).cast("long"))
      .withColumn("n_ips",
        coalesce(regexp_count(t, lit(ipv4Pattern)), lit(0)).cast("long"))
      .withColumn("redacted", redact(t))
  }
}
