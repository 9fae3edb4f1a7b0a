package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII redaction/scrubbing — the canonical curation stage between quality
  * filtering and deduplication in every production training-data pipeline
  * (mask contact shapes BEFORE the corpus is deduped/packed, so no
  * memorizable identifier survives into the training mix). The reference
  * pipeline has no PII handling (its events carry no free text beyond
  * city/severity enums); this is north-star surface, built from the
  * public recipe: regex-shape detection for the four classic identifier
  * families (email, IPv4, NANP-style phone, SSN-style id number) with
  * DETERMINISTIC placeholders, so scrubbing is idempotent, auditable
  * (the placeholder count IS the per-doc PII count) and cross-engine
  * reproducible.
  *
  * Determinism contract: the four patterns are ASCII-only (`\d`/`\b`
  * agree between Java regex and RE2 on ASCII classes), the replace chain
  * is a FIXED order (email → IPv4 → phone → id; email first so a later
  * numeric pattern can never bite a fragment of an address, and phone
  * (3-3-4) / id (3-2-4) group shapes are mutually exclusive), and the
  * placeholders contain no digits, so no pass can re-match an earlier
  * pass's output — which is also why scrubbing is idempotent. The DuckDB
  * mirror pins `'g'` (global) to match Spark's replace-all default — the
  * one dialect difference ([[Sql.scrub]]).
  *
  * Scale shape: every operator here is a row-local projection (no
  * shuffle, no UDF — `regexp_replace` is codegen'd); [[piiRate]] is one
  * map-side-combining aggregate to |sources| rows. A 100 TB scrub is
  * exactly one read-transform-write pass.
  */
object Pii {

  /** The six shape patterns — single source of truth for the operator
    * AND the oracle builder (same literal lands in both engines).
    *
    * Round-13 additions (r12 verdict next-round 6), the two
    * highest-frequency production families the original four-ASCII-shape
    * set missed:
    *  - E.164 international phone: `+` then 8-15 digits, first nonzero
    *    (ITU e.164 length envelope). No leading `\b` — `+` is not a word
    *    character, so a boundary there never matches; the trailing `\b`
    *    stops mid-digit-run bites, and an over-long digit run (>15)
    *    fails the boundary at every backtrack width, so it matches
    *    nothing rather than a prefix — identical leftmost semantics in
    *    Java regex and RE2.
    *  - IBAN (electronic format): 2 country letters, 2 check digits,
    *    11-30 alphanumerics — the envelope covering every published
    *    national IBAN length (15..34 total).
    */
  val EmailPattern: String = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  val E164Pattern: String  = "\\+[1-9]\\d{7,14}\\b"
  val Ipv4Pattern: String  = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhonePattern: String = "\\b\\d{3}-\\d{3}-\\d{4}\\b"
  val IdPattern: String    = "\\b\\d{3}-\\d{2}-\\d{4}\\b"
  val IbanPattern: String  = "\\b[A-Z]{2}\\d{2}[A-Z0-9]{11,30}\\b"

  val EmailMark = "<EMAIL>"
  val E164Mark  = "<INTL>"
  val IpMark    = "<IP>"
  val PhoneMark = "<PHONE>"
  val IdMark    = "<ID>"
  val IbanMark  = "<IBAN>"

  /** The masking chain over a text column (fixed order — see class doc).
    * Order argument for the two new passes: E.164 runs right after email
    * because it is the only pattern anchored on `+` (which only an email
    * local part could also contain — already consumed by pass 1), and
    * its bare digit run must be gone before any later pattern could in
    * principle see it; IBAN runs last because it is the only letter-led
    * pattern — it shares no alphabet overlap with the dot/dash/plus
    * anchored shapes, and the digit-free markers guarantee it can never
    * re-match an earlier pass's output (its `\d{2}` check digits cannot
    * appear in any marker).
    */
  def scrubCol(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(
              regexp_replace(text, EmailPattern, EmailMark),
              E164Pattern, E164Mark),
            Ipv4Pattern, IpMark),
          PhonePattern, PhoneMark),
        IdPattern, IdMark),
      IbanPattern, IbanMark)

  /** Placeholder occurrences in scrubbed text = replacements made; the
    * split-count form is engine-portable (no regexp-count dialect) and
    * exact because the markers are digit-free and cannot nest.
    */
  private def markCount(clean: Column, mark: String): Column =
    (size(split(clean, mark)) - 1).cast("long")

  /** Scrub a `documents`-shaped frame: one row per document with the
    * masked text and the per-family replacement counts (the audit row —
    * redacting silently is how leaks go unnoticed).
    */
  def scrubPii(documents: DataFrame): DataFrame = {
    val scrubbed = documents.select(
      col("doc_id"), col("lang"), col("source"),
      scrubCol(col("text")).as("clean_text"))
    scrubbed.select(
        col("doc_id"), col("lang"), col("source"), col("clean_text"),
        markCount(col("clean_text"), EmailMark).as("n_emails"),
        markCount(col("clean_text"), PhoneMark).as("n_phones"),
        markCount(col("clean_text"), IpMark).as("n_ips"),
        markCount(col("clean_text"), IdMark).as("n_ids"),
        markCount(col("clean_text"), E164Mark).as("n_intl_phones"),
        markCount(col("clean_text"), IbanMark).as("n_ibans"))
      .withColumn("n_pii",
        col("n_emails") + col("n_phones") + col("n_ips") + col("n_ids") +
          col("n_intl_phones") + col("n_ibans"))
  }

  /** Per-source PII-rate dataset-card row over a [[scrubPii]] output:
    * document counts, affected-document rate, per-family totals. One
    * hash aggregate to |sources| rows.
    */
  def piiRate(scrubbed: DataFrame): DataFrame =
    scrubbed.groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum((col("n_pii") > 0).cast("long")).as("n_pii_docs"),
        sum("n_emails").as("n_emails"),
        sum("n_phones").as("n_phones"),
        sum("n_ips").as("n_ips"),
        sum("n_ids").as("n_ids"),
        sum("n_intl_phones").as("n_intl_phones"),
        sum("n_ibans").as("n_ibans"))
      .withColumn("pii_rate",
        col("n_pii_docs").cast("double") / col("n_docs").cast("double"))
      .orderBy("source")

  /** DETERMINISTIC PII-injection fixture (the
    * [[Multimodal.mediaFromDocuments]] precedent): the synthetic corpus
    * carries no contact shapes, so the registry derives a "wild" view
    * in-plan — contact tails keyed off `doc_id` residues (mod
    * 3/5/7/11/13/17: email/phone/IPv4/id/E.164/IBAN), every generated
    * value inside reserved example ranges (example.org, the fictional
    * 555-01xx/202-555 NANP block, 10.0.0.0/8, 900- SSN area, the
    * unassigned +999 country code, the user-reserved ZZ IBAN country —
    * never real identifiers). Row-local and mirrored literally by
    * [[Sql.inject]], so every scrub query stays hash-checked and
    * non-vacuous at all SFs.
    */
  def withInjectedPii(documents: DataFrame): DataFrame = {
    val id = col("doc_id")
    def tail(mod: Int, value: Column): Column =
      when(pmod(id, lit(mod)) === 0, value).otherwise(lit(""))
    documents.select(
      col("doc_id"), col("lang"), col("source"),
      concat(
        col("text"),
        tail(3, concat(lit(" contact user"), id.cast("string"),
          lit("@example.org"))),
        tail(5, concat(lit(" call 202-555-"),
          lpad(pmod(id, lit(10000)).cast("string"), 4, "0"))),
        tail(7, concat(lit(" from 10."), pmod(id, lit(200)).cast("string"),
          lit("."), pmod(id * 7, lit(256)).cast("string"),
          lit("."), pmod(id * 13, lit(256)).cast("string"))),
        tail(11, concat(lit(" ssn 900-"),
          lpad((pmod(id, lit(90)) + 10).cast("string"), 2, "0"),
          lit("-"), lpad(pmod(id * 3, lit(10000)).cast("string"), 4, "0"))),
        tail(13, concat(lit(" intl +999"),
          lpad(pmod(id * 17, lit(100000000L)).cast("string"), 8, "0"))),
        tail(17, concat(lit(" acct ZZ"),
          lpad(pmod(id, lit(97)).cast("string"), 2, "0"), lit("GRAFT"),
          lpad(pmod(id * 31, lit(1000000000L)).cast("string"), 9, "0")))
      ).as("text"))
  }

  // ===== k-anonymity / l-diversity (re-identification governance) =====

  /** k-anonymity equivalence classes over the customer table's
    * quasi-identifiers — the OTHER half of privacy governance, distinct
    * from this module's content scrubbing: scrubbing removes direct
    * identifiers FROM text, while k-anonymity measures whether the
    * structured attributes that survive release (nation, market segment,
    * an account-balance band) still single a person out by combination
    * (Sweeney 2002: 87% of the US population is unique on
    * {zip, birthdate, sex}). A row is k-anonymous iff at least k−1 other
    * rows share its full quasi-identifier tuple.
    *
    * Quasi-identifiers here: `c_nationkey`, `c_mktsegment`, and
    * `floor(c_acctbal / 1000)` (the generalization step a release applies
    * to a continuous attribute — the band IS the anonymization). The
    * exact `c_acctbal` plays the sensitive attribute for the l-diversity
    * column: a class where every member shares one sensitive value leaks
    * it even at k — `n_distinct_sensitive` counts the distinct balances
    * inside each class (Machanavajjhala 2007).
    *
    * Scale shape: ONE map-side-combining hash aggregate keyed by the
    * quasi-identifier tuple — the shuffle carries |classes| rows
    * (bounded by the QI domain product: nations × segments × bands,
    * thousands, never corpus-scaled), so a 100 TB release audit is one
    * scan. `count(distinct c_acctbal)` expands to the standard two-phase
    * distinct aggregate whose FIRST phase keys on (QI tuple, sensitive
    * value) — map-side-deduped, so the exchange carries the distinct
    * combination count (≤ rows, typically far less), not the corpus; a
    * deployment that only gates on l ≥ 2 can swap in
    * `approx_count_distinct` to make that phase constants-bounded too.
    */
  def kAnonymity(customer: DataFrame, k: Int = 5): DataFrame =
    customer
      .groupBy(col("c_nationkey"),
        col("c_mktsegment"),
        floor(col("c_acctbal") / lit(1000.0)).cast("long").as("acctbal_band"))
      .agg(count(lit(1)).as("class_size"),
        countDistinct(col("c_acctbal")).as("n_distinct_sensitive"))
      .select(col("c_nationkey"), col("c_mktsegment"), col("acctbal_band"),
        col("class_size"),
        (col("class_size") >= k).cast("int").as("meets_k"),
        col("n_distinct_sensitive"))
      .orderBy("c_nationkey", "c_mktsegment", "acctbal_band")

  /** One-row release-gate card over [[kAnonymity]]: the minimum class
    * size (the dataset's actual k), the minimum within-class sensitive
    * diversity (its actual l), and the suppression ledger — how many
    * classes/rows a k-threshold release would have to withhold. The card
    * a data-release review reads before approving an export; rows
    * below k are the ones a release SUPPRESSES (the standard remedy),
    * so `suppressed_frac` is the utility cost of the privacy bar.
    *
    * Second tiny aggregate over the bounded class table — nothing
    * corpus-scaled moves.
    */
  def kAnonymityCard(customer: DataFrame, k: Int = 5): DataFrame =
    kAnonymity(customer, k)
      .agg(sum(col("class_size")).as("n_rows"),
        count(lit(1)).as("n_classes"),
        min(col("class_size")).as("k_min"),
        min(col("n_distinct_sensitive")).as("l_min"),
        sum((col("class_size") < k).cast("long")).as("n_classes_below_k"),
        sum(when(col("class_size") < k, col("class_size")).otherwise(lit(0L)))
          .as("n_rows_below_k"))
      .select(col("n_rows"), col("n_classes"), col("k_min"), col("l_min"),
        col("n_classes_below_k"), col("n_rows_below_k"),
        (col("n_rows_below_k").cast("double") / col("n_rows").cast("double"))
          .as("suppressed_frac"))

  /** BATCH k-anonymity release over the normalized event stream — the
    * batch twin of [[graft.streaming.Stateful.kAnonymityGate]] and the
    * event-side application of [[kAnonymity]]: a telemetry export
    * releases an event row only when at least k events share its
    * quasi-identifier tuple (city, event_type, day); `class_seen` is the
    * row's 1-based (ts, event_id) rank within its class — the arrival
    * ordinal the streaming gate assigns when fed in event-time order.
    *
    * Scale shape: one exchange keyed by the QI tuple feeding both the
    * class-total count and the rank window (same partitioning — Spark
    * plans ONE Exchange); partitions are class-sized (cities × types ×
    * days, each day-bounded), never corpus-wide, so no partition-less
    * Window and no single-reducer sort.
    */
  def kAnonymityRelease(normalized: DataFrame, k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val day = date_format(col("ts"), "yyyy-MM-dd")
    val cls = Window.partitionBy("city", "event_type", "day")
    val rank = cls.orderBy(col("ts"), col("event_id"))
    normalized
      .select(col("city"), col("event_type"), day.as("day"),
        col("ts"), col("ts_str"), col("event_id"))
      .withColumn("class_total", count(lit(1)).over(cls))
      .withColumn("class_seen", row_number().over(rank).cast("long"))
      .filter(col("class_total") >= k)
      .select(col("city"), col("event_type"), col("day"), col("ts_str"),
        col("event_id"), col("class_seen"))
      .orderBy("city", "event_type", "day", "class_seen")
  }

  /** DuckDB oracle fragments mirroring the Scala derivations. */
  object Sql {
    /** The injection tail as a SQL expression over `doc_id`/`text`. */
    val inject: String =
      """text
        | || CASE WHEN doc_id % 3 = 0 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.org' ELSE '' END
        | || CASE WHEN doc_id % 5 = 0 THEN ' call 202-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END
        | || CASE WHEN doc_id % 7 = 0 THEN ' from 10.' || CAST(doc_id % 200 AS VARCHAR) || '.' || CAST((doc_id * 7) % 256 AS VARCHAR) || '.' || CAST((doc_id * 13) % 256 AS VARCHAR) ELSE '' END
        | || CASE WHEN doc_id % 11 = 0 THEN ' ssn 900-' || lpad(CAST((doc_id % 90) + 10 AS VARCHAR), 2, '0') || '-' || lpad(CAST((doc_id * 3) % 10000 AS VARCHAR), 4, '0') ELSE '' END
        | || CASE WHEN doc_id % 13 = 0 THEN ' intl +999' || lpad(CAST((doc_id * 17) % 100000000 AS VARCHAR), 8, '0') ELSE '' END
        | || CASE WHEN doc_id % 17 = 0 THEN ' acct ZZ' || lpad(CAST(doc_id % 97 AS VARCHAR), 2, '0') || 'GRAFT' || lpad(CAST((doc_id * 31) % 1000000000 AS VARCHAR), 9, '0') ELSE '' END"""
        .stripMargin.replace("\n", "")

    /** The masking chain over a text expression — identical pattern
      * literals and order as [[scrubCol]]; `'g'` pins replace-ALL (the
      * Spark default, but DuckDB's default is first-match-only).
      */
    def scrub(texpr: String): String =
      s"regexp_replace(regexp_replace(regexp_replace(regexp_replace(" +
        s"regexp_replace(regexp_replace($texpr, " +
        s"'$EmailPattern', '$EmailMark', 'g'), " +
        s"'$E164Pattern', '$E164Mark', 'g'), " +
        s"'$Ipv4Pattern', '$IpMark', 'g'), " +
        s"'$PhonePattern', '$PhoneMark', 'g'), " +
        s"'$IdPattern', '$IdMark', 'g'), " +
        s"'$IbanPattern', '$IbanMark', 'g')"

    /** Per-family marker count over a scrubbed expression. */
    def markCount(cexpr: String, mark: String): String =
      s"CAST(len(string_split($cexpr, '$mark')) - 1 AS BIGINT)"
  }
}
