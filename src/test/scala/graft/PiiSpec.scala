package graft

import org.apache.spark.sql.functions._

import graft.operators.Pii

/** PII redaction: shape coverage, chain-order safety, idempotence, audit
  * counts, and the per-source rate report (round-11 verdict next-round 2).
  */
class PiiSpec extends SparkSpec {
  import spark.implicits._

  private def scrubOne(text: String): (String, Long, Long, Long, Long) = {
    val r = Pii.scrubPii(
      Seq((1L, text, "en", "src0")).toDF("doc_id", "text", "lang", "source"))
      .select("clean_text", "n_emails", "n_phones", "n_ips", "n_ids").head()
    (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
  }

  test("each shape masks to its placeholder; clean text passes through untouched") {
    assert(scrubOne("write to jane.doe+x@mail.example.org today") ==
      (("write to <EMAIL> today", 1L, 0L, 0L, 0L)))
    assert(scrubOne("call 202-555-0147 now") == (("call <PHONE> now", 0L, 1L, 0L, 0L)))
    assert(scrubOne("host 10.12.0.255 down") == (("host <IP> down", 0L, 0L, 1L, 0L)))
    assert(scrubOne("ssn 900-12-3456 on file") == (("ssn <ID> on file", 0L, 0L, 0L, 1L)))
    val clean = "plain text with numbers 12345 and a dash-word but no pii"
    assert(scrubOne(clean) == ((clean, 0L, 0L, 0L, 0L)))
  }

  test("chain order: phone (3-3-4) and id (3-2-4) shapes never bite each other; all four coexist") {
    // a phone is NOT an id and vice versa — group widths differ and \b
    // anchors both ends
    assert(scrubOne("202-555-0147")._1 == "<PHONE>")
    assert(scrubOne("900-12-3456")._1 == "<ID>")
    val (c, e, p, i, id) =
      scrubOne("a@b.org then 10.0.0.1 then 202-555-0100 then 900-10-0000 end")
    assert(c == "<EMAIL> then <IP> then <PHONE> then <ID> end")
    assert((e, p, i, id) == ((1L, 1L, 1L, 1L)))
  }

  test("scrubbing is idempotent (digit-free placeholders cannot re-match)") {
    val dirty = "mail a@b.org ip 10.1.2.3 tel 202-555-0100 id 900-10-0000" +
      " intl +99912345678 acct ZZ97GRAFT000000031"
    val once = scrubOne(dirty)._1
    assert(scrubOne(once)._1 == once, "second pass must be a fixpoint")
  }

  test("E.164 and IBAN shapes (r12 next-round 6): masked, bounded, never mid-word, all six coexist") {
    def scrub6(text: String): (String, Long, Long) = {
      val r = Pii.scrubPii(
        Seq((1L, text, "en", "src0")).toDF("doc_id", "text", "lang", "source"))
        .select("clean_text", "n_intl_phones", "n_ibans").head()
      (r.getString(0), r.getLong(1), r.getLong(2))
    }
    assert(scrub6("dial +99912345678 now") == (("dial <INTL> now", 1L, 0L)))
    assert(scrub6("wire ZZ97GRAFT000000031 today") ==
      (("wire <IBAN> today", 0L, 1L)))
    // E.164 length envelope: 8-15 digits, leading nonzero — a 7-digit or
    // 16-digit run, or a leading zero, is NOT a number (no prefix bite:
    // the trailing \b fails at every backtrack width)
    assert(scrub6("+1234567 short")._2 == 0L, "7 digits must not match")
    assert(scrub6("+9999999999999999 long")._2 == 0L, "16 digits must not match")
    assert(scrub6("+0123456789 zero")._2 == 0L, "leading zero must not match")
    // IBAN anchors on a word start: an alnum prefix kills the match, and
    // the BBAN length envelope (11-30 after the check digits) binds
    assert(scrub6("XZZ97GRAFT000000031 glued")._3 == 0L,
      "mid-word IBAN shapes must not match")
    assert(scrub6("ZZ97SHORT1 tiny")._3 == 0L, "sub-11-char BBAN must not match")
    // a NANP phone is not an E.164 (no +), an E.164 is not an IP (no dots)
    val (c, i, b) = scrub6(
      "a@b.org +99912345678 10.0.0.1 202-555-0100 900-10-0000 ZZ97GRAFT000000031")
    assert(c == "<EMAIL> <INTL> <IP> <PHONE> <ID> <IBAN>", s"got: $c")
    assert((i, b) == ((1L, 1L)))
  }

  test("injected fixture: residue classes carry their shapes and the scrub recovers the original tail-free text") {
    val docs = (0L to 12L).map(i => (i, s"base text $i", "en", s"src${i % 2}"))
      .toDF("doc_id", "text", "lang", "source")
    val scrubbed = Pii.scrubPii(Pii.withInjectedPii(docs))
    val byId = scrubbed.collect().map(r => r.getLong(0) ->
      ((r.getString(3), r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))).toMap
    // doc 0 sits in every residue class: all four shapes injected, all
    // four masked, exactly one each
    assert(byId(0L)._2 == 1L && byId(0L)._3 == 1L && byId(0L)._4 == 1L &&
      byId(0L)._5 == 1L, s"doc 0 must carry all four: ${byId(0L)}")
    assert(!byId(0L)._1.matches(".*[0-9]{3}-.*"), "no raw shape may survive")
    // doc 1 is in no residue class: untouched
    assert(byId(1L) == (("base text 1", 0L, 0L, 0L, 0L)))
    // doc 3: email only
    assert(byId(3L) == (("base text 3 contact <EMAIL>", 1L, 0L, 0L, 0L)))
    // every injected shape is recovered: counts equal residue membership
    (0L to 12L).foreach { i =>
      val (_, e, p, ip, id) = byId(i)
      assert(e == (if (i % 3 == 0) 1L else 0L), s"email count at $i")
      assert(p == (if (i % 5 == 0) 1L else 0L), s"phone count at $i")
      assert(ip == (if (i % 7 == 0) 1L else 0L), s"ip count at $i")
      assert(id == (if (i % 11 == 0) 1L else 0L), s"id count at $i")
    }
    // the round-13 residue classes (mod 13 E.164, mod 17 IBAN) — widen
    // the corpus so each class has a nonzero member
    val wide = (0L to 20L).map(i => (i, s"base text $i", "en", "s"))
      .toDF("doc_id", "text", "lang", "source")
    Pii.scrubPii(Pii.withInjectedPii(wide)).collect().foreach { r =>
      val i = r.getLong(0)
      assert(r.getAs[Long]("n_intl_phones") == (if (i % 13 == 0) 1L else 0L),
        s"intl count at $i")
      assert(r.getAs[Long]("n_ibans") == (if (i % 17 == 0) 1L else 0L),
        s"iban count at $i")
      assert(r.getAs[Long]("n_pii") ==
        Seq("n_emails", "n_phones", "n_ips", "n_ids", "n_intl_phones",
          "n_ibans").map(r.getAs[Long](_)).sum,
        s"n_pii must total all six families at $i")
    }
  }

  test("pii rate report conserves the corpus and rates affected docs per source") {
    val docs = (0L to 29L).map(i => (i, s"text $i", "en", s"src${i % 3}"))
      .toDF("doc_id", "text", "lang", "source")
    val rate = Pii.piiRate(Pii.scrubPii(Pii.withInjectedPii(docs)))
    val rows = rate.collect()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == 30L, "corpus conserved")
    rows.foreach { r =>
      val (n, np) = (r.getAs[Long]("n_docs"), r.getAs[Long]("n_pii_docs"))
      assert(np <= n && r.getAs[Double]("pii_rate") == np.toDouble / n)
    }
    // src0 carries doc_ids ≡ 0 (mod 3) — every one has at least the email
    val src0 = rows.find(_.getString(0) == "src0").get
    assert(src0.getAs[Long]("n_pii_docs") == src0.getAs[Long]("n_docs"),
      "every doc_id ≡ 0 (mod 3) carries an injected email")
    // the scrub plan is shuffle-free row-local work (scale contract)
    val plan = Pii.scrubPii(Pii.withInjectedPii(docs)).queryExecution
      .executedPlan.toString
    assert(!plan.contains("Exchange"), s"scrub must not shuffle:\n$plan")
  }
}
