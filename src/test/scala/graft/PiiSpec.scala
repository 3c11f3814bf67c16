package graft

import graft.ops.Pii
import org.apache.spark.sql.functions._

/** PII scrub: hand-counted fixtures per pattern type, the fixed
  * redaction order, and the counts-on-original convention.
  */
class PiiSpec extends SparkTestBase {
  import spark.implicits._

  test("profile counts and redacts every pattern type; clean text untouched") {
    val rows = Seq(
      (1L, "mail a.b@x.co and 4111 1111 1111 1111 then 078-05-1120," +
        " call 555-867-5309 from 10.0.0.1"),
      (2L, "no pii here w1 w2 123456 version 1.2 and 12-34"),
      (3L, "two mails: x@y.org z@example.net and ips 192.168.0.1 8.8.8.8"))
      .toDF("id", "text")
    val out = Pii.profile(rows, "id", "text").orderBy("id").collect()
    val r1 = out(0)
    assert(r1.getString(1) ==
      "mail [EMAIL] and [CARD] then [SSN], call [PHONE] from [IP]")
    assert((2 to 7).map(r1.getLong) == Seq(1L, 1L, 1L, 1L, 1L, 5L))
    val r2 = out(1)
    assert(r2.getString(1) == "no pii here w1 w2 123456 version 1.2 and 12-34")
    assert((2 to 7).map(r2.getLong) == Seq(0L, 0L, 0L, 0L, 0L, 0L))
    val r3 = out(2)
    assert(r3.getString(1) ==
      "two mails: [EMAIL] [EMAIL] and ips [IP] [IP]")
    assert((2 to 7).map(r3.getLong) == Seq(2L, 0L, 0L, 0L, 2L, 4L))
  }

  test("application order is fixed: earlier types consume their span first") {
    // an SSN-shaped group inside a card-shaped neighborhood: the card
    // pattern (earlier) must not be broken by the later ssn/phone
    // passes, and counts (on the ORIGINAL) tally types independently
    val rows = Seq((1L, "pay 4111 1111 1111 1111 id 078-05-1120"))
      .toDF("id", "text")
    val r = Pii.profile(rows, "id", "text").head()
    assert(r.getString(1) == "pay [CARD] id [SSN]")
    // a digits-only-in-email address: email (first) wins the span, so
    // the redacted text has no leftover digits for phone/ssn to hit
    val rows2 = Seq((1L, "reach 555-867-5309@mail.example.com today"))
      .toDF("id", "text")
    val r2 = Pii.profile(rows2, "id", "text").head()
    assert(r2.getString(1) == "reach [EMAIL] today")
    // counts on the ORIGINAL text still see the phone shape inside
    assert(r2.getLong(2) == 1L) // n_email
    assert(r2.getLong(5) == 1L) // n_phone — independent per-type count
  }
}
