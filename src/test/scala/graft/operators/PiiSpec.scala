package graft.operators

import graft.SparkSpec

/** PII scrub invariants (the sf0.01 DuckDB oracle is the value-level
  * gate; this pins the injection contract and that redaction actually
  * removes every detected span).
  */
class PiiSpec extends SparkSpec {

  test("counts follow the injection moduli exactly (corpus carries no " +
      "accidental PII)") {
    Pii.scrub(spark, sf).collect().foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Int]("n_emails") == (if (id % 2 == 0) 1 else 0),
        s"doc $id emails")
      assert(r.getAs[Int]("n_phones") == (if (id % 3 == 0) 1 else 0),
        s"doc $id phones")
      assert(r.getAs[Int]("n_ips") == (if (id % 5 == 0) 1 else 0),
        s"doc $id ips")
      assert(r.getAs[Boolean]("has_pii") ==
        (id % 2 == 0 || id % 3 == 0 || id % 5 == 0))
    }
  }

  test("redaction removes every span and md5 matches an independent " +
      "JVM-regex replay") {
    val byId = Pii.scrub(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("redacted_md5"))
      .toMap
    Pii.withPii(spark, sf).collect().foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val redacted = r.getAs[String]("text")
        .replaceAll(Pii.EmailRe, "<EMAIL>")
        .replaceAll(Pii.PhoneRe, "<PHONE>")
        .replaceAll(Pii.IpRe, "<IP>")
      // nothing detectable survives redaction
      for (re <- Seq(Pii.EmailRe, Pii.PhoneRe, Pii.IpRe))
        assert(!re.r.findFirstIn(redacted).isDefined, s"doc $id leaks $re")
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(redacted.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      assert(byId(id) == md5, s"doc $id redacted_md5")
    }
  }
}
