package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** TOML config: the reference's layering contract
  * (fallback < site < user, unreadable files fall back silently,
  * `Configuration.java:45-67`) plus the parser's value grammar.
  */
class ConfigSpec extends AnyFunSuite {

  test("fallback defaults when no file is readable") {
    val c = Config.load(
      site = Paths.get("/nonexistent/site.toml"),
      user = Paths.get("/nonexistent/user.toml"))
    assert(c.port == 8080)
    assert(c.lakeRoot.isEmpty && c.cpus.isEmpty)
    assert(c.values("ipfs-multiaddr") == "/ip4/127.0.0.1/tcp/5001")
  }

  test("site < user precedence, per key") {
    val dir = Files.createTempDirectory("cfg")
    val site = dir.resolve("site.toml")
    val user = dir.resolve("user.toml")
    Files.writeString(site,
      "port = 9000\nlake-root = \"/srv/lake\" # site-wide\n")
    Files.writeString(user, "port = 9001\n")
    val c = Config.load(site, user)
    assert(c.port == 9001, "user wins the key it sets")
    assert(c.lakeRoot.map(_.toString).contains("/srv/lake"),
      "site survives for keys the user omits")
    assert(c.values("ipfs-multiaddr").nonEmpty, "fallback fills the rest")
  }

  test("parser: strings with escapes, ints with underscores, bools, tables") {
    val m = Config.parse(
      """# graft core config
        |port = 8_080
        |lake-root = "/data/lake \"prod\""
        |debug = true
        |[spark]
        |shuffle-partitions = 256   # per-cluster
        |note = "a#b"  # hash inside quotes is content
        |""".stripMargin)
    assert(m("port") == "8080")
    assert(m("lake-root") == "/data/lake \"prod\"")
    assert(m("debug") == "true")
    assert(m("spark.shuffle-partitions") == "256")
    assert(m("spark.note") == "a#b")
  }

  test("string ending in an escaped backslash still closes before a comment") {
    val m = Config.parse("""lake-root = "/srv\\"  # trailing escape""" + "\n")
    assert(m("lake-root") == "/srv\\")
  }

  test("explicitly blanked port falls back like every other empty key") {
    assert(Config(Config.Fallback ++ Map("port" -> "")).port == 8080)
  }

  test("present-but-invalid file is a real error, line-numbered") {
    val e = intercept[IllegalArgumentException](
      Config.parse("port = 8080\nwhat even is this\n"))
    assert(e.getMessage.contains("line 2"))
    val v = intercept[IllegalArgumentException](
      Config.parse("port = [1, 2]\n"))
    assert(v.getMessage.contains("unsupported value"))
  }
}
