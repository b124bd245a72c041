package graft

import java.nio.file.{Files, Path, Paths}

/** TOML runtime configuration — the analog of the reference's
  * `Configuration.java` (`/root/reference/src/comlake/core/
  * Configuration.java:34-84`): layered site config, then user config,
  * over built-in fallback defaults, all read-only after construction.
  * The reference resolved `core.toml` via appdirs and parsed with a
  * TOML library; graft keeps the same file name, the same
  * fallback-then-site-then-user precedence, and the same
  * fail-soft-on-unreadable behavior, with a dependency-free parser for
  * the TOML subset runtime knobs need (key = string/int/bool,
  * [section] tables, comments).
  *
  * Keys (reference keys kept where meaningful; Postgres ones map to
  * the lake root since the catalog is lakehouse-native here):
  *   port            — HTTP port for `graft.Serve`
  *   lake-root       — lake directory ("" → fresh temp dir)
  *   cpus            — local[] parallelism ("" → all cores)
  *   shuffle-partitions — spark.sql.shuffle.partitions ("" → cpus)
  *   ipfs-multiaddr  — carried for parity with the reference; the
  *                     in-repo CAS issues the same CIDs (see Cid.scala)
  */
final case class Config(values: Map[String, String]) {
  def get(key: String): Option[String] =
    values.get(key).filter(_.nonEmpty)
  // empty string means "unset" for every key (see Fallback), so an
  // explicitly blanked port falls back instead of crashing .toInt
  def port: Int = get("port").fold(Config.Fallback("port").toInt)(_.toInt)
  def lakeRoot: Option[Path] = get("lake-root").map(Paths.get(_))
  def cpus: Option[Int] = get("cpus").map(_.toInt)
  def shufflePartitions: Option[Int] = get("shuffle-partitions").map(_.toInt)
}

object Config {

  val Fallback: Map[String, String] = Map(
    "port" -> "8080",
    "lake-root" -> "",
    "cpus" -> "",
    "shuffle-partitions" -> "",
    "ipfs-multiaddr" -> "/ip4/127.0.0.1/tcp/5001")

  /** Reference precedence: fallback, then site config, then user
    * config — later files win per key. Unreadable/missing files fall
    * back silently (`Configuration.java:56-60`); a present-but-invalid
    * file is a real error and throws.
    */
  def load(
      site: Path = Paths.get("/etc/graft/core.toml"),
      user: Path = Paths.get(sys.props.getOrElse("user.home", "/root"),
        ".config", "graft", "core.toml")): Config = {
    val layers = Seq(site, user).filter(Files.isReadable)
      .map(p => parse(Files.readString(p)))
    Config(layers.foldLeft(Fallback)(_ ++ _))
  }

  /** Minimal TOML: `key = value` with string/integer/boolean values,
    * `[section]` tables flattened to `section.key`, `#` comments,
    * blank lines. Anything else is a parse error with the line number.
    */
  def parse(text: String): Map[String, String] = {
    val out = Map.newBuilder[String, String]
    var section = ""
    text.linesIterator.zipWithIndex.foreach { case (raw, i) =>
      val line = stripComment(raw).trim
      if (line.nonEmpty) {
        if (line.startsWith("[") && line.endsWith("]")) {
          section = line.substring(1, line.length - 1).trim
          if (section.isEmpty) fail(i, raw, "empty table name")
        } else line.indexOf('=') match {
          case -1 => fail(i, raw, "expected key = value")
          case eq =>
            val key = line.substring(0, eq).trim
            if (key.isEmpty) fail(i, raw, "empty key")
            val full = if (section.isEmpty) key else s"$section.$key"
            out += full -> value(line.substring(eq + 1).trim, i, raw)
        }
      }
    }
    out.result()
  }

  private def value(v: String, i: Int, raw: String): String =
    if (v.length >= 2 && v.head == '"' && v.last == '"') unescape(v, i, raw)
    else if (v == "true" || v == "false") v
    else if (v.matches("-?[0-9][0-9_]*")) v.replace("_", "")
    else fail(i, raw, s"unsupported value: $v")

  private def unescape(quoted: String, i: Int, raw: String): String = {
    val s = quoted.substring(1, quoted.length - 1)
    val sb = new StringBuilder
    var k = 0
    while (k < s.length) {
      if (s(k) == '"') fail(i, raw, "unescaped quote inside string")
      else if (s(k) == '\\') {
        if (k + 1 >= s.length) fail(i, raw, "dangling escape")
        s(k + 1) match {
          case '"' => sb.append('"'); case '\\' => sb.append('\\')
          case 'n' => sb.append('\n'); case 't' => sb.append('\t')
          case 'r' => sb.append('\r')
          case c => fail(i, raw, s"unknown escape \\$c")
        }
        k += 2
      } else { sb.append(s(k)); k += 1 }
    }
    sb.toString
  }

  /** `#` starts a comment unless inside a quoted string. Escapes are
    * consumed pairwise so a string ending in an escaped backslash
    * (`"...\\"`) still closes — checking only the previous char would
    * misread that quote as escaped.
    */
  private def stripComment(line: String): String = {
    var inStr = false
    var k = 0
    while (k < line.length) {
      val c = line(k)
      if (inStr && c == '\\') k += 1 // skip the escaped char
      else if (c == '"') inStr = !inStr
      else if (c == '#' && !inStr) return line.substring(0, k)
      k += 1
    }
    line
  }

  private def fail(i: Int, raw: String, msg: String): Nothing =
    throw new IllegalArgumentException(s"core.toml line ${i + 1}: $msg in: $raw")
}
