package graft.store

import java.io.{FileNotFoundException, InputStream}
import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets.UTF_8

/** [[FileStore]] over a live IPFS daemon's HTTP `/api/v0`, matching
  * the reference's adapter verb by verb
  * (`/root/reference/src/comlake/core/fs/InterPlanetaryFileSystem.java`):
  *
  *   - `add`    → POST `/api/v0/add?cid-version=0` (multipart), :47-56
  *   - `fetch`  → POST `/api/v0/cat?arg=`,                      :112-121
  *   - `ls`     → POST `/api/v0/ls?arg=`,                       :99-110
  *   - `isDir`  → POST `/api/v0/files/stat` "Type"=="directory", :58-74
  *   - `cp`     → the reference's files/cp dance (cp dest to a
  *     temp MFS path, cp src under it, stat for the new root CID,
  *     pin, rm the temp path),                                   :76-97
  *   - `mkdir`  → the canonical empty-dir CID constant,          :41-44
  *
  * hand-rolled over `HttpURLConnection` (zero dependencies — the
  * sandbox has no IPFS client jar and no egress; the daemon API since
  * 0.5 requires POST for every verb). Responses are single flat JSON
  * objects, parsed with pinpoint key extraction rather than a JSON
  * library; `ls`'s `Links` array is the one nested shape handled.
  *
  * Timeouts guard the DHT-resolution hang a missing CID causes on
  * `files/stat`/`cat`: a deployment store must fail a bad address in
  * bounded time, not wedge an executor. Errors surface as
  * `FileNotFoundException` (unknown cid) or `IOException` (daemon
  * unreachable) — fail-loud, unlike the reference's null returns.
  *
  * This class intentionally does NOT extend the local store's
  * engine-side extras (`pathOf`, the ingest log): with a daemon
  * backend, Spark scans read through a gateway/FUSE mount and ingest
  * offsets come from the catalog, not a local manifest directory.
  */
final class IpfsDaemonStore(apiBase: String,
    connectTimeoutMs: Int = 2000, readTimeoutMs: Int = 30000)
    extends FileStore {

  private val base = apiBase.stripSuffix("/")

  private def open(pathAndQuery: String): HttpURLConnection = {
    val c = new URI(base + pathAndQuery).toURL.openConnection()
      .asInstanceOf[HttpURLConnection]
    c.setRequestMethod("POST")
    c.setConnectTimeout(connectTimeoutMs)
    c.setReadTimeout(readTimeoutMs)
    c
  }

  private def slurp(in: InputStream): String =
    try new String(in.readAllBytes(), UTF_8) finally in.close()

  private def post(pathAndQuery: String): String = {
    val c = open(pathAndQuery)
    val code = c.getResponseCode
    if (code == 200) slurp(c.getInputStream)
    else {
      val body =
        Option(c.getErrorStream).map(slurp).getOrElse("")
      throw new FileNotFoundException(
        s"ipfs $pathAndQuery -> $code: ${body.take(200)}")
    }
  }

  /** Value of a string field in a flat JSON object (daemon responses
    * never escape quotes inside the fields read here: CIDs, names and
    * type tags are [A-Za-z0-9] text).
    */
  private def jsonStr(json: String, key: String): Option[String] =
    ("\"" + key + "\"\\s*:\\s*\"([^\"]*)\"").r
      .findFirstMatchIn(json).map(_.group(1))

  override def add(in: InputStream): String = {
    val boundary = "graft-" + java.util.UUID.randomUUID().toString
    val c = open("/api/v0/add?cid-version=0&pin=true")
    c.setDoOutput(true)
    c.setRequestProperty("Content-Type",
      s"multipart/form-data; boundary=$boundary")
    val out = c.getOutputStream
    try {
      out.write((s"--$boundary\r\n" +
        "Content-Disposition: form-data; name=\"file\"\r\n" +
        "Content-Type: application/octet-stream\r\n\r\n").getBytes(UTF_8))
      in.transferTo(out)
      out.write(s"\r\n--$boundary--\r\n".getBytes(UTF_8))
    } finally { out.close(); in.close() }
    val code = c.getResponseCode
    if (code != 200)
      throw new java.io.IOException(s"ipfs add -> $code")
    jsonStr(slurp(c.getInputStream), "Hash").getOrElse(
      throw new java.io.IOException("ipfs add: no Hash in response"))
  }

  def add(bytes: Array[Byte]): String =
    add(new java.io.ByteArrayInputStream(bytes))

  override def fetch(cid: String): InputStream = {
    val c = open(s"/api/v0/cat?arg=$cid")
    if (c.getResponseCode != 200)
      throw new FileNotFoundException(cid)
    c.getInputStream
  }

  override def mkdir(): String = FileStore.EmptyDirCid

  override def cp(src: String, dir: String, name: String): String = {
    // the reference's exact sequence (InterPlanetaryFileSystem.java:81-97)
    val tmp = "/" + java.util.UUID.randomUUID().toString
    if (!isDir(dir))
      throw new FileNotFoundException(s"not a directory: $dir")
    post(s"/api/v0/files/cp?arg=/ipfs/$dir&arg=$tmp")
    post(s"/api/v0/files/cp?arg=/ipfs/$src&arg=$tmp/$name")
    val cid = jsonStr(post(s"/api/v0/files/stat?arg=$tmp"), "Hash")
      .getOrElse(throw new java.io.IOException("files/stat: no Hash"))
    post(s"/api/v0/pin/add?arg=$cid")
    post(s"/api/v0/files/rm?arg=$tmp&force=true")
    cid
  }

  override def ls(cid: String): Map[String, String] = {
    if (!isDir(cid)) throw new FileNotFoundException(s"not a directory: $cid")
    val json = post(s"/api/v0/ls?arg=$cid")
    // {"Objects":[{"Hash":...,"Links":[{"Name":"x","Hash":"Qm..",...},...]}]}
    "\\{[^{}]*\"Name\"\\s*:\\s*\"([^\"]*)\"[^{}]*\"Hash\"\\s*:\\s*\"([^\"]+)\"[^{}]*\\}".r
      .findAllMatchIn(json)
      .map(m => m.group(1) -> m.group(2))
      .filter(_._1.nonEmpty) // the root object itself carries no Name
      .toMap
  }

  override def isDir(cid: String): Boolean =
    try jsonStr(post(s"/api/v0/files/stat?arg=/ipfs/$cid"), "Type")
      .contains("directory")
    catch { case _: FileNotFoundException => false }

  /** Liveness probe (`/api/v0/version`) — the spec's gate. */
  def reachable: Boolean =
    try { jsonStr(post("/api/v0/version"), "Version").isDefined }
    catch { case _: Exception => false }
}
