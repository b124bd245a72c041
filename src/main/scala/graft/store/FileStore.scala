package graft.store

import java.io.InputStream

/** The content-store surface both backends implement — the engine's
  * analog of the reference's `FileSystem` interface
  * (`/root/reference/src/comlake/core/fs/FileSystem.java:25-46`:
  * mkdir/cp/add/ls/fetch). Implementations:
  *
  *   - [[ContentStore]] — the local CAS, the DEFAULT: reproduces IPFS
  *     CIDv0 addresses byte-exactly with no daemon dependency, and
  *     adds the engine-side extras (local `pathOf` for Spark scans,
  *     the ingest commit log) that only make sense on a filesystem.
  *   - [[IpfsDaemonStore]] — speaks IPFS HTTP `/api/v0` to a running
  *     daemon, matching the reference's
  *     `fs/InterPlanetaryFileSystem.java:47-121` verb by verb. For a
  *     deployment already running IPFS, this is the drop-in; analytic
  *     scans then read through a gateway mount rather than `pathOf`.
  *
  * Both address content by CIDv0, so a catalog populated against one
  * backend resolves identically against the other (the golden-CID
  * equivalence is spec-pinned: always against `Cid`'s vectors, and
  * end-to-end against a live daemon when one is reachable).
  */
trait FileStore {

  /** Ingest a byte stream, return its CIDv0 (`FileSystem.add`). */
  def add(in: InputStream): String

  /** Stream content by CID (`FileSystem.fetch`). */
  def fetch(cid: String): InputStream

  /** Create an empty directory, return its CID (`FileSystem.mkdir`). */
  def mkdir(): String

  /** New directory = `dir` plus `name → src` (`FileSystem.cp`). */
  def cp(src: String, dir: String, name: String): String

  /** List a directory: name → cid (`FileSystem.ls`). */
  def ls(cid: String): Map[String, String]

  /** Whether `cid` addresses a directory. */
  def isDir(cid: String): Boolean
}

object FileStore {
  /** The canonical empty UnixFS directory CID — the constant the
    * reference's `mkdir` returns verbatim
    * (`fs/InterPlanetaryFileSystem.java:42-44`), reproduced from first
    * principles by `Cid.directory(Map.empty)` (pinned in CidSpec).
    */
  val EmptyDirCid = "QmUNLLsPACCz1vLxQVkXqqLX5R1X345qqfHbsf67hvA3Nn"
}
