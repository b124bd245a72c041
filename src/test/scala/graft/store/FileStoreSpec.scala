package graft.store

import java.io.ByteArrayInputStream
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** The pluggable [[FileStore]] surface: the local CAS fulfils the
  * trait (exercised through the TRAIT type, so a swapped backend
  * inherits the contract), and when a live IPFS daemon is reachable
  * the [[IpfsDaemonStore]] must issue the SAME CIDs the CAS computes
  * locally — the golden-CID equivalence. Without a daemon the
  * equivalence test cancels cleanly (this sandbox has none; a
  * deployment runs it with `GRAFT_IPFS_API=http://host:5001`).
  */
class FileStoreSpec extends AnyFunSuite {

  private def cas(): FileStore =
    new ContentStore(Files.createTempDirectory("graft-fs"))

  private val sample = "hello from the graft file store\n".getBytes("UTF-8")

  test("the CAS fulfils the FileStore contract through the trait: " +
      "add/fetch round-trips, mkdir/cp/ls compose, isDir discriminates") {
    val fs: FileStore = cas()
    val cid = fs.add(new ByteArrayInputStream(sample))
    assert(cid.startsWith("Qm"), cid)
    assert(new String(fs.fetch(cid).readAllBytes(), "UTF-8") ==
      new String(sample, "UTF-8"))
    assert(!fs.isDir(cid))
    val root = fs.mkdir()
    assert(root == FileStore.EmptyDirCid,
      "empty dir must be the canonical UnixFS CID the reference returns")
    assert(fs.isDir(root))
    val v2 = fs.cp(cid, root, "greeting")
    assert(fs.ls(v2) == Map("greeting" -> cid))
    // immutability: the old root is untouched
    assert(fs.ls(root).isEmpty)
  }

  test("live-daemon golden-CID equivalence: IpfsDaemonStore issues the " +
      "addresses the CAS computes locally (cancels without a daemon)") {
    val api = sys.env.getOrElse("GRAFT_IPFS_API", "http://127.0.0.1:5001")
    val daemon = new IpfsDaemonStore(api, connectTimeoutMs = 500)
    assume(daemon.reachable, s"no IPFS daemon at $api")
    val local: FileStore = cas()
    // file add: byte-identical addressing
    val want = local.add(new ByteArrayInputStream(sample))
    val got = daemon.add(new ByteArrayInputStream(sample))
    assert(got == want, s"daemon CID $got != local CID $want")
    // content round-trips through the daemon
    assert(new String(daemon.fetch(got).readAllBytes(), "UTF-8") ==
      new String(sample, "UTF-8"))
    // directory composition agrees end to end
    val wantDir = local.cp(want, local.mkdir(), "greeting")
    val gotDir = daemon.cp(got, daemon.mkdir(), "greeting")
    assert(gotDir == wantDir, s"daemon dir $gotDir != local dir $wantDir")
    assert(daemon.ls(gotDir) == Map("greeting" -> got))
    assert(daemon.isDir(gotDir) && !daemon.isDir(got))
  }
}
