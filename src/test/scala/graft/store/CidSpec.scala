package graft.store

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** CIDv0 golden values: the reference's own test fixtures
  * (`/root/reference/test/comlake/core/api_test.clj:36-44`) pin what
  * its IPFS daemon returned for files shipped in its repo — graft's
  * codec must reproduce them byte-for-byte, plus the canonical empty
  * UnixFS directory every IPFS node agrees on.
  */
class CidSpec extends AnyFunSuite {

  private val fixtures = Paths.get("/root/reference/resources/test")

  private def fixture(name: String): Array[Byte] =
    Files.readAllBytes(fixtures.resolve(name))

  test("reference golden file CIDs reproduce (api_test.clj)") {
    assume(Files.isDirectory(fixtures), "reference fixtures not mounted")
    val golden = Map(
      "Interjection" -> "QmbwXK2Wg6npoAusr9MkSduuAViS6dxEQBNzqoixanVtj5",
      "population.csv" -> "QmPVydGNAbc7t4CEf3qxETRNjYkXotABEeN2WBXkkGNc5H",
      "projects.json" -> "QmNeJeXFw7d6HycKtdw7D2LfyPP1YtkyU4FhCXLdoDeFYD")
    golden.foreach { case (name, cid) =>
      assert(Cid.ofBytes(fixture(name)).cid == cid, s"fixture $name")
    }
  }

  test("canonical empty directory CID (api_test.clj empty-dir-cid)") {
    assert(Cid.directory(Map.empty).cid ==
      "QmUNLLsPACCz1vLxQVkXqqLX5R1X345qqfHbsf67hvA3Nn")
  }

  test("directory CIDs compose children with tsizes and sort links") {
    val a = Cid.ofBytes("alpha\n".getBytes("UTF-8"))
    val b = Cid.ofBytes("beta\n".getBytes("UTF-8"))
    val d1 = Cid.directory(Map("a" -> (a.cid, a.tsize), "b" -> (b.cid, b.tsize)))
    val d2 = Cid.directory(Map("b" -> (b.cid, b.tsize), "a" -> (a.cid, a.tsize)))
    assert(d1.cid == d2.cid, "link order is by name, not insertion")
    val nested = Cid.directory(Map("sub" -> (d1.cid, d1.tsize)))
    assert(nested.cid.startsWith("Qm") && nested.tsize > d1.tsize)
  }

  test("chunked files: multi-chunk root differs from concat-as-one-chunk") {
    val big = Array.tabulate[Byte](Cid.ChunkSize + 10)(i => (i % 251).toByte)
    val node = Cid.ofBytes(big)
    assert(node.cid.startsWith("Qm"))
    assert(node.filesize == big.length.toLong)
    // dag carries two leaves + a root: cumulative size exceeds content
    assert(node.tsize > big.length.toLong)
    // determinism + dedup: same bytes, same address
    assert(Cid.ofBytes(big).cid == node.cid)
  }

  test("store dir sizing survives a cold restart (recursive tsize rebuild)") {
    val root = Files.createTempDirectory("cid-store")
    val warm = new ContentStore(root)
    val blob = warm.add("payload bytes\n".getBytes("UTF-8"))
    val inner = warm.cp(blob, warm.mkdir(), "file")
    // fresh instance: dagSizes cache is empty, so nesting the existing
    // dir forces the recursive dir -> child recomputation path
    val cold = new ContentStore(root)
    val outer = cold.cp(inner, cold.mkdir(), "sub")
    assert(cold.ls(outer) == Map("sub" -> inner))
    // and the address is state-independent: the warm store agrees
    assert(warm.cp(inner, warm.mkdir(), "sub") == outer)
  }

  test("base58 round-trips multihash bytes including leading zeros") {
    val mh = Array[Byte](0, 0, 18, 32) ++ Array.fill[Byte](30)(7)
    assert(Cid.base58Decode(Cid.base58(mh)).sameElements(mh))
  }

  test("empty content is addressable (zero-byte upload edge)") {
    val n = Cid.ofBytes(Array.emptyByteArray)
    assert(n.cid.startsWith("Qm") && n.filesize == 0L)
  }

  test("streaming eager-collapse build equals the whole-level build " +
      "across every group boundary") {
    // chunk k = 3 deterministic bytes; counts straddle the 174-per-node
    // and 174²-per-level boundaries where eager collapsing could diverge
    def chunks(n: Int) = (0 until n).iterator.map(k =>
      Array((k & 0xff).toByte, ((k >> 8) & 0xff).toByte, 0x5a.toByte))
    val counts = Seq(0, 1, 2, 173, 174, 175, 347, 348, 349,
      174 * 174 - 1, 174 * 174, 174 * 174 + 1)
    counts.foreach { n =>
      val eager = Cid.ofChunks(chunks(n))
      val naive = Cid.rootOfNaive(chunks(n))
      assert(eager == naive, s"divergence at $n chunks")
    }
  }
}
