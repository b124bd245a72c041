package graft.engine

import java.nio.file.Files

import graft.SparkSpec
import graft.store.{Catalog, DatasetMeta}

/** The driver metadata snapshot is bounded: above
  * `localIndexMaxRows` the catalog must stop materializing driver-side
  * index maps and the searchLocal snapshot, and every lookup/search
  * must return IDENTICAL results through the distributed fallback
  * paths (pushed-down point filters; Catalyst QAST backend). Exercised
  * by running the same workload through a default-cap catalog and a
  * zero-cap catalog over the same log.
  */
class CatalogBoundSpec extends SparkSpec {

  private def seed(c: Catalog): Seq[Long] = {
    c.insertFile("sha256-aaa", "text/csv")
    c.insertFile("sha256-bbb", "application/json")
    c.insertFile("sha256-ccc", "text/plain")
    c.setSchema("sha256-bbb", """{"type":"array"}""")
    val id1 = c.insertDataset(DatasetMeta("sha256-aaa", "pop", "web",
      Seq("demo", "csv"), Map("k" -> "v")))
    val id2 = c.insertDataset(DatasetMeta("sha256-bbb", "repos", "api",
      Seq("json")))
    val id3 = c.updateDataset(id2,
      DatasetMeta.Partial(description = Some("repos v2"))).get
    Seq(id1, id2, id3)
  }

  test("over-cap catalog answers lookups and search via distributed paths") {
    val root = Files.createTempDirectory("catalog-bound")
    val cached = new Catalog(spark, root)
    val ids = seed(cached)
    cached.flush() // compact the WAL so the parquet log is non-empty

    // cap 0: any non-empty log is over the cap -> no driver maps
    val bounded = new Catalog(spark, root, localIndexMaxRowsOverride = 0)

    assert(bounded.getType("sha256-aaa") == cached.getType("sha256-aaa"))
    assert(bounded.getType("sha256-zzz").isEmpty)
    assert(bounded.getSchema("sha256-bbb") == cached.getSchema("sha256-bbb"))

    // version-tree walk goes through point lookups
    assert(bounded.lineage(ids(2)).map(_.id) == cached.lineage(ids(2)).map(_.id))

    // searchLocal falls back to the Catalyst backend; same match set
    val q = """["==", [".", ["$"], "source"], "api"]"""
    val viaBounded = bounded.searchLocal(q).toOption.get
      .map(_("id").asInstanceOf[Long]).toSet
    val viaCached = cached.searchLocal(q).toOption.get
      .map(_("id").asInstanceOf[Long]).toSet
    assert(viaBounded == viaCached && viaBounded == Set(ids(1), ids(2)))
    // malformed queries still error identically (Ast-level validation
    // is shared by both backends)
    assert(bounded.searchLocal("not json").isLeft &&
      cached.searchLocal("not json").isLeft)
  }

  test("cap holds across the process lifetime: incremental writes past " +
      "it drop the driver maps, answers unchanged") {
    val root = Files.createTempDirectory("catalog-bound-life")
    // cap 2: the maps materialize small, then ingest crosses the cap
    val c = new Catalog(spark, root, localIndexMaxRowsOverride = 2)
    c.insertFile("sha256-one", "text/csv")
    assert(c.getType("sha256-one").contains("text/csv")) // builds the map
    seed(c) // 3 more files + 3 datasets: both indexes cross the cap
    // lookups of rows written before AND after the cap flip still work
    assert(c.getType("sha256-one").contains("text/csv"))
    assert(c.getType("sha256-ccc").contains("text/plain"))
    val post = c.insertDataset(DatasetMeta("sha256-one", "late", "fs", Nil))
    assert(c.lineage(post).map(_.file) == Seq("sha256-one"))
    // and the flip is sticky after a flush compacts the WAL
    c.flush()
    assert(c.getType("sha256-bbb").contains("application/json"))
  }

  test("over-cap catalog still serves fresh writes from the WAL (no job)") {
    val root = Files.createTempDirectory("catalog-bound-wal")
    val c0 = new Catalog(spark, root)
    seed(c0)
    c0.flush()

    val bounded = new Catalog(spark, root, localIndexMaxRowsOverride = 0)
    bounded.insertFile("sha256-new", "audio/wav")
    val id = bounded.insertDataset(DatasetMeta("sha256-new", "fresh", "s3",
      Seq("wav")))
    // pending-WAL hits resolve before any distributed lookup
    assert(bounded.getType("sha256-new").contains("audio/wav"))
    assert(bounded.lineage(id).map(_.file) == Seq("sha256-new"))
    // update-as-version against a parquet-resident parent also works
    val child = bounded.updateDataset(id,
      DatasetMeta.Partial(source = Some("s3-v2")))
    assert(child.isDefined)
    assert(bounded.lineage(child.get).map(_.id) == Seq(child.get, id))
  }
}
