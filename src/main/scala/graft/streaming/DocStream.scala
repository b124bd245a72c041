package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

import graft.operators.Dedup

/** Streaming NEAR-duplicate suppression over a document stream — the
  * training-data-ingest shape batch dedup can't cover: "drop this
  * document if something almost identical already flowed past",
  * decided incrementally, with bounded state.
  *
  * Design (single stateful stage, no cross-stage chaining):
  *   1. stateless projection: distinct 3-token shingles → 64-perm
  *      MinHash signature (native `minhash_sig`) → the doc's FIRST
  *      LSH band hash is its bucket key. Near-dups (J ≥ ~0.5) collide
  *      in a band with probability 1-(1-J^r)^1 = J^4 per band; keying
  *      on one band trades recall (≈0.66 at J=0.9) for a single
  *      shuffle — the multi-band variant is this same operator run b
  *      times with union, still one stateful op per band.
  *   2. `flatMapGroupsWithState` keyed on the bucket: state holds the
  *      signatures previously admitted in this bucket (FIFO-bounded at
  *      `MaxPerBucket`); an arriving doc is emitted only if its
  *      estimated Jaccard (fraction of agreeing MinHash perms) against
  *      every stored signature stays below `minJ`. Precision therefore
  *      does NOT depend on the coarse bucket key — collisions are
  *      re-verified against full signatures.
  *
  * At scale: state is per-bucket and bounded, so total state is
  * O(buckets × MaxPerBucket × NumPerms longs) regardless of stream
  * length; buckets distribute by hash across executors. Batch parity:
  * admitting first-seen docs per near-dup cluster is exactly what
  * `Dedup.minhashLsh` + keep-min-id does offline (DocStreamSpec pins
  * the streaming decisions against the batch pair contract).
  */
object DocStream {

  /** Admission threshold on ESTIMATED Jaccard (signature agreement). */
  val MinJ = 0.5
  /** FIFO bound on signatures retained per bucket. */
  val MaxPerBucket = 64

  case class SigDoc(doc_id: Long, bucket: Long, sig: Seq[Long])
  case class BucketState(sigs: List[Seq[Long]])
  case class Admitted(doc_id: Long, bucket: Long, n_compared: Int)

  /** Stateless prefix: text → signature + band-0 bucket key. Works on
    * batch and streaming frames alike.
    */
  def signed(docs: DataFrame): Dataset[SigDoc] = {
    import docs.sparkSession.implicits._
    docs
      .select(col("doc_id"),
        Dedup.minhashSignature(Dedup.shingles(col("text"))).as("sig"))
      .select(col("doc_id"),
        Dedup.bandBucket(col("sig"), lit(0)).as("bucket"), col("sig"))
      .as[SigDoc]
  }

  /** Fraction of agreeing permutations — the MinHash Jaccard estimate. */
  def estJaccard(a: Seq[Long], b: Seq[Long]): Double =
    a.iterator.zip(b.iterator).count { case (x, y) => x == y }.toDouble /
      Dedup.NumPerms

  /** The stateful admission decision. Within a micro-batch, docs are
    * processed in doc_id order so admission is deterministic (iterator
    * order from a shuffle is not).
    */
  def nearDeduped(docs: DataFrame): Dataset[Admitted] = {
    import docs.sparkSession.implicits._
    signed(docs)
      .groupByKey(_.bucket)
      .flatMapGroupsWithState[BucketState, Admitted](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (bucket, rows, state) =>
          var seen = state.getOption.getOrElse(BucketState(Nil)).sigs
          val out = rows.toSeq.sortBy(_.doc_id).flatMap { d =>
            val dup = seen.exists(s => estJaccard(s, d.sig) >= MinJ)
            if (dup) None
            else {
              val nCompared = seen.size // before FIFO truncation
              seen = (d.sig :: seen).take(MaxPerBucket)
              Some(Admitted(d.doc_id, bucket, nCompared))
            }
          }
          state.update(BucketState(seen))
          out.iterator
      }
  }
}
