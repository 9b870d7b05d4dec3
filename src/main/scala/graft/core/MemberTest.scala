package graft.core

/** Serializable membership test for the filtered-ANN bucket scan
  * (round 16): the broadcast side of
  * [[graft.operators.IvfIndex.searchMergedAllowed]]. Two rungs:
  *
  *  - [[SetMember]] — exact ids in a hash set. Allow or deny polarity;
  *    size bounded by `graft.ann.filtered.max`.
  *  - [[BloomMember]] — a Bloom filter over the allow ids (the scale
  *    rung: constant-size broadcast at ANY selectivity). ALLOW
  *    polarity only — a false positive on the allow side admits a
  *    non-matching row that the post-scan verification step drops,
  *    but a false positive on a deny side would silently EXCLUDE a
  *    matching row, which nothing downstream could recover. The store
  *    facade pairs this rung with candidate over-fetch + an exact
  *    verification semi-join + an exact-scan refill for any query the
  *    dropped false positives underfill — see `VdbStore.query`'s
  *    bloom branch for the exactness argument.
  */
sealed trait MemberTest[K] extends Serializable {
  def contains(k: K): Boolean

  /** True when NO key can ever pass (the empty allow set) — lets the
    * scan skip the cluster sweep entirely.
    */
  def matchesNothing: Boolean = false
}

final class SetMember[K](set: java.util.HashSet[K]) extends MemberTest[K] {
  def contains(k: K): Boolean = set.contains(k)
  override def matchesNothing: Boolean = set.isEmpty
}

object SetMember {
  def apply[K](ids: Array[K]): SetMember[K] = {
    val s = new java.util.HashSet[K](math.max(16, ids.length * 2))
    ids.foreach(s.add)
    new SetMember(s)
  }
}

/** Arbitrary-predicate membership — the whereFn shape. Used by the
  * in-process replica's filtered scan (driver-local, so the closure
  * never ships); distributed callers should prefer the set/bloom
  * rungs, whose cost model is explicit.
  */
final class PredicateMember[K](p: K => Boolean) extends MemberTest[K] {
  def contains(k: K): Boolean = p(k)
}

/** Bloom membership over string ids. Holds the filter SERIALIZED and
  * inflates once per JVM after broadcast — `spark.util.sketch`'s
  * implementation classes are not part of Spark's public serialization
  * contract, so shipping our own bytes keeps the broadcast stable
  * across Spark versions.
  */
final class BloomMember(bytes: Array[Byte]) extends MemberTest[String] {
  @transient private lazy val bf =
    org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(bytes))
  def contains(k: String): Boolean = bf.mightContainString(k)
}

object BloomMember {
  def apply(bf: org.apache.spark.util.sketch.BloomFilter): BloomMember = {
    val out = new java.io.ByteArrayOutputStream()
    bf.writeTo(out)
    new BloomMember(out.toByteArray)
  }
}
