package graft.sig

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed Aggregator (the guide-blessed extension point for custom
  * aggregates): a per-GROUP MinHash signature over 64-bit element hashes.
  *
  * Set-union semantics make it mergeable and constant-size: the signature
  * of a group is exactly `MinHashSig.signature` of the union of its
  * elements, regardless of partitioning — so `groupBy(domain).agg(...)`
  * yields per-domain sketches whose pairwise `MinHashSig.estimate` is a
  * Jaccard estimate between whole domains. That is the corpus-scale
  * summarization primitive (cross-domain boilerplate detection, shard
  * similarity triage) a 100 TB dedup pipeline runs BEFORE pair-level work:
  * constant bytes per group, one shuffle, no pair enumeration.
  *
  * Usage:
  * {{{
  *   val agg = new MinHashAggregator(64, 13L).toColumn.name("sig")
  *   ds.groupByKey(_.domain).agg(agg)          // typed
  *   df.groupBy($"domain")
  *     .agg(udaf(new MinHashAggregator(64, 13L)).apply($"token_hash"))
  * }}}
  */
class MinHashAggregator(numPerm: Int, seed: Long)
  extends Aggregator[Long, Array[Long], Array[Long]] with Serializable {

  @transient private lazy val perms: (Array[Long], Array[Long]) =
    MinHashSig.permutations(numPerm, seed)

  override def zero: Array[Long] = MinHashSig.emptySignature(numPerm)

  override def reduce(buf: Array[Long], elementHash: Long): Array[Long] = {
    MinHashSig.update(buf, elementHash, perms._1, perms._2)
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    MinHashSig.merge(a, b)

  override def finish(reduction: Array[Long]): Array[Long] = reduction

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}
