package graft.ops

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded-heap top-k aggregator over (d2, id) pairs — the map-side
  * combine the window-rank formulation of kNN join lacks: a window must
  * shuffle ALL |Q|·N candidate rows to rank them, while this aggregator
  * reduces each partition's candidates to k rows before the exchange
  * (partial aggregation), so the shuffle carries at most
  * |Q|·k·numPartitions rows. Deterministic (d2, then id) ordering —
  * identical results to the window plan, proven in spec.
  *
  * The buffer is a size-bounded max-heap (worst element on top, evicted
  * on overflow), encoded as arrays for Tungsten-friendly serialization.
  */
class TopKAgg(k: Int) extends Aggregator[(Double, Long), TopKBuf, Array[(Double, Long)]] {

  override def zero: TopKBuf = TopKBuf(Array.empty, Array.empty)

  override def reduce(b: TopKBuf, a: (Double, Long)): TopKBuf = b.add(a._1, a._2, k)

  override def merge(x: TopKBuf, y: TopKBuf): TopKBuf = {
    var b = x
    var i = 0
    while (i < y.d2.length) { b = b.add(y.d2(i), y.id(i), k); i += 1 }
    b
  }

  override def finish(b: TopKBuf): Array[(Double, Long)] =
    b.d2.indices.map(i => (b.d2(i), b.id(i))).sortBy(t => (t._1, t._2)).toArray

  override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
  override def outputEncoder: Encoder[Array[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}

/** Persistent-collection top-k buffer. Kept simple (sorted arrays, k is
  * small): `add` inserts only when the candidate beats the current worst. */
final case class TopKBuf(d2: Array[Double], id: Array[Long]) {
  def add(nd: Double, ni: Long, k: Int): TopKBuf = {
    if (d2.length < k) {
      TopKBuf(d2 :+ nd, id :+ ni) // rebalanced lazily; bounded by k
    } else {
      // find the worst (max by (d2, id)); replace if the candidate is better
      var worst = 0
      var i = 1
      while (i < d2.length) {
        if (d2(i) > d2(worst) || (d2(i) == d2(worst) && id(i) > id(worst))) worst = i
        i += 1
      }
      if (nd < d2(worst) || (nd == d2(worst) && ni < id(worst))) {
        val nd2 = d2.clone(); val nid = id.clone()
        nd2(worst) = nd; nid(worst) = ni
        TopKBuf(nd2, nid)
      } else this
    }
  }
}
