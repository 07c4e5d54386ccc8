package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable.ArrayBuffer

/** KLL-style streaming quantile sketch (Karnin–Lang–Liberty, FOCS 2016;
  * cf. PAPERS.md "KLL±"). Deterministic variant: the compaction offset is
  * derived from the per-level compaction counter instead of a random bit, so
  * repeated runs over the same data produce identical sketches (required for
  * the engine's reproducible drift verdicts).
  *
  * Mergeable (associative, order-insensitive up to compaction determinism),
  * O(k log(n/k)) space — the scale path for distribution-drift checks where
  * exact quantiles would need a full sort of 10^12 values.
  */
final class KllBuffer(val k: Int) extends Serializable {
  // level h holds items with weight 2^h
  var levels: ArrayBuffer[ArrayBuffer[Double]] = ArrayBuffer(ArrayBuffer.empty)
  var compactions: Long = 0L
  var count: Long = 0L

  private def capacity(h: Int): Int = {
    // geometric decay toward higher (older) levels, floor of 8
    val top = levels.length - 1
    math.max(8, math.ceil(k * math.pow(2.0 / 3.0, top - h)).toInt)
  }

  def update(v: Double): Unit = {
    levels(0) += v
    count += 1
    compress()
  }

  def merge(other: KllBuffer): Unit = {
    while (levels.length < other.levels.length) levels += ArrayBuffer.empty
    var h = 0
    while (h < other.levels.length) {
      levels(h) ++= other.levels(h)
      h += 1
    }
    count += other.count
    compactions += other.compactions
    compress()
  }

  private def totalSize: Int = {
    var s = 0; var h = 0
    while (h < levels.length) { s += levels(h).length; h += 1 }
    s
  }

  private def compress(): Unit = {
    var guard = 0
    while (totalSize > 3 * k && guard < 64) {
      guard += 1
      // compact the lowest over-capacity level
      var h = 0
      var done = false
      while (h < levels.length && !done) {
        if (levels(h).length > capacity(h)) { compact(h); done = true }
        h += 1
      }
      if (!done) {
        // nothing individually over capacity: compact the largest level
        val h2 = levels.indices.maxBy(levels(_).length)
        if (levels(h2).length >= 2) compact(h2) else return
      }
    }
  }

  private def compact(h: Int): Unit = {
    if (levels.length == h + 1) levels += ArrayBuffer.empty
    val sorted = levels(h).sortInPlace()
    val l = sorted.length
    // odd count: one item cannot pair — it stays at level h (mass conserved)
    val start = l % 2
    val offset = start + (compactions & 1L).toInt // deterministic alternation
    compactions += 1
    val kept = ArrayBuffer.empty[Double]
    var i = offset
    while (i < l) { kept += sorted(i); i += 2 }
    val remainder =
      if (start == 1) ArrayBuffer(sorted(0)) else ArrayBuffer.empty[Double]
    levels(h) = remainder
    levels(h + 1) ++= kept
  }

  /** Weighted quantile estimates for the given probabilities. */
  def quantiles(ps: Seq[Double]): Array[Double] = {
    if (count == 0) return ps.map(_ => Double.NaN).toArray
    val items = ArrayBuffer.empty[(Double, Long)]
    var h = 0
    while (h < levels.length) {
      val w = 1L << h
      levels(h).foreach(v => items += ((v, w)))
      h += 1
    }
    val sorted = items.sortBy(_._1)
    val totalW = sorted.iterator.map(_._2).sum.toDouble
    ps.map { p =>
      val target = p * totalW
      var acc = 0.0
      var i = 0
      var res = sorted.last._1
      var found = false
      while (i < sorted.length && !found) {
        acc += sorted(i)._2
        if (acc >= target) { res = sorted(i)._1; found = true }
        i += 1
      }
      res
    }.toArray
  }

  def serialize(): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(k); out.writeLong(count); out.writeLong(compactions)
    out.writeInt(levels.length)
    levels.foreach { lvl =>
      out.writeInt(lvl.length)
      lvl.foreach(out.writeDouble)
    }
    out.flush()
    bos.toByteArray
  }
}

object KllBuffer {
  def deserialize(bytes: Array[Byte]): KllBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new KllBuffer(in.readInt())
    buf.count = in.readLong(); buf.compactions = in.readLong()
    val nLevels = in.readInt()
    buf.levels = ArrayBuffer.tabulate(nLevels) { _ =>
      val n = in.readInt()
      val lvl = new ArrayBuffer[Double](n)
      var i = 0
      while (i < n) { lvl += in.readDouble(); i += 1 }
      lvl
    }
    buf
  }
}
