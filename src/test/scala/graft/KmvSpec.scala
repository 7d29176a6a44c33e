package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.graftvec.KmvBuffer

class KmvSpec extends AnyFunSuite {

  private def bufferOf(k: Int, vs: Seq[Long]): KmvBuffer = {
    val b = new KmvBuffer(k)
    vs.foreach(b.add)
    b
  }

  test("keeps the k smallest distinct values") {
    val b = bufferOf(4, Seq(9L, 3L, 7L, 3L, 1L, 8L, 2L, 2L))
    assert(b.size === 4)
    assert(b.kth === 7L) // sorted distinct: 1,2,3,7
  }

  test("small sets report exact size") {
    val b = bufferOf(256, (1L to 100L) ++ (1L to 100L))
    assert(b.size === 100)
  }

  test("merge equals single-pass") {
    val vs = (0 until 1000).map(i => (i.toLong * 2654435761L + 104729L) % 1000000007L)
    val (l, r) = vs.splitAt(317)
    val merged = bufferOf(16, l)
    merged.addAll(bufferOf(16, r))
    val single = bufferOf(16, vs)
    assert(merged.size === single.size)
    assert(merged.kth === single.kth)
  }

  test("serialization round-trips") {
    val b = bufferOf(8, Seq(5L, 1L, 9L, 3L, 14L, 11L, 2L, 8L, 7L, 6L))
    val back = KmvBuffer.fromBytes(8, b.toBytes)
    assert(back.size === b.size)
    assert(back.kth === b.kth)
  }

  test("estimate tracks true cardinality within ~3 sigma") {
    val k = 256
    val P = 1000000007L
    val n = 50000
    val b = bufferOf(k, (0 until n).map(i => (i.toLong * 2654435761L + 104729L) % P))
    val est = (k - 1).toLong * P / (b.kth + 1L)
    val sigma = n / math.sqrt(k)
    assert(math.abs(est - n) < 3 * sigma, s"est=$est n=$n")
  }
}
