package graft.functions

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property-based invariants of the bloom bit-set algebra — what the
  * distributed aggregate relies on under any partitioning: inserted
  * keys always probe true, and a merge of two filters answers true
  * for everything either side held. */
object BloomFilterProps extends Properties("BloomFilter") {

  private val keys: Gen[List[Long]] =
    Gen.choose(0, 300).flatMap(n =>
      Gen.listOfN(n, Gen.choose(Long.MinValue, Long.MaxValue)))

  private def build(ks: Seq[Long], bytes: Int, nh: Int): Array[Byte] = {
    val bits = new Array[Byte](bytes)
    ks.foreach(BloomFilter.set(bits, _, nh))
    bits
  }

  property("no false negatives for any key set") =
    forAll(keys, Gen.choose(1, 8)) { (ks, nh) =>
      val bits = build(ks, 1024, nh)
      ks.forall(BloomFilter.mightContain(bits, _, nh))
    }

  property("merge (byte-wise OR) answers true for both sides' keys") =
    forAll(keys, keys, Gen.choose(1, 8)) { (as, bs, nh) =>
      val a = build(as, 512, nh)
      val b = build(bs, 512, nh)
      val merged = new Array[Byte](512)
      var i = 0
      while (i < merged.length) { merged(i) = (a(i) | b(i)).toByte; i += 1 }
      (as ++ bs).forall(BloomFilter.mightContain(merged, _, nh))
    }

  property("probe order and duplicate inserts are irrelevant") =
    forAll(keys, Gen.choose(1, 8)) { (ks, nh) =>
      val once = build(ks, 1024, nh)
      val twiceShuffled = build(scala.util.Random.shuffle(ks ++ ks), 1024, nh)
      once.sameElements(twiceShuffled)
    }
}
