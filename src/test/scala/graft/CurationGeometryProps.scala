package graft

import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck properties for the curation tier's pure geometry — the
  * algebraic contracts c04 (chunk windows) and c05 (sequence packing)
  * rely on, checked against brute-force reference implementations
  * (no SparkSession; the SQL/DataFrame formulations encode exactly
  * these formulas).
  */
object CurationGeometryProps extends Properties("CurationGeometry") {

  private val W = 32
  private val S = 24

  /** chunk count formula used by c04 on both engine and oracle side */
  private def chunkCount(n: Int): Int =
    if (n <= W) 1 else (n - W + S - 1) / S + 1

  property("c04 chunks cover every token exactly; no redundant tail") =
    Prop.forAll(Gen.chooseNum(1, 500)) { n =>
      val k = chunkCount(n)
      val starts = (0 until k).map(_ * S)
      val covered = starts.flatMap(s => s until math.min(s + W, n)).toSet
      val lastStart = starts.last
      covered == (0 until n).toSet && // full coverage
        lastStart + W >= n && // last chunk reaches the end
        (k == 1 || (k - 2) * S + W < n) // dropping a chunk loses coverage
    }

  property("c04 consecutive chunks overlap by W−S except a short tail") =
    Prop.forAll(Gen.chooseNum(W + 1, 500)) { n =>
      val starts = (0 until chunkCount(n)).map(_ * S)
      starts.sliding(2).forall { case Seq(a, b) =>
        val aEnd = math.min(a + W, n)
        val bEnd = math.min(b + W, n)
        val overlap = aEnd - b
        overlap == math.min(W - S, bEnd - b)
      }
    }

  /** brute-force packer: sequential offsets, seq = offset div budget */
  private def brutePack(sizes: Seq[Int], budget: Int)
      : Seq[(Long, Long, Long, Boolean)] = {
    var off = 0L
    sizes.map { n =>
      val start = off
      val end = off + n
      off = end
      val first = start / budget
      val last = (end - 1) / budget
      (start, first, last, last > first)
    }
  }

  property("c05 closed-form first/last/split equals the sequential packer") =
    Prop.forAll(
      Gen.nonEmptyListOf(Gen.chooseNum(1, 400)),
      Gen.chooseNum(16, 512)) { (sizes, budget) =>
      // the engine computes per-row: start = cumsum-exclusive,
      // first = start div B, last = (start+n-1) div B — this must
      // agree with a stateful one-pass packer for every prefix
      var cum = 0L
      val closedForm = sizes.map { n =>
        val start = cum
        cum += n
        val first = start / budget
        val last = (cum - 1) / budget
        (start, first, last, last > first)
      }
      closedForm == brutePack(sizes, budget)
    }

  property("c05 documents not split iff they fit inside one budget window") =
    Prop.forAll(
      Gen.nonEmptyListOf(Gen.chooseNum(1, 300)),
      Gen.chooseNum(32, 256)) { (sizes, budget) =>
      brutePack(sizes, budget).zip(sizes).forall {
        case ((start, _, _, split), n) =>
          val inWindow = (start % budget) + n <= budget
          split == (!inWindow) &&
            // a doc larger than the budget always splits
            (n <= budget || split)
      }
    }
}
