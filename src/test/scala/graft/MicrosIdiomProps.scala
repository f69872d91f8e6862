package graft

import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck properties for the engine's pure numeric conventions
  * (no SparkSession — these are the algebraic contracts the SQL
  * formulations rely on).
  */
object MicrosIdiomProps extends Properties("MicrosIdiom") {

  // the exact-average idiom: floor((sum*1e6)/n) is within 1 micro of
  // the true mean, and deterministic for any (sum, n)
  property("floor-division micros average within 1e-6 of true mean") =
    Prop.forAll(Gen.chooseNum(0L, 1000000000L), Gen.chooseNum(1L, 100000L)) {
      (sumCents: Long, n: Long) =>
        val sum = BigDecimal(sumCents) / 100 // scale-2 decimal
        val micros = ((sum * 1000000).toBigInt / n).toLong
        val approx = BigDecimal(micros) / 1000000
        val exact = sum / n
        (exact - approx).abs <= BigDecimal("0.000001")
    }

  // camelize contract used by the replicator rename projection
  property("camelize keeps head segment and capitalizes the rest") =
    Prop.forAll(Gen.nonEmptyListOf(Gen.identifier.suchThat(_.nonEmpty))) {
      segs0 =>
        val segs = segs0.map(_.toLowerCase)
        val name = segs.mkString("_")
        val camel = segs.head + segs.tail.map(_.capitalize).mkString
        !camel.contains("_") &&
          camel.toLowerCase == segs.mkString &&
          camel.startsWith(segs.head)
    }

  // simhash bit decode: hex-digit value reconstruction matches nibbles
  property("hex digit decode equals high/low nibble arithmetic") =
    Prop.forAll(Gen.chooseNum(0, 255)) { b =>
      val hex = f"$b%02x"
      def v(c: Char): Int = "0123456789abcdef".indexOf(c)
      v(hex(0)) == ((b >> 4) & 0xf) && v(hex(1)) == (b & 0xf)
    }
}
