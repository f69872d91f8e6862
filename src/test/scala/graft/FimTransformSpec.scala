package graft

import java.security.MessageDigest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.models.CurationModels

/** c16 FIM-transform semantics: the PSM reordering is reconstructible
  * from the emitted geometry (prefix/middle/suffix partition the
  * original tokens; the hash witnesses the exact emitted stream), the
  * md5 coin lands near its 50% rate, and short docs pass through.
  */
class FimTransformSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  val sfDir = "/root/testdata/sf0.001"

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def normToks(text: String): Array[String] =
    text.trim.replaceAll("\\s+", " ").toLowerCase.split(" ", -1)

  test("c16: geometry partitions the doc and the hash witnesses the PSM stream") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    val out = CurationModels.fimTransform(spark, sfDir)
      .select($"doc_id", $"n_tokens", $"fim_applied",
        $"n_prefix", $"n_middle", $"n_suffix", $"out_hash")
      .as[(Long, Long, Boolean, Option[Long], Option[Long], Option[Long], String)]
      .collect()
    assert(out.length == docs.size, "one row per doc")
    out.foreach { case (id, n, applied, pre, mid, suf, hash) =>
      val toks = normToks(docs(id))
      assert(n == toks.length.toLong, s"doc $id token count")
      if (applied) {
        val (p, m, s) = (pre.get, mid.get, suf.get)
        assert(p >= 1 && s >= 1 && m >= 0, s"doc $id geometry ($p,$m,$s)")
        assert(p + m + s == n, s"doc $id segments must partition")
        val p1 = p.toInt; val p2 = (p + m).toInt
        val psm = (Seq("<fim_prefix>") ++ toks.slice(0, p1) ++
          Seq("<fim_suffix>") ++ toks.slice(p2, toks.length) ++
          Seq("<fim_middle>") ++ toks.slice(p1, p2)).mkString(" ")
        assert(hash == md5hex(psm), s"doc $id PSM hash")
      } else {
        assert(pre.isEmpty && mid.isEmpty && suf.isEmpty)
        assert(hash == md5hex(toks.mkString(" ")), s"doc $id passthrough")
      }
    }
    // the md5 coin sits near its 50% rate over eligible docs
    val eligible = out.filter(_._2 >= 4)
    val rate = eligible.count(_._3).toDouble / eligible.length
    assert(rate > 0.25 && rate < 0.75, s"apply rate $rate")
    // short docs never transform
    assert(out.filter(_._2 < 4).forall(!_._3))
  }
}
