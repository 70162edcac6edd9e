package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

import graft.functions.{PolyHash, SignatureKernel}
import graft.ts.{Identifiers, Rdp}
import graft.ts.Rdp.P

/** Property-based checks of the pure kernels (no SparkSession): signature
  * kernels against naive reimplementations, RDP invariants, identifier
  * round-trips. Complements the example-based suites with generated input.
  */
object KernelProps extends Properties("kernels") {

  private val asciiText: Gen[String] =
    Gen.listOf(Gen.frequency(
      8 -> Gen.alphaLowerChar, 2 -> Gen.numChar, 3 -> Gen.const(' '),
      1 -> Gen.oneOf('.', ',', '!', 'X', 'Q'))).map(_.mkString)

  // naive twins built from first principles
  private def naiveMinhash(text: String, k: Int, n: Int): Option[Seq[Long]] = {
    val toks = text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
    if (toks.length < k) None
    else {
      val shingles = toks.sliding(k).map(_.mkString(" ")).toSeq
      Some((0 until n).map(j => shingles.map(s => PolyHash.hash(s, j.toLong)).min))
    }
  }

  private def naiveSimhash(text: String, k: Int, bits: Int): Option[Long] = {
    val toks = text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
    if (toks.length < k) None
    else {
      val hs = toks.sliding(k).map(_.mkString(" ")).map(s => PolyHash.hash(s, 0L)).toSeq
      Some((0 until bits).map { b =>
        val bal = hs.map(h => if (((h >> b) & 1L) == 1L) 1 else -1).sum
        if (bal > 0) 1L << b else 0L
      }.sum)
    }
  }

  property("minhash kernel equals naive fold") = forAll(asciiText) { text =>
    SignatureKernel.minhash(text, 3, 16).map(_.toSeq) == naiveMinhash(text, 3, 16)
  }

  property("simhash kernel equals naive bit balance") = forAll(asciiText) { text =>
    SignatureKernel.simhash(text, 3, 30) == naiveSimhash(text, 3, 30)
  }

  // independent naive twin: full seeded fold per shingle (PolyHash.hash with
  // initial accumulator j) vs the kernel's algebraic h_0 + j·31^len derivation
  private def naiveSimhashWide(text: String, k: Int, seeds: Int): Option[Seq[Long]] = {
    val toks = text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
    if (toks.length < k) None
    else {
      val shingles = toks.sliding(k).map(_.mkString(" ")).toSeq
      val bits = seeds * 30
      val words = new Array[Long]((bits + 63) / 64)
      for (j <- 0 until seeds; b <- 0 until 30) {
        val bal = shingles.map(s =>
          if (((PolyHash.hash(s, j.toLong) >> b) & 1L) == 1L) 1 else -1).sum
        if (bal > 0) {
          val g = 30 * j + b
          words(g >> 6) |= (1L << (g & 63))
        }
      }
      Some(words.toSeq)
    }
  }

  property("wide simhash kernel equals naive per-seed bit balance") =
    forAll(asciiText) { text =>
      SignatureKernel.simhashWide(text, 3, 8).map(_.toSeq) == naiveSimhashWide(text, 3, 8)
    }

  property("minhash signature entries are valid hashes") = forAll(asciiText) { text =>
    SignatureKernel.minhash(text, 2, 8).forall(_.forall(h => h >= 0 && h < PolyHash.Mod))
  }

  private val series: Gen[Array[P]] =
    Gen.chooseNum(3, 200).flatMap { n =>
      Gen.listOfN(n, Gen.chooseNum(-100.0, 100.0)).map { vs =>
        vs.zipWithIndex.map { case (v, i) => P("s", i.toLong, v) }.toArray
      }
    }

  property("rdp keeps endpoints and returns a subsequence") =
    forAll(series, Gen.chooseNum(0.1, 50.0)) { (pts, eps) =>
      val out = Rdp.simplify(pts, eps)
      out.head == pts.head && out.last == pts.last &&
        out.length <= pts.length &&
        // subsequence: same order, all members present in input
        out.forall(p => pts.contains(p)) &&
        out.map(_.ts).sliding(2).forall(w => w.length < 2 || w(0) < w(1))
    }

  property("rdp point count is monotone non-increasing in epsilon") =
    forAll(series) { pts =>
      val a = Rdp.simplify(pts, 1.0).length
      val b = Rdp.simplify(pts, 10.0).length
      b <= a
    }

  private val nameGen: Gen[String] =
    Gen.nonEmptyListOf(Gen.frequency(
      8 -> Gen.alphaNumChar, 2 -> Gen.const(' '), 1 -> Gen.const('-'))).map(_.mkString)

  property("netatmo id round-trips for names without URL metacharacters") =
    forAll(nameGen, nameGen, nameGen) { (s, m, d) =>
      val parsed = Identifiers.parseNetatmoIdStr(Identifiers.netatmoIdStr(s, m, d))
      parsed.get("station_name").contains(s) &&
        parsed.get("module_name").contains(m) &&
        parsed.get("data_type").contains(d)
    }

  property("cleaned names contain only [a-z0-9-]") = forAll { (s: String) =>
    Identifiers.cleanNameStr(s).forall(c => c == '-' || (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9'))
  }

  property("rate limiter never exceeds its limit inside any window") =
    forAll(Gen.chooseNum(1, 5), Gen.listOfN(80, Gen.chooseNum(0L, 200L))) { (limit, deltas) =>
      var now = 0L
      val clock = () => now
      val rl = new graft.etl.RateLimiter(limit, 100L, clock)
      val acquired = scala.collection.mutable.ArrayBuffer.empty[Long]
      deltas.foreach { d =>
        now += d
        if (rl.tryAcquire()) acquired += now
      }
      // in every sliding 100-unit window, at most `limit` acquisitions
      acquired.forall(t => acquired.count(x => x > t - 100 && x <= t) <= limit)
    }

  property("SRP dots match a from-scratch reimplementation; bucket bits are their signs") =
    forAll(Gen.chooseNum(1, 10), Gen.listOfN(16, Gen.chooseNum(-8.0, 8.0))) { (planes, xs) =>
      import org.apache.spark.sql.catalyst.util.GenericArrayData
      val arr = new GenericArrayData(xs.toArray)
      val dots = SignatureKernel.srpDots(arr, floatElems = false, planes)
      // independent naive twin of the documented sign derivation
      val naive = (0 until planes).map { k =>
        xs.zipWithIndex.map { case (x, i) =>
          val mix = (1103515245L * (k.toLong * 131L + i + 1L) + 12345L) % 2147483648L
          if (mix % 2 == 0) x else -x
        }.foldLeft(0.0)(_ + _)
      }
      val bucket = graft.functions.SrpBucket(
        org.apache.spark.sql.catalyst.expressions.Literal.create(
          xs.toArray, org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.DoubleType, containsNull = false)), planes)
        .eval(null).asInstanceOf[Long]
      dots.toSeq == naive &&
        (0 until planes).forall(k => (((bucket >> k) & 1L) == 1L) == (dots(k) >= 0))
    }

  property("shingle-strings kernel equals naive sliding-window build (all modes)") =
    forAll(asciiText, Gen.choose(1, 4)) { (text, k) =>
      def naive(distinct: Boolean, sorted: Boolean): Seq[String] = {
        val toks = text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq
        if (toks.length < k) Seq.empty
        else {
          val sh = toks.sliding(k).map(_.mkString(" ")).toSeq
          val d = if (distinct) sh.distinct else sh
          if (sorted) d.sorted else d // ASCII: UTF-16 and byte order coincide
        }
      }
      Seq((false, false), (true, false), (true, true)).forall { case (d, s) =>
        SignatureKernel.shingleStrings(text, k, d, s).map(_.toString).toSeq == naive(d, s)
      }
    }

  property("winnow-encoded kernel equals brute window-min over encoded grams") =
    forAll(asciiText, Gen.choose(1, 3), Gen.choose(1, 5)) { (text, k, w) =>
      val cap = SignatureKernel.WinnowPosCap
      val toks = text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq
      val naive =
        if (toks.length < k) Seq.empty
        else {
          val e = (0 to toks.length - k).map(i =>
            PolyHash.hash(toks.slice(i, i + k).mkString(" "), 0L) * cap + (cap - 1L - i))
          val start = math.min(w - 1, e.length - 1)
          (start until e.length).map(p => e.slice(math.max(0, p - w + 1), p + 1).min)
            .distinct.sorted
        }
      SignatureKernel.winnowEncoded(text, k, w).toSeq == naive
    }

  property("PPM codec round-trips pixel stats for arbitrary payloads") =
    forAll(Gen.listOf(Gen.chooseNum(Byte.MinValue, Byte.MaxValue))) { bytes =>
      val payload = bytes.toArray
      val (w, h, sum, mx) = graft.pipeline.Multimodal.decodePpm(
        graft.pipeline.Multimodal.buildPpm(payload))
      val unsigned = payload.map(_ & 0xff)
      w.toLong * h * 3 >= payload.length && // frame carries every byte
        sum == unsigned.map(_.toLong).sum && // zero padding is sum-invariant
        mx == (if (unsigned.isEmpty) 0 else unsigned.max) // max survives padding
    }
}
