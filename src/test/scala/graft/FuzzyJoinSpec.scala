package graft

import graft.ops.FuzzyJoin

/** Deletion-neighborhood blocking must be EXACT for ED <= 1 — the whole
  * point over phonetic/prefix blocking is zero false negatives.
  */
class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  test("editJoin finds deletion, insertion, substitution, and exact matches; misses nothing") {
    val master = Seq((1L, "anna"), (2L, "bob"), (3L, "carol")).toDF("id", "name")
    val dirty = Seq((10L, "ana"), (11L, "bobb"), (12L, "cxrol"),
      (13L, "zzz"), (14L, "bob")).toDF("id", "name")
    val got = FuzzyJoin.editJoin(dirty, master, "id", "name", "id", "name")
      .collect()
      .map(r => ((r.getAs[Long]("id_a"), r.getAs[Long]("id_b")),
        r.getAs[Int]("dist"))).toMap
    assert(got.keySet == Set((10L, 1L), (11L, 2L), (12L, 3L), (14L, 2L)))
    assert(got((10L, 1L)) == 1 && got((11L, 2L)) == 1
      && got((12L, 3L)) == 1 && got((14L, 2L)) == 0)
  }

  test("editJoin equals brute-force all-pairs ED <= 1 on a random corpus") {
    val rnd = new scala.util.Random(3)
    def word(): String = Seq.fill(3 + rnd.nextInt(4))(('a' + rnd.nextInt(4)).toChar).mkString
    val ws = Seq.fill(60)(word()).distinct
    val (l, r) = ws.splitAt(ws.length / 2)
    val left = l.zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("id", "name")
    val right = r.zipWithIndex.map { case (w, i) => (i.toLong + 1000, w) }.toDF("id", "name")
    val got = FuzzyJoin.editJoin(left, right, "id", "name", "id", "name")
      .collect().map(x => (x.getAs[Long]("id_a"), x.getAs[Long]("id_b"))).toSet
    def ed(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val brute = (for {
      (wa, ia) <- l.zipWithIndex
      (wb, ib) <- r.zipWithIndex
      if ed(wa, wb) <= 1
    } yield (ia.toLong, ib.toLong + 1000)).toSet
    assert(got == brute, s"blocked ${got.size} vs brute ${brute.size}")
    assert(brute.nonEmpty, "degenerate corpus: no ED<=1 pairs to verify against")
  }

  test("maxDist > 2 refuses (blocking fan-out unbounded); null keys drop") {
    val df = Seq((1L, "ab"), (2L, null.asInstanceOf[String])).toDF("id", "name")
    intercept[IllegalArgumentException](
      FuzzyJoin.editJoin(df, df, "id", "name", "id", "name", maxDist = 3))
    assert(FuzzyJoin.editJoin(df, df, "id", "name", "id", "name").count() == 1)
  }

  test("entities: matches cluster to min id, ambiguous dirty record merges masters, singletons self-label") {
    val master = Seq((1L, "anna"), (2L, "bob"), (3L, "zzz"),
      (4L, "cat"), (5L, "cap")).toDF("id", "name")
    val dirty = Seq((10L, "ana"), (11L, "bo"), (12L, "annb"),
      (13L, "qqq"), (15L, "ca")).toDF("id", "name")
    val got = FuzzyJoin.entities(dirty, master, "id", "name", "id", "name")
      .collect()
      .map(r => r.getAs[Long]("record_id") ->
        ((r.getAs[Long]("entity_id"), r.getAs[Long]("entity_size")))).toMap
    assert(got == Map(
      1L -> ((1L, 3L)), 10L -> ((1L, 3L)), 12L -> ((1L, 3L)),
      2L -> ((2L, 2L)), 11L -> ((2L, 2L)),
      // "ca" is within ED 1 of BOTH cat and cap: the masters merge
      4L -> ((4L, 3L)), 5L -> ((4L, 3L)), 15L -> ((4L, 3L)),
      3L -> ((3L, 1L)), 13L -> ((13L, 1L))), s"got $got")
  }

  test("editJoin at maxDist=2 equals brute-force ED <= 2; catches transpositions and double typos ED-1 misses") {
    // targeted shapes: transposition (ED 2 under plain Levenshtein),
    // two substitutions, insertion+deletion, and an ED-3 exclusion
    val master = Seq((1L, "martha"), (2L, "concord"), (3L, "pepper"))
      .toDF("id", "name")
    val dirty = Seq((10L, "amrtha"), (11L, "cancard"), (12L, "peppres"),
      (13L, "pppr"), (14L, "zzzzzz")).toDF("id", "name")
    val got2 = FuzzyJoin.editJoin(dirty, master, "id", "name", "id", "name",
      maxDist = 2).collect()
      .map(r => ((r.getAs[Long]("id_a"), r.getAs[Long]("id_b")),
        r.getAs[Int]("dist"))).toMap
    assert(got2.keySet == Set((10L, 1L), (11L, 2L), (12L, 3L), (13L, 3L)),
      s"got ${got2.keySet}")
    assert(got2((10L, 1L)) == 2 && got2((11L, 2L)) == 2
      && got2((12L, 3L)) == 2 && got2((13L, 3L)) == 2)
    // none of these are reachable at radius 1
    assert(FuzzyJoin.editJoin(dirty, master, "id", "name", "id", "name")
      .count() == 0)

    // brute parity on a random corpus (same generator as the ED-1 twin)
    val rnd = new scala.util.Random(7)
    def word(): String = Seq.fill(3 + rnd.nextInt(4))(('a' + rnd.nextInt(4)).toChar).mkString
    val ws = Seq.fill(60)(word()).distinct
    val (l, r) = ws.splitAt(ws.length / 2)
    val left = l.zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("id", "name")
    val right = r.zipWithIndex.map { case (w, i) => (i.toLong + 1000, w) }.toDF("id", "name")
    val got = FuzzyJoin.editJoin(left, right, "id", "name", "id", "name",
      maxDist = 2).collect()
      .map(x => (x.getAs[Long]("id_a"), x.getAs[Long]("id_b"))).toSet
    def ed(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val brute = (for {
      (wa, ia) <- l.zipWithIndex
      (wb, ib) <- r.zipWithIndex
      if ed(wa, wb) <= 2
    } yield (ia.toLong, ib.toLong + 1000)).toSet
    assert(got == brute, s"blocked ${got.size} vs brute ${brute.size}")
    assert(brute.nonEmpty, "degenerate corpus: no ED<=2 pairs to verify against")
  }
}
