package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.core.EngineSession
import graft.operators.{AsOfJoin, KeyBloom, RangeJoin, SaltedJoin}

/** Equivalence properties for the custom join operators on seeded random
  * data: each scale-oriented implementation must produce EXACTLY the result
  * of its naive reference composition (SURVEY §5.3).
  */
class OperatorPropertySpec extends AnyFunSuite {

  lazy val spark: SparkSession = EngineSession.getOrCreate("graft-test")
  import spark.implicits._

  private def randomEvents(seed: Long, n: Int) = {
    val g = for {
      uid <- Gen.chooseNum(0L, 5L)
      off <- Gen.chooseNum(0L, 3600L)
    } yield (uid, off)
    Gen.listOfN(n, g).apply(Gen.Parameters.default, Seed(seed)).get
      .zipWithIndex
      .map { case ((uid, off), i) =>
        (i.toLong, uid, new java.sql.Timestamp(1700000000000L + off * 1000L))
      }
      .toDF("id", "uid", "ts")
  }

  test("KeyBloom: NO false negatives ever; false positives bounded (5 seeds)") {
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      val members = Seq.fill(4000)(rnd.nextLong()).distinct
      val words = new Array[Long](KeyBloom.Words)
      members.foreach(k => KeyBloom.set(words, k))
      val hex = KeyBloom.toHex(words)
      // round-trip through the log's hex form
      assert(KeyBloom.fromHex(hex).sameElements(words))
      // the contract pruning correctness rests on: members ALWAYS hit
      members.foreach(k => assert(KeyBloom.mightContain(hex, k)))
      // FP rate at design load (4k keys, 64Ki bits, k=3): ~0.4%
      val probes = Seq.fill(20000)(rnd.nextLong()).filterNot(members.toSet)
      val fp = probes.count(KeyBloom.mightContain(hex, _))
      assert(fp.toDouble / probes.size < 0.02,
        s"seed $seed: FP rate ${fp.toDouble / probes.size}")
    }
  }

  test("RangeJoin.timeBand == naive theta join (5 random datasets)") {
    for (seed <- 1L to 5L) {
      val ev = randomEvents(seed, 300)
      val banded = RangeJoin.timeBand(ev, ev, "ts", "ts", deltaSeconds = 300,
          extra = (_, _) => col("a_uid") =!= col("b_uid"))
        .select(col("a_id"), col("b_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val a = ev.toDF("a_id", "a_uid", "a_ts")
      val b = ev.toDF("b_id", "b_uid", "b_ts")
      val naive = a.join(b,
          col("b_ts") > col("a_ts") &&
          col("b_ts") <= col("a_ts") + expr("INTERVAL 300 SECONDS") &&
          col("a_uid") =!= col("b_uid"))
        .select(col("a_id"), col("b_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(banded == naive, s"seed=$seed")
    }
  }

  test("AsOfJoin.backward == window-based reference (5 random datasets)") {
    for (seed <- 1L to 5L) {
      val ev = randomEvents(seed, 200)
      val left = ev.filter(col("id") % 2 === 0).select("id", "uid", "ts")
      val right = ev.filter(col("id") % 2 === 1)
        .select(col("uid"), col("ts"), col("id").as("rid"))
      val got = AsOfJoin.backward(left, right, on = "ts", by = "uid",
          payload = Seq("rid"))
        .select("id", "right_rid")
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
      // naive reference: per left row, the max-(ts, rid) right row at/before
      val naive = left.as("l").join(right.as("r"),
          col("l.uid") === col("r.uid") && col("r.ts") <= col("l.ts"), "left")
        .groupBy(col("l.id"))
        .agg(max(struct(col("r.ts"), col("r.rid"))).as("m"))
        .select(col("id"), col("m.rid"))
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
      assert(got == naive, s"seed=$seed")
    }
  }

  test("SaltedJoin.inner == plain inner join (5 random datasets)") {
    for (seed <- 1L to 5L) {
      val probe = randomEvents(seed, 400).select(col("id"), col("uid"))
      val build = (0L to 5L).map(u => (u, s"seg$u")).toDF("uid", "seg")
      val got = SaltedJoin.inner(probe, build, "uid", col("id"), buckets = 8)
        .select("id", "seg").collect().map(r => (r.getLong(0), r.getString(1))).toSet
      val plain = probe.join(build, Seq("uid"))
        .select("id", "seg").collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(got == plain, s"seed=$seed")
    }
  }

  test("shingleRows == explode(shingles) incl. short docs (5 random corpora)") {
    import graft.functions.TextFunctions.{shingleRows, shingles}
    val tokenGen = Gen.oneOf("a", "bb", "ccc", "dd d", "", "e")
    for (seed <- 1L to 5L) {
      val docs = Gen.listOfN(40, Gen.chooseNum(0, 12).flatMap(Gen.listOfN(_, tokenGen)))
        .apply(Gen.Parameters.default, Seed(seed)).get
        .zipWithIndex.map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
        .toDF("doc_id", "text")
      for (n <- Seq(2, 3, 8)) {
        val fast = shingleRows(docs, "doc_id", "text", n)
          .collect().map(r => (r.getLong(0), r.getString(1))).toList.sorted
        val ref = docs.select(col("doc_id"),
            explode(shingles(split(col("text"), " "), n)).as("sh"))
          .collect().map(r => (r.getLong(0), r.getString(1))).toList.sorted
        assert(fast == ref, s"seed=$seed n=$n")
      }
    }
  }

  test("StrKey.prefix64 is monotone in UTF-8 byte order; upper64 bounds prefixes (5 seeds)") {
    import graft.functions.StrKey
    def utf8Cmp(a: String, b: String): Int = {
      val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      var i = 0
      while (i < x.length && i < y.length) {
        val d = (x(i) & 0xFF) - (y(i) & 0xFF)
        if (d != 0) return d
        i += 1
      }
      x.length - y.length
    }
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      val alphabet = "abcXYZ019-_ äöμ日" // mixes 1-, 2-, and 3-byte UTF-8
      def randStr(): String =
        Seq.fill(rnd.nextInt(14))(alphabet(rnd.nextInt(alphabet.length)))
          .mkString
      val strs = Seq.fill(400)(randStr())
      // monotone: a <= b (byte order, Spark's) => enc(a) <= enc(b)
      for (a <- strs.take(60); b <- strs.take(60)) {
        if (utf8Cmp(a, b) <= 0)
          assert(StrKey.prefix64(a) <= StrKey.prefix64(b),
            s"monotonicity broken for <$a> vs <$b>")
      }
      // prefix window: s startsWith p => enc(s) in [prefix64(p), upper64(p)]
      for (s <- strs; if s.nonEmpty) {
        val p = s.substring(0, 1 + rnd.nextInt(s.length))
        assert(StrKey.prefix64(p) <= StrKey.prefix64(s) &&
          StrKey.prefix64(s) <= StrKey.upper64(p),
          s"prefix window broken for s=<$s> p=<$p>")
      }
    }
  }
}
