package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.core.EngineSession
import graft.operators.TxTable

/** Model-based property test for the ACID table: a seeded random sequence
  * of merge / CoW-merge / compact operations applied to a TxTable must
  * equal the same sequence applied to a plain in-memory Map — at EVERY
  * intermediate version (time travel replays the whole history), for both
  * merge implementations, under random batch sizes and key overlap. */
class TxTablePropertySpec extends AnyFunSuite {

  lazy val spark: SparkSession = EngineSession.getOrCreate("graft-test")

  private sealed trait Op
  private case class Merge(batch: Map[Long, String], cow: Boolean) extends Op
  private case object Compact extends Op

  private def genOps(seed: Long, n: Int): List[Op] = {
    val batch = for {
      size <- Gen.chooseNum(1, 8)
      keys <- Gen.listOfN(size, Gen.chooseNum(0L, 30L))
      tagv <- Gen.chooseNum(0, 1000000)
    } yield keys.distinct.map(k => k -> s"v$tagv-$k").toMap
    val op: Gen[Op] = Gen.frequency(
      (8, for { b <- batch; c <- Gen.oneOf(true, false) } yield Merge(b, c)),
      (1, Gen.const(Compact)))
    Gen.listOfN(n, op).apply(Gen.Parameters.default, Seed(seed)).get
  }

  test("random op sequences: table == in-memory model at every version") {
    import spark.implicits._
    for (seed <- 1L to 3L) {
      val root = Files.createTempDirectory(s"graft_txprop_$seed").toString
      val init = Map(0L -> "init0", 1L -> "init1")
      TxTable.create(init.toSeq.toDF("k", "v"), root, statsKey = Some("k"))
      // the model's state after each committed version
      val states = scala.collection.mutable.ArrayBuffer[Map[Long, String]](init)
      var model = init
      genOps(seed, 14).foreach {
        case Merge(batch, cow) =>
          val df = batch.toSeq.toDF("k", "v")
          if (cow) TxTable.mergeCow(spark, root, df, "k")
          else TxTable.merge(spark, root, df, Seq("k"))
          model = model ++ batch
          states += model
        case Compact =>
          TxTable.compact(spark, root, targetFiles = 1)
          states += model // compaction must not change content
      }
      val snap = TxTable.snapshot(root)
      assert(snap.version == states.length - 1,
        s"seed=$seed: ${states.length - 1} ops committed, table at v${snap.version}")
      // every version (incl. across the v10 checkpoint) replays the model
      for (v <- states.indices) {
        val got = TxTable.read(spark, root, v)
          .as[(Long, String)].collect().toMap
        assert(got == states(v), s"seed=$seed version=$v diverged")
      }
      // log stats stay complete through arbitrary op interleavings
      assert(snap.fileStats.keySet == snap.files.toSet, s"seed=$seed stats")
    }
  }
}
