package graft.ext

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.functions._

/** MODEL-BASED property test of the snapshot table: an arbitrary
  * sequence of upsert / delete / rebucket / optimize operations
  * applied both to a MergeTable and to an in-memory Map model must
  * agree on the FINAL state AND on every intermediate version via
  * time travel — the history is the specification. The fixed
  * MergeTableSpec scenarios pin the named behaviors (byte-identical
  * untouched files, conflicts, vacuum); this property sweeps the
  * interaction space those scenarios can't enumerate: a key inserted,
  * deleted, and re-inserted with a new value; a batch that only
  * touches absent keys; empty-bucket transitions; latest-wins across
  * arbitrarily many versions; an upsert landing AFTER a mid-history
  * bucket-width migration (the batch must hash at the new width);
  * time travel crossing migration and optimize boundaries. Kept to
  * few-but-meaty cases because every operation pays real file I/O. */
object MergeTableProperties extends Properties("MergeTable") {

  private def spark = graft.SparkSpec.session

  private sealed trait Op
  private final case class Upsert(rows: Map[Long, String]) extends Op
  private final case class Delete(keys: Set[Long]) extends Op
  private final case class Rebucket(hex: Int) extends Op
  private case object Optimize extends Op

  // small key domain on purpose: collisions (update/delete/re-insert
  // of the SAME key across batches) are the interesting interactions
  // upserts may touch key 1; deletes never do: a table whose every
  // row died has an EMPTY manifest and no schema to read — a
  // documented edge the sweep must not trip on incidentally
  private val genUpsert: Gen[Op] = for {
    keys <- Gen.nonEmptyListOf(Gen.choose(1L, 12L)).map(_.toSet)
    tag <- Gen.choose(0, 1000)
  } yield Upsert(keys.map(k => k -> s"v$tag-$k").toMap)
  private val genOp: Gen[Op] = Gen.frequency(
    4 -> genUpsert,
    2 -> Gen.nonEmptyListOf(Gen.choose(2L, 12L)).map(ks =>
      Delete(ks.toSet): Op),
    1 -> Gen.oneOf(1, 2, 3).map(h => Rebucket(h): Op),
    1 -> Gen.const(Optimize: Op))

  private val genOps = Gen.choose(1, 4).flatMap(n => Gen.listOfN(n, genOp))

  // every case pays real file I/O (one epoch write per op), so the
  // sweep runs few-but-deep cases rather than scalacheck's default 100
  override def overrideParameters(p: org.scalacheck.Test.Parameters)
      : org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(12)

  property("any op sequence matches the Map model at every version") =
    forAll(genOps) { ops =>
      val s = spark
      import s.implicits._
      val dir = java.nio.file.Files.createTempDirectory("cow-prop")
        .resolve("t").toString
      val init = Map(1L -> "init1", 5L -> "init5", 9L -> "init9")
      MergeTable.create(init.toSeq.toDF("key", "value"), dir, "key")
      // replay the ops against both implementations, tracking history
      var model = init
      val history = scala.collection.mutable.ArrayBuffer(model)
      ops.foreach { op =>
        op match {
          case Upsert(up) =>
            MergeTable.upsert(s, dir, up.toSeq.toDF("key", "value"))
            model = model ++ up
          case Delete(del) =>
            MergeTable.deleteKeys(s, dir, del.toSeq.toDF("key"))
            model = model -- del
          case Rebucket(hex) =>
            MergeTable.rebucket(s, dir, hex)
          case Optimize =>
            MergeTable.optimize(s, dir, "value")
        }
        history += model
      }
      def stateAt(v: Long): Map[Long, String] =
        MergeTable.readTable(s, dir, Some(v))
          .select("key", "value").collect()
          .map(r => r.getLong(0) -> r.getString(1)).toMap
      val versions = MergeTable.versions(s, dir)
      // bucket width at any version must be the last migration at or
      // before it (width is a snapshot property)
      val widths = versions.map(v => MergeTable.bucketWidth(s, dir, Some(v)))
      val expectedWidths = ops.scanLeft(MergeTable.HEX_DIGITS) {
        case (_, Rebucket(h)) => h
        case (w, _) => w
      }
      // a layout-only commit (optimize OR rebucket — even one that
      // lands mid-history after deletes emptied buckets) must diff to
      // ZERO changed buckets: optimize by per-bucket fingerprint
      // identity, rebucket by the width-invariant table-level total
      val layoutOnlyFree = versions.zip(versions.tail).zip(ops)
        .forall { case ((a, b), op) => op match {
          case Rebucket(_) | Optimize =>
            MergeTable.changedBuckets(s, dir, a, b).isEmpty
          case _ => true
        } }
      versions.size == history.size &&
        widths == expectedWidths &&
        layoutOnlyFree &&
        versions.zip(history).forall { case (v, m) => stateAt(v) == m }
    }
}
