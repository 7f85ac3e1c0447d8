package graft.ext

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.functions._

/** MODEL-BASED property test of the IVM delta algebra: an arbitrary
  * sequence of per-key state transitions (insert / update-in-group /
  * migrate-across-groups / delete / re-insert), rendered as changefeed
  * increments and applied to the view, must serve exactly the direct
  * aggregate of an in-memory Map model — with compactions interleaved
  * at arbitrary points (the fold must be invisible to every later
  * serve). The fixed IvmSpec scenarios pin the named behaviors; this
  * sweeps the interaction space: a group emptied and refilled, a key
  * deleted and re-inserted under a different group, net-zero count
  * deltas carrying nonzero value deltas across a fold boundary. */
object IvmProperties extends Properties("Ivm") {

  private def spark = graft.SparkSpec.session

  private val groups = Seq("A", "B", "C")

  /** One batch: for a random key subset, the key's NEW state — Some
    * (group, value) or None (delete); plus whether to compact after. */
  private val genBatch: Gen[(Map[Long, Option[(String, Long)]], Boolean)] =
    for {
      keys <- Gen.nonEmptyListOf(Gen.choose(1L, 8L)).map(_.toSet)
      states <- Gen.sequence[List[(Long, Option[(String, Long)])],
        (Long, Option[(String, Long)])](keys.toList.map { k =>
          Gen.frequency(
            3 -> (for {
              g <- Gen.oneOf(groups)
              v <- Gen.choose(1L, 100L)
            } yield k -> Option((g, v))),
            1 -> Gen.const(k -> Option.empty[(String, Long)]))
        })
      doCompact <- Gen.prob(0.4)
    } yield (states.toMap, doCompact)

  private val genOps = Gen.choose(1, 5).flatMap(n =>
    Gen.listOfN(n, genBatch))

  // every batch pays a real parquet write; few-but-deep cases
  override def overrideParameters(p: org.scalacheck.Test.Parameters)
      : org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(10)

  property("any change sequence with interleaved folds serves the " +
      "direct aggregate of the model") = forAll(genOps) { ops =>
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ivm-prop")
      .resolve("v").toString
    var model: Map[Long, (String, Long)] =
      Map(1L -> ("A", 10L), 2L -> ("B", 20L), 3L -> ("A", 30L))
    Ivm.init(model.values.toSeq.toDF("status", "cents"), dir)
    var run = 0L
    ops.foreach { case (batch, doCompact) =>
      // render the transitions that actually change state as one
      // changefeed increment (old_row from the model, new_row the
      // target state) — the shape MergeTable.changes emits
      val delta = batch.filter { case (k, nv) => model.get(k) != nv }
      if (delta.nonEmpty) {
        run += 1
        val rows = delta.toSeq.map { case (k, nv) =>
          val ov = model.get(k)
          (k, ov.map(_._1).orNull,
            ov.map(o => java.lang.Long.valueOf(o._2)).orNull,
            nv.map(_._1).orNull,
            nv.map(n => java.lang.Long.valueOf(n._2)).orNull)
        }
        val cf = rows.toDF("key", "os", "oc", "ns", "nc")
          .select(col("key"),
            when(col("os").isNotNull, struct(col("os").as("status"),
              col("oc").as("cents"))).as("old_row"),
            when(col("ns").isNotNull, struct(col("ns").as("status"),
              col("nc").as("cents"))).as("new_row"))
        Ivm.applyChanges(cf, dir, run)
        model = delta.foldLeft(model) {
          case (m, (k, Some(nv))) => m + (k -> nv)
          case (m, (k, None)) => m - k
        }
      }
      if (doCompact) Ivm.compact(s, dir): Unit
    }
    val served = Ivm.serve(s, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val expected = model.values.groupBy(_._1).map { case (g, vs) =>
      (g, vs.size.toLong, vs.map(_._2).sum)
    }.toSet
    served == expected
  }

  property("the EXTREMA channel serves the model's min/max through " +
      "any change sequence, with folds (resolving and not) interleaved") =
    forAll(genOps) { ops =>
      val s = spark
      import s.implicits._
      val G = Seq("status"); val V = Seq("cents"); val E = Seq("cents")
      val dir = java.nio.file.Files.createTempDirectory("ivm-prop-x")
        .resolve("v").toString
      var model: Map[Long, (String, Long)] =
        Map(1L -> ("A", 10L), 2L -> ("B", 20L), 3L -> ("A", 30L))
      def baseDf = model.values.toSeq.toDF("status", "cents")
      Ivm.init(baseDf, dir, G, V, E)
      var run = 0L
      var flip = false // alternate resolving / non-resolving folds
      ops.foreach { case (batch, doCompact) =>
        val delta = batch.filter { case (k, nv) => model.get(k) != nv }
        if (delta.nonEmpty) {
          run += 1
          val rows = delta.toSeq.map { case (k, nv) =>
            val ov = model.get(k)
            (k, ov.map(_._1).orNull,
              ov.map(o => java.lang.Long.valueOf(o._2)).orNull,
              nv.map(_._1).orNull,
              nv.map(n => java.lang.Long.valueOf(n._2)).orNull)
          }
          val cf = rows.toDF("key", "os", "oc", "ns", "nc")
            .select(col("key"),
              when(col("os").isNotNull, struct(col("os").as("status"),
                col("oc").as("cents"))).as("old_row"),
              when(col("ns").isNotNull, struct(col("ns").as("status"),
                col("nc").as("cents"))).as("new_row"))
          Ivm.applyChanges(cf, dir, run, G, V, E)
          model = delta.foldLeft(model) {
            case (m, (k, Some(nv))) => m + (k -> nv)
            case (m, (k, None)) => m - k
          }
        }
        if (doCompact) {
          // a resolving fold must see the snapshot at the settled
          // frontier = the current model; a non-resolving fold just
          // carries the dirt
          Ivm.compact(s, dir, None, G,
            if (flip) Some(baseDf) else None): Unit
          flip = !flip
        }
      }
      val served = Ivm.serve(s, dir, G, V, E, Some(baseDf)).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSet
      val expected = model.values.groupBy(_._1).map { case (g, vs) =>
        (g, vs.size.toLong, vs.map(_._2).sum,
          vs.map(_._2).min, vs.map(_._2).max)
      }.toSet
      served == expected
    }
}
