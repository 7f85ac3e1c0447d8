package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation utilities (SURVEY.md "optimize for scale"): two-stage
  * salted aggregation — when one group key dominates (a hot returnflag, a
  * celebrity user), a plain groupBy funnels the hot key into a single
  * reducer. Salting splits each key into `salts` sub-keys for the partial
  * stage, then combines partials in a second (tiny) aggregation. AQE's
  * skew-join handling covers joins; this covers aggregations whose
  * partial/final split Spark can't rebalance by itself when the combiner
  * state per key is large.
  */
object Skew {

  /** Two-stage salted sum/count aggregation:
    * stage 1 groups by (key, hash(saltCol) % salts) — hot keys fan out
    * across `salts` reducers; stage 2 groups the ≤ |keys|·salts partials
    * by key alone. Result is exactly groupBy(key).agg(sum, count). */
  def saltedSumCount(df: DataFrame, key: Column, saltSource: Column,
      value: Column, salts: Int): DataFrame =
    df.groupBy(key.as("k"), (abs(hash(saltSource)) % salts).as("salt"))
      .agg(sum(value).as("psum"), count("*").as("pcnt"))
      .groupBy("k")
      .agg(sum("psum").as("total"), sum("pcnt").as("cnt"))

  /** Salted shuffle JOIN — the join-side twin of [[saltedSumCount]] for
    * when AQE's skew-split can't help (its partition splitting handles
    * size skew of the PROBE side, but a hot key whose matching build
    * rows must co-locate still funnels into one task when the build side
    * can't broadcast): every probe row takes a salt from a per-row
    * source (so a hot key's rows spread across `salts` shuffle
    * partitions), the build side replicates `salts` ways, and the join
    * keys become (key, salt). Result is EXACTLY the plain equi-join —
    * replication costs `salts`× the (smaller) build side, bounded and
    * chosen, instead of an unbounded hot-task straggler. */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
      saltSource: Column, salts: Int): DataFrame = {
    val saltedProbe = probe
      .withColumn("__salt", (abs(hash(saltSource)) % salts).cast("int"))
    val replicatedBuild = build
      .withColumn("__salt",
        explode(array((0 until salts).map(lit(_)): _*)))
    saltedProbe.join(replicatedBuild, Seq(key, "__salt")).drop("__salt")
  }

  /** HYBRID hot-key salted join — the production refinement of
    * [[saltedJoin]], whose whole-build replication is `salts`× the
    * ENTIRE build side: at 100 TB with a large build table that is a new
    * bottleneck, not a mitigation. Here the probe side's key histogram
    * (one map-side-combinable count aggregation) decides which keys are
    * actually hot (count > `hotThreshold`); ONLY those go through the
    * salted path — replicating just the hot slice of the build side,
    * ≤ |probe|/hotThreshold keys by construction, broadcast-small — and
    * every other row takes the plain equi-join Spark would have planned
    * anyway. Build replication becomes `salts` × (hot-key build rows)
    * instead of `salts` × |build|; the result is EXACTLY the plain join
    * (the two probe slices partition the probe rows, and each joins the
    * full set of its keys' build rows). */
  def hybridSaltedJoin(probe: DataFrame, build: DataFrame, key: String,
      saltSource: Column, salts: Int, hotThreshold: Long): DataFrame = {
    val hot = probe.groupBy(col(key)).agg(count(lit(1)).as("__n"))
      .filter(col("__n") > hotThreshold)
      .select(col(key))
    // the hot list is bounded at |probe|/hotThreshold keys — broadcast it
    // to split both sides without an extra shuffle
    val hotProbe = probe.join(broadcast(hot), Seq(key), "left_semi")
    val coldProbe = probe.join(broadcast(hot), Seq(key), "left_anti")
    val hotBuild = build.join(broadcast(hot), Seq(key), "left_semi")
    saltedJoin(hotProbe, hotBuild, key, saltSource, salts)
      .unionByName(coldProbe.join(build, Seq(key)))
  }
}
