package graft.crawl

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.util.sketch.BloomFilter

/** Codegen probe of a PARTITIONED Bloom filter: `probe(bucket, hash)`
  * looks up exactly one per-bucket filter, whose bytes travel as a
  * BROADCAST (one torrent copy per executor), never as plan literals —
  * multi-MB literals would bloat every retained plan/plan-string and
  * ship with every task binary. Whole-stage codegen emits a single
  * virtual call per row; no Scala UDF boxing.
  */
case class BloomProbe(
    bucket: Expression,
    hashExpr: Expression,
    filtersBc: Broadcast[Array[Array[Byte]]]
) extends Expression {

  override def children: Seq[Expression] = Seq(bucket, hashExpr)
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false

  @transient private lazy val filters: Array[BloomFilter] =
    filtersBc.value.map(b =>
      if (b == null) null else BloomFilter.readFrom(new ByteArrayInputStream(b)))

  /** Hot-path entry used by both interpreted eval and generated code. */
  def probe(b: Int, h: Long): Boolean = {
    val f = filters(b)
    f != null && f.mightContainLong(h)
  }

  override def eval(input: InternalRow): Any =
    probe(bucket.eval(input).asInstanceOf[Int], hashExpr.eval(input).asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomProbe", this, classOf[BloomProbe].getName)
    val b = bucket.genCode(ctx)
    val h = hashExpr.genCode(ctx)
    ev.copy(
      code = code"""
        ${b.code}
        ${h.code}
        final boolean ${ev.value} = $ref.probe(${b.value}, ${h.value});""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(bucket = newChildren(0), hashExpr = newChildren(1))

  override def toString: String = s"bloom_probe($bucket, $hashExpr, bc=${filtersBc.id})"
}

/** Partitioned URL-seen Bloom filter (north rule; SURVEY.md §2.4 A4):
  * one fixed-size filter per seen-table bucket, so probe and state are
  * partitioned by the same `pmod(hash(kind,url,depth), B)` the storage
  * layer buckets on.
  *
  * - BUILD is distributed: one `groupBy(bucket)` aggregation using
  *   Spark's native `BloomFilterAggregate` (map-side partial filters
  *   merged per bucket), collecting only B fixed-size bitsets per wave.
  *   Filters are fixed-size so per-wave partials merge losslessly
  *   (`mergeInPlace` requires identical bit counts); saturation only
  *   degrades the pre-filter's selectivity, never correctness — the
  *   exact anti-join stays authoritative.
  * - PROBE is codegen: the [[BloomProbe]] expression routed by bucket
  *   id — exactly ONE bloom lookup per row, O(1) in the number of
  *   waves (the round-1 design probed a per-wave filter LIST from a
  *   Scala UDF: O(#waves) per row and interpreter-bound). Filter bytes
  *   ship once per wave as a broadcast; retired broadcasts are cleaned
  *   by Spark's ContextCleaner once their plans are unpersisted.
  *
  * At the 10^10 design point the per-bucket state is what an executor
  * holds resident; in this single-JVM sandbox the merged filters live
  * with the driver loop.
  */
class PartitionedBloom(val buckets: Int, expectedItems: Long, fpp: Double) {
  // SIZING IS ADAPTIVE (round-3, VERDICT r2 missing #3): fixed-size
  // filters sized for `expectedItems` silently saturate at 10^10 seen
  // rows — still correct (the exact anti-join is authoritative) but the
  // pre-filter's selectivity win vanishes. The crawler tracks rows
  // added; when an add would cross capacity it calls [[growTo]] and
  // re-adds the FULL seen set at the larger size — one distributed
  // aggregation, the same job shape as the per-wave merge.
  // @volatile: the metrics tail of wave k reads capacity/itemsAdded
  // while wave k+1's escaped bloom merge may be mutating them on
  // another thread — volatile gives the reads a happens-before edge
  // (and atomic 64-bit loads); attribution can still be one wave off
  // by design, which the run-log comment documents.
  @volatile private var perBucketItems = math.max(expectedItems / buckets, 1024L)
  @volatile private var numBits = BloomFilter.create(perBucketItems, fpp).bitSize()
  private val filters: Array[BloomFilter] = new Array[BloomFilter](buckets)
  @volatile private var added = 0L

  def isEmpty: Boolean = filters.forall(_ == null)

  /** Total item capacity across buckets at the current sizing. */
  def capacity: Long = perBucketItems * buckets

  /** Rows merged since construction / the last [[growTo]]. */
  def itemsAdded: Long = added

  /** Would merging `incoming` more rows overfill the current filters
    * (pushing the realized fpp past the design point)? */
  def wouldSaturate(incoming: Long): Boolean = added + incoming > capacity

  /** Re-size for at least 2x `targetItems` and DROP all filter state —
    * the caller must re-add the full seen set (filters of different bit
    * counts cannot merge). Never shrinks. */
  def growTo(targetItems: Long): Unit = {
    while (capacity < 2 * targetItems) perBucketItems *= 2
    numBits = BloomFilter.create(perBucketItems, fpp).bitSize()
    java.util.Arrays.fill(filters.asInstanceOf[Array[AnyRef]], null)
    added = 0L
  }

  /** Bucket id of a row — MUST match both the storage bucketing
    * (Spark bucketBy hashes with Murmur3, same as `hash()`) and the
    * `repartition(B, cols)` task routing. */
  def bucketCol(kind: Column, url: Column, depth: Column): Column =
    pmod(hash(kind, url, depth), lit(buckets))

  private def bloomAggCol(hashCol: Column): Column =
    GraftSqlBridge.column(new BloomFilterAggregate(
      GraftSqlBridge.expression(hashCol),
      Literal(perBucketItems), Literal(numBits)).toAggregateExpression())

  /** Spark's BloomFilterAggregate SILENTLY clamps its requested
    * estimatedNumItems/numBits with Math.min against these session
    * confs (verified in the 4.1.2 bytecode; defaults 4M items / 64M
    * bits). Past ~7M items per bucket the adaptive growTo sizing would
    * otherwise become a no-op — capacity accounting doubling on a
    * fiction while every built filter stays 8 MB and the realized fpp
    * climbs toward 1 at the 10^10 design point. Raise the caps to the
    * current sizing before every build (BloomSaturationSpec asserts
    * the realized bitSize tracks the request past a lowered cap). */
  private def ensureAggLimits(spark: SparkSession): Unit = {
    def raise(key: String, atLeast: Long): Unit =
      if (spark.conf.get(key).toLong < atLeast) spark.conf.set(key, atLeast.toString)
    raise("spark.sql.optimizer.runtime.bloomFilter.maxNumItems", perBucketItems)
    raise("spark.sql.optimizer.runtime.bloomFilter.maxNumBits", numBits)
  }

  /** Realized bit size of one bucket's filter (test observability). */
  private[crawl] def realizedBitSize(b: Int): Option[Long] =
    Option(filters(b)).map(_.bitSize())

  /** Merge `df`'s hash values into the per-bucket filters. `rowCount`
    * feeds the saturation accounting (callers already know it from the
    * wave's novel count / the seen snapshot footers — no extra job). */
  def add(df: DataFrame, bucketCol: Column, hashCol: Column, rowCount: Long): Unit = {
    ensureAggLimits(df.sparkSession)
    val rows = df.groupBy(bucketCol.as("b")).agg(bloomAggCol(hashCol).as("bf")).collect()
    rows.foreach { r =>
      val b = r.getInt(0)
      val bf = BloomFilter.readFrom(new ByteArrayInputStream(r.getAs[Array[Byte]](1)))
      if (filters(b) == null) filters(b) = bf else filters(b).mergeInPlace(bf)
    }
    added += rowCount
  }

  /** The probe column for this wave: broadcasts the current filter
    * bytes and wires them into a [[BloomProbe]] expression. */
  def probeCol(spark: SparkSession, bucketCol: Column, hashCol: Column): Column = {
    val ser: Array[Array[Byte]] = filters.map { f =>
      if (f == null) null
      else {
        val baos = new ByteArrayOutputStream()
        f.writeTo(baos)
        baos.toByteArray
      }
    }
    val bc = spark.sparkContext.broadcast(ser)
    GraftSqlBridge.column(BloomProbe(
      GraftSqlBridge.expression(bucketCol), GraftSqlBridge.expression(hashCol), bc))
  }
}
