package graft

import java.util.SplittableRandom

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deterministic synthetic-benchmark-data generator: writes the same
  * ten-table star schema as the driver's testdata (TESTDATA.md) at an
  * arbitrary scale multiple, so per-query scaling exponents can be
  * measured beyond the largest driver-provided SF (the round-7 sf1
  * scale-proof runs on `mult=10` ≈ 10x sf0.1 = 6M lineitem rows).
  *
  * Everything is a PURE FUNCTION of (table, row id) via a per-row
  * [[SplittableRandom]] — no global RNG sequence — so generation is
  * embarrassingly parallel, reproducible at any partitioning, and any
  * row can be re-derived in isolation (the documents near-dup mutator
  * re-derives its target doc's base words this way, and lineitem
  * re-derives its order's date without a join).
  *
  * Distributions are calibrated against the driver's sf0.1 set
  * (measured 2026-08, see plans/PLANS.md r7 table): lineitem/events
  * pick their foreign keys uniformly at random (driver sf0.1 shows
  * distinct l_orderkey = 147,236 = 150k(1-e^-4), the signature of N
  * uniform draws, not sequential assignment); documents are 10-100
  * words over the same 31-word vocabulary with ~5% near-duplicate
  * mutations (driver: 256 j>=0.7 pairs / 5k docs) and ~0.16% exact
  * dups; embeddings are L2-normalized 64-dim gaussians (driver
  * cos-to-label-centroid ~= 0.06, i.e. no real cluster structure);
  * `events.ts` is written as LONG nanos so [[Tables.events]]'s
  * `ts div 1000` path treats generated and driver parquet alike.
  *
  * Run: `sbt "runMain graft.GenSf <outDir> <mult>"` (mult=1 mirrors
  * sf0.1, mult=10 is sf1). Parquet lands at `<outDir>/<table>.parquet`.
  */
object GenSf {
  val Seed = 42L

  /** Per-(table,id) RNG: stream name hashed into the high bits, id in
    * the low — SplittableRandom's gamma mixing decorrelates neighbors. */
  def rng(stream: String, id: Long): SplittableRandom =
    new SplittableRandom(Seed ^ (stream.hashCode.toLong << 32) ^ (id * 0x9E3779B97F4A7C15L))

  private def round2(v: Double): Double = math.rint(v * 100) / 100

  private def ldt(epochMs: Long): java.time.LocalDateTime =
    java.time.LocalDateTime.ofEpochSecond(epochMs / 1000, 0, java.time.ZoneOffset.UTC)

  // ---- fixed dimensions (TPC-H keeps these constant across SFs) ----
  private val regions = Seq((0, "AFRICA"), (1, "AMERICA"), (2, "ASIA"),
    (3, "EUROPE"), (4, "MIDDLE EAST"))
  private val segments = Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")
  private val priorities = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
  private val partTypes = Seq("STANDARD", "SMALL", "MEDIUM", "LARGE", "ECONOMY", "PROMO")
  private val partAdjs = Seq("large", "hot", "blue", "red", "green", "small", "dim", "plated")
  private val partNouns = Seq("ring", "bolt", "washer", "spring", "gear", "rod", "cap", "plate")
  private val eventTypes = Seq("view", "click", "purchase", "signup", "error")
  private val langs = Seq("en", "zh", "es", "fr", "de")

  /** The 31-word vocabulary observed across the driver documents set. */
  val DocVocab: IndexedSeq[String] = IndexedSeq(
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window")

  private val EpochMs1995 = java.time.LocalDate.of(1995, 1, 1)
    .atStartOfDay(java.time.ZoneOffset.UTC).toInstant.toEpochMilli
  private val OrderDateDays = 2404 // 1995-01-01 .. 2001-08-01
  private val EventsEpochNanos = java.time.LocalDate.of(2024, 1, 1)
    .atStartOfDay(java.time.ZoneOffset.UTC).toInstant.getEpochSecond * 1000000000L
  private val EventsSpanNanos = 30L * 86400 * 1000000000L

  /** Order date as a pure function of the order key, so lineitem can
    * derive its parent's date without touching the orders table. */
  def orderDateMs(orderKey: Long): Long =
    EpochMs1995 + rng("orderdate", orderKey).nextInt(OrderDateDays).toLong * 86400000L

  /** Base word sequence of a document, independent of dup mutation. */
  def docBaseWords(id: Long): IndexedSeq[String] = {
    val r = rng("docw", id)
    val n = 10 + r.nextInt(91)
    IndexedSeq.fill(n)(DocVocab(r.nextInt(DocVocab.length)))
  }

  /** Final document text: ~0.16% exact dup of an earlier doc, ~5%
    * near-dup (5% of words re-rolled => 3-gram jaccard ~0.75, matching
    * the driver's 256-pairs-at-j>=0.7-per-5k-docs rate), else base. */
  def docText(id: Long): String = {
    val r = rng("docdup", id)
    val roll = r.nextDouble()
    if (id >= 50 && roll < 0.0016) {
      // the target's FINAL text, not its base words: a target that
      // itself took a mutation branch must still yield a true exact
      // duplicate. Recursion terminates — nextLong(id) < id, and dup
      // chains are geometric(0.06) so depth stays tiny.
      docText(r.nextLong(id))
    } else if (id >= 50 && roll < 0.06) {
      val target = docBaseWords(r.nextLong(id)).toArray
      val nMut = math.max(1, math.rint(target.length * 0.04).toInt)
      var k = 0
      while (k < nMut) {
        target(r.nextInt(target.length)) = DocVocab(r.nextInt(DocVocab.length))
        k += 1
      }
      target.mkString(" ")
    } else docBaseWords(id).mkString(" ")
  }

  // case classes give the exact driver column names + types via Encoders
  // (top-level visibility: private classes break janino codegen for the
  // serializer and everything falls back to interpreted).
  // LocalDateTime fields land as TimestampNTZType, matching the driver.
  case class Customer(c_custkey: Long, c_name: String, c_nationkey: Int,
                              c_acctbal: Double, c_mktsegment: String)
  case class Supplier(s_suppkey: Long, s_name: String, s_nationkey: Int,
                              s_acctbal: Double)
  case class Part(p_partkey: Long, p_name: String, p_brand: String,
                          p_type: String, p_size: Int, p_retailprice: Double)
  case class Order(o_orderkey: Long, o_custkey: Long, o_orderstatus: String,
                           o_totalprice: Double, o_orderdate: java.time.LocalDateTime,
                           o_orderpriority: String)
  case class Lineitem(l_orderkey: Long, l_partkey: Long, l_suppkey: Long,
                              l_linenumber: Int, l_quantity: Double,
                              l_extendedprice: Double, l_discount: Double, l_tax: Double,
                              l_returnflag: String, l_linestatus: String,
                              l_shipdate: java.time.LocalDateTime)
  case class Event(event_id: Long, ts: Long, user_id: Long,
                           event_type: String, value: Double, props: String)
  case class Document(doc_id: Long, text: String, lang: String,
                              source: String, n_chars: Long)
  case class Embedding(vec_id: Long, embedding: Array[Float], label: Int)

  /** Generate the full schema at `mult` x sf0.1 into `outDir`. */
  /** `only`: restrict generation to these tables (empty = all). The
    * document/embedding-family scale probes (m1000 decade runs) need
    * 5M docs but NOT the 600M-row lineitem that a full mult=1000 set
    * would drag along (~20 GB parquet + most of the generation time) —
    * every table is an independent pure function of (name, id), so a
    * subset is exactly the rows the full run would have written. */
  def generate(spark: SparkSession, outDir: String, mult: Double,
               only: Set[String] = Set.empty): Unit = {
    import spark.implicits._
    val nCust = (15000 * mult).toLong
    val nSupp = (1000 * mult).toLong
    val nPart = (20000 * mult).toLong
    val nOrders = (150000 * mult).toLong
    val nLineitem = (600000 * mult).toLong
    val nEvents = (100000 * mult).toLong
    val nUsers = (1500 * mult).toLong
    val nDocs = (5000 * mult).toLong
    val nEmb = (2000 * mult).toLong
    // partition count scales with volume so one task's rows stay
    // bounded regardless of mult (the 100 TB shape: tasks, not rows,
    // are the unit of parallelism)
    def parts(n: Long): Int = math.max(4, math.min(256, (n / 200000L).toInt + 1))
    def ids(n: Long): DataFrame = spark.range(0, n, 1, parts(n)).toDF("id")

    def write(df: DataFrame, name: String): Unit =
      if (only.isEmpty || only(name))
        df.write.mode("overwrite").parquet(s"$outDir/$name.parquet")

    write(regions.toDF("r_regionkey", "r_name"), "region")
    write((0 until 25).map(i => (i, s"NATION_$i", i % 5)).toDF("n_nationkey", "n_name", "n_regionkey"),
      "nation")

    write(ids(nCust).as[Long].map { i =>
      val r = rng("customer", i)
      Customer(i, f"Customer#$i%09d", r.nextInt(25),
        round2(-1000 + r.nextDouble() * 11000), segments(r.nextInt(5)))
    }.toDF(), "customer")

    write(ids(nSupp).as[Long].map { i =>
      val r = rng("supplier", i)
      Supplier(i, f"Supplier#$i%09d", r.nextInt(25), round2(r.nextDouble() * 9999))
    }.toDF(), "supplier")

    write(ids(nPart).as[Long].map { i =>
      val r = rng("part", i)
      Part(i, partAdjs(r.nextInt(partAdjs.length)) + " " + partNouns(r.nextInt(partNouns.length)),
        "Brand#" + (1 + r.nextInt(25)), partTypes(r.nextInt(partTypes.length)),
        1 + r.nextInt(50), 900.0 + (i % 1000) * 0.1)
    }.toDF(), "part")

    write(ids(nOrders).as[Long].map { i =>
      val r = rng("orders", i)
      Order(i, r.nextLong(nCust), "OPF".charAt(r.nextInt(3)).toString,
        round2(1000 + r.nextDouble() * 499000),
        ldt(orderDateMs(i)), priorities(r.nextInt(5)))
    }.toDF(), "orders")

    write(ids(nLineitem).as[Long].map { i =>
      val r = rng("lineitem", i)
      val orderKey = r.nextLong(nOrders)
      val qty = (1 + r.nextInt(50)).toDouble
      // driver sf0.1: shipdate is INDEPENDENT of the parent order's date
      // (48% of lineitems "ship" on/before their orderdate) over
      // orderdate-range + ~94 days, and extendedprice is an independent
      // uniform(900, 105000) (measured avg 52952 = the uniform mean),
      // not qty-linked — match both so join/filter selectivities agree
      val ship = EpochMs1995 + (1 + r.nextInt(OrderDateDays + 94)).toLong * 86400000L
      Lineitem(orderKey, r.nextLong(nPart), r.nextLong(nSupp), 1 + r.nextInt(7),
        qty, round2(900 + r.nextDouble() * 104100),
        r.nextInt(11) / 100.0, r.nextInt(9) / 100.0,
        "ANR".charAt(r.nextInt(3)).toString, "FO".charAt(r.nextInt(2)).toString,
        ldt(ship))
    }.toDF(), "lineitem")
    // (orderDateMs stays exported for callers that DO want correlated
    // dates, e.g. as-of-join style test fixtures)

    write(ids(nEvents).as[Long].map { i =>
      val r = rng("events", i)
      Event(i, EventsEpochNanos + r.nextLong(EventsSpanNanos), r.nextLong(nUsers),
        eventTypes(r.nextInt(5)), round2(r.nextDouble() * 560),
        s"""{"k": ${r.nextInt(100)}}""")
    }.toDF(), "events")

    write(ids(nDocs).as[Long].map { i =>
      val r = rng("doc", i)
      val text = docText(i)
      // driver lang mix: en 41%, the rest ~15% each
      val d = r.nextDouble()
      val lang = if (d < 0.41) "en" else langs(1 + math.min(3, ((d - 0.41) / 0.1475).toInt))
      Document(i, text, lang, "src" + (i % 20), text.length.toLong)
    }.toDF(), "documents")

    write(ids(nEmb).as[Long].map { i =>
      val r = rng("emb", i)
      val v = Array.fill(64)(r.nextGaussian().toFloat)
      val norm = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
      Embedding(i, v.map(_ / norm), r.nextInt(10))
    }.toDF(), "embeddings")
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: GenSf <outDir> <mult> [table,table,...]")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val only = if (args.length > 2)
      args(2).split(",").map(_.trim).filter(_.nonEmpty).toSet else Set.empty[String]
    generate(spark, args(0), args(1).toDouble, only)
    spark.stop()
  }
}
