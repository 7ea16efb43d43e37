package graft.sources

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 reader for the reference's REST posts API
  * (`src/ingestion.py:56-107`) — the "at scale" design SURVEY.md §2.1/S1
  * calls for: one input partition per API page, so a 1000-executor
  * cluster fetches pages concurrently instead of the reference's serial
  * driver loop with a 1 s/request rate limit.
  *
  * [[PostsTransport.fetchPage]] is the page boundary: in this zero-egress
  * container the default transport synthesizes the deterministic
  * jsonplaceholder-shaped rows (10 posts per user, sequential ids); a
  * production build swaps in the HTTP GET (`{base}/posts?_page=p&_limit=n`)
  * via the `transport` option. The reference's resilience policy
  * (`src/utils.py:138-149`, `src/ingestion.py:40-53`) wraps EVERY
  * transport in the partition reader itself, so retries stay page-local
  * (an executor retries only its own page, not the whole scan) and
  * pacing is per executor:
  *   - `maxRetries` (default 3 = the reference's 3 attempts)
  *   - `backoffMs`  (default 5000; doubles per retry like `delay *= 2`)
  *   - `rateLimitPerSec` (default 0 = unpaced; HTTP deployments set the
  *     reference's 1/sec — per executor, so cluster rate = N× that)
  *
  * Usage: `spark.read.format("graft.sources.PostsDataSource")
  *   .option("limit", "500").option("pageSize", "100").load()`
  * Implements limit pushdown: `.limit(n)` trims the page plan itself.
  */
class PostsDataSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PostsDataSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new PostsTable(new CaseInsensitiveStringMap(properties))
}

object PostsDataSource {
  val Schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("userId", LongType, nullable = false),
    StructField("title", StringType, nullable = false),
    StructField("body", StringType, nullable = false)))

  final val Topics = Seq(
    "phone cases", "computer parts", "music apps", "watch bands",
    "tablet stands", "game reviews", "book clubs", "garden tools",
    "desk lamps")
}

/** Page transport boundary — what a production build replaces with the
  * HTTP GET. Selected per-scan via the `transport` option; the retry /
  * backoff / rate-limit policy wraps WHATEVER transport is installed, so
  * resilience is testable without a network (`utils.py:138-149` policy,
  * `ingestion.py:44-53` call site). */
trait PostsTransport extends Serializable {
  @throws[Exception]
  def fetchPage(page: Int, pageSize: Int, limit: Int): Seq[(Long, Long, String, String)]
}

/** Deterministic page fetch (the default transport). */
object PostsFetcher extends PostsTransport {
  def fetchPage(page: Int, pageSize: Int, limit: Int): Seq[(Long, Long, String, String)] = {
    val from = page.toLong * pageSize + 1
    val to = math.min(from + pageSize - 1, limit.toLong)
    (from to to).map { id =>
      val userId = (id - 1) / 10 + 1 // jsonplaceholder: 10 posts per user
      val topic = PostsDataSource.Topics(((id - 1) % PostsDataSource.Topics.length).toInt)
      (id, userId, s"post $id about $topic", s"body of post $id")
    }
  }
}

/** Transport registry: the `transport` scan option names an entry here
  * (tests register failure-injecting doubles), or — when the name
  * contains a dot — a `PostsTransport` class instantiated reflectively on
  * the executor (how a cluster deployment ships a real HTTP transport
  * without a shared-JVM registry). */
object PostsTransports {
  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, PostsTransport]()
  registry.put("default", PostsFetcher)

  def register(name: String, t: PostsTransport): Unit = registry.put(name, t)

  def resolve(name: String): PostsTransport = {
    val found = registry.get(name)
    if (found != null) found
    else if (name.contains("."))
      Class.forName(name).getDeclaredConstructor().newInstance()
        .asInstanceOf[PostsTransport]
    else throw new IllegalArgumentException(
      s"unknown posts transport '$name' (registered: default, or a class name)")
  }
}

/** Per-JVM (= per-executor) request pacing. The reference enforces ≥1 s
  * between requests on its single serial client (`ingestion.py:40`); the
  * distributed equivalent is a per-executor limiter — cluster-wide request
  * rate = rateLimitPerSec × executors, which is the knob an operator
  * actually tunes against an API quota. Token-bucketless monotonic
  * schedule: each acquire reserves the next free slot under the lock, then
  * sleeps outside it, so concurrent reader threads serialize their fetch
  * times without blocking each other's row processing. */
object PostsRateLimiter {
  private final class Schedule { var nextFreeNanos = 0L }
  // keyed by transport name ≈ endpoint: concurrent scans of DIFFERENT
  // endpoints must not queue behind each other's reservations (a 1/sec
  // scan sharing a global schedule would throttle an unrelated 100/sec
  // scan to its rate)
  private val schedules =
    new java.util.concurrent.ConcurrentHashMap[String, Schedule]()

  def acquire(key: String, perSec: Double): Unit = {
    if (perSec <= 0) return // 0 = unlimited
    val sched = schedules.computeIfAbsent(key, _ => new Schedule)
    val intervalNanos = (1e9 / perSec).toLong
    val waitNanos = sched.synchronized {
      val now = System.nanoTime()
      val slot = math.max(now, sched.nextFreeNanos)
      sched.nextFreeNanos = slot + intervalNanos
      slot - now
    }
    if (waitNanos > 0) Thread.sleep(waitNanos / 1000000, (waitNanos % 1000000).toInt)
  }
}

/** Retry/backoff/rate-limit wrapper around a transport — the reference's
  * `retry_on_failure(max_retries=3, delay=5)` decorator (`utils.py:138-149`)
  * as scan options. `maxRetries` counts ATTEMPTS (3 = initial + 2 retries,
  * matching the reference), `backoffMs` doubles per retry. */
object ResilientFetch {
  def apply(transportName: String, transport: PostsTransport,
      page: Int, pageSize: Int, limit: Int,
      maxRetries: Int, backoffMs: Long, rateLimitPerSec: Double): Seq[(Long, Long, String, String)] = {
    var attempt = 0
    var delay = backoffMs
    while (true) {
      PostsRateLimiter.acquire(transportName, rateLimitPerSec)
      try return transport.fetchPage(page, pageSize, limit)
      catch {
        case e: Exception =>
          attempt += 1
          if (attempt >= maxRetries) throw e
          if (delay > 0) Thread.sleep(delay)
          delay *= 2
      }
    }
    throw new IllegalStateException("unreachable")
  }
}

class PostsTable(options: CaseInsensitiveStringMap) extends Table with SupportsRead {
  override def name(): String = "graft_posts"
  override def schema(): StructType = PostsDataSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder = {
    def opt(k: String, d: String): String =
      opts.getOrDefault(k, options.getOrDefault(k, d))
    new PostsScanBuilder(
      limit = opts.getInt("limit", options.getInt("limit", 100)),
      pageSize = opts.getInt("pageSize", options.getInt("pageSize", 100)),
      policy = FetchPolicy(
        transport = opt("transport", "default"),
        // reference defaults: 3 attempts, 5 s base delay, 2× backoff
        maxRetries = opt("maxRetries", "3").toInt,
        backoffMs = opt("backoffMs", "5000").toLong,
        // 0 = unpaced (right for the synthetic default transport); an HTTP
        // deployment sets the reference's 1/sec per executor
        rateLimitPerSec = opt("rateLimitPerSec", "0").toDouble))
  }
}

/** Per-scan resilience policy; `transport` resolves on the EXECUTOR via
  * [[PostsTransports.resolve]], so only the name ships in the plan. */
case class FetchPolicy(transport: String, maxRetries: Int, backoffMs: Long,
    rateLimitPerSec: Double) {
  require(maxRetries >= 1, s"maxRetries must be >= 1, got $maxRetries")
  require(backoffMs >= 0, s"backoffMs must be >= 0, got $backoffMs")
}

class PostsScanBuilder(var limit: Int, pageSize: Int, policy: FetchPolicy)
    extends ScanBuilder with SupportsPushDownLimit
    with SupportsPushDownRequiredColumns {
  private var required: StructType = PostsDataSource.Schema
  override def pushLimit(n: Int): Boolean = {
    if (n < limit) limit = n
    true // fully pushed: the source produces exactly `limit` rows
  }
  /** Column pruning: the scan emits only what the query projects — over a
    * real HTTP transport this is the `?_fields=` parameter (fetch fewer
    * bytes per page), and even with the synthetic transport it keeps the
    * post bodies out of every downstream exchange. Catalyst hands us the
    * pruned schema; rows are assembled per-field by name below. */
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new PostsScan(limit, pageSize, policy, required)
}

case class PostsPage(page: Int, pageSize: Int, limit: Int) extends InputPartition

class PostsScan(limit: Int, pageSize: Int,
    policy: FetchPolicy = FetchPolicy("default", 3, 5000L, 0.0),
    schema: StructType = PostsDataSource.Schema) extends Scan with Batch {
  require(pageSize > 0, s"pageSize must be positive, got $pageSize")
  require(limit >= 0, s"limit must be non-negative, got $limit")
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] = {
    val pages = math.max(1, math.ceil(limit.toDouble / pageSize).toInt)
    (0 until pages).map(p => PostsPage(p, pageSize, limit): InputPartition).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory = {
    val p = policy // stable local: the factory closure serializes to executors
    val fields = schema.fieldNames // serializable projection spec
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
        val pg = partition.asInstanceOf[PostsPage]
        new PartitionReader[InternalRow] {
          private val rows = ResilientFetch(
            p.transport, PostsTransports.resolve(p.transport),
            pg.page, pg.pageSize, pg.limit,
            p.maxRetries, p.backoffMs, p.rateLimitPerSec).iterator
          private var current: (Long, Long, String, String) = _
          override def next(): Boolean = {
            if (rows.hasNext) { current = rows.next(); true } else false
          }
          override def get(): InternalRow = InternalRow.fromSeq(
            fields.toIndexedSeq.map {
              case "id" => current._1
              case "userId" => current._2
              case "title" => UTF8String.fromString(current._3)
              case "body" => UTF8String.fromString(current._4)
              case other => throw new IllegalStateException(
                s"unknown pruned column '$other'")
            })
          override def close(): Unit = ()
        }
      }
    }
  }
}
