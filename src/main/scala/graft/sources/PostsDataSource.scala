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
  * `PostsFetcher.fetchPage` is the page boundary: in this zero-egress
  * container it synthesizes the deterministic jsonplaceholder-shaped rows
  * (10 posts per user, sequential ids); a production build swaps in the
  * HTTP GET (`{base}/posts?_page=p&_limit=n`) with the session-pool /
  * retry / backoff policy the reference configures (`src/utils.py:138-149`)
  * — per PARTITION, preserving per-page rate limiting.
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

/** Deterministic page fetch (the pluggable transport). */
object PostsFetcher {
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

class PostsTable(options: CaseInsensitiveStringMap) extends Table with SupportsRead {
  override def name(): String = "graft_posts"
  override def schema(): StructType = PostsDataSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    new PostsScanBuilder(
      limit = opts.getInt("limit", options.getInt("limit", 100)),
      pageSize = opts.getInt("pageSize", options.getInt("pageSize", 100)))
}

class PostsScanBuilder(var limit: Int, pageSize: Int)
    extends ScanBuilder with SupportsPushDownLimit {
  override def pushLimit(n: Int): Boolean = {
    if (n < limit) limit = n
    true // fully pushed: the source produces exactly `limit` rows
  }
  override def build(): Scan = new PostsScan(limit, pageSize)
}

case class PostsPage(page: Int, pageSize: Int, limit: Int) extends InputPartition

class PostsScan(limit: Int, pageSize: Int) extends Scan with Batch {
  require(pageSize > 0, s"pageSize must be positive, got $pageSize")
  require(limit >= 0, s"limit must be non-negative, got $limit")
  override def readSchema(): StructType = PostsDataSource.Schema
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] = {
    val pages = math.max(1, math.ceil(limit.toDouble / pageSize).toInt)
    (0 until pages).map(p => PostsPage(p, pageSize, limit): InputPartition).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
        val pg = partition.asInstanceOf[PostsPage]
        new PartitionReader[InternalRow] {
          private val rows = PostsFetcher.fetchPage(pg.page, pg.pageSize, pg.limit).iterator
          private var current: (Long, Long, String, String) = _
          override def next(): Boolean = {
            if (rows.hasNext) { current = rows.next(); true } else false
          }
          override def get(): InternalRow = InternalRow(
            current._1, current._2,
            UTF8String.fromString(current._3), UTF8String.fromString(current._4))
          override def close(): Unit = ()
        }
      }
    }
}
