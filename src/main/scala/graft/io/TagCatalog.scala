package graft.io

import scala.collection.concurrent.TrieMap
import org.apache.spark.sql.{DataFrame, SparkSession}

/** DDFS tag catalog — named, mutable pointers to data, composable into a
  * DAG (reference: lib/disco/ddfs.py:94-114 `blobs`/`urls`, :334-364 `walk`;
  * tag attributes ddfs.py:366-398).
  *
  * A tag's members are either `tag://<name>` references (DAG edges) or
  * concrete data paths. [[urls]] walks the DAG depth-first with a visited
  * set, so shared sub-tags and cycles terminate exactly like DDFS `walk`;
  * a path listed under two distinct parent tags appears twice (blob
  * multiplicity is part of DDFS semantics — dedupe is the caller's choice).
  * Catalog state is driver-side metadata only (like the Erlang tag server);
  * the data itself never moves on tag operations.
  */
class TagCatalog(spark: SparkSession) {

  private case class Tag(members: Seq[String], attrs: Map[String, String])
  private val tags = TrieMap.empty[String, Tag]

  def put(name: String, members: Seq[String]): Unit =
    tags.updateWith(name) {
      case Some(t) => Some(t.copy(members = members))
      case None    => Some(Tag(members, Map.empty))
    }

  def delete(name: String): Unit = tags.remove(name)
  def list: Seq[String] = tags.keys.toSeq.sorted
  def exists(name: String): Boolean = tags.contains(name)

  def setAttr(name: String, key: String, value: String): Unit =
    tags.updateWith(name) {
      case Some(t) => Some(t.copy(attrs = t.attrs + (key -> value)))
      case None    => Some(Tag(Seq.empty, Map(key -> value)))
    }
  def getAttr(name: String, key: String): Option[String] =
    tags.get(name).flatMap(_.attrs.get(key))
  def attrs(name: String): Map[String, String] =
    tags.get(name).map(_.attrs).getOrElse(Map.empty)

  /** Resolve a tag to its concrete data paths: DFS over tag:// edges with a
    * per-walk visited set (cycle-safe, ddfs.py:334-364).
    */
  def urls(name: String): Seq[String] = {
    val visited = scala.collection.mutable.Set.empty[String]
    def walk(n: String): Seq[String] =
      if (!visited.add(n)) Seq.empty
      else tags.get(n).map(_.members.flatMap { m =>
        if (m.startsWith("tag://")) walk(m.stripPrefix("tag://")) else Seq(m)
      }).getOrElse(Seq.empty)
    walk(name)
  }

  /** Read a tag as one DataFrame: resolve, apply `inputHook` to the
    * resolved list (Disco's input_hook, worker/__init__.py: reorder /
    * filter / sample inputs before the job sees them), then load with
    * `reader`. Default reader = parquet.
    *
    * The reader takes the WHOLE path batch, so a 10k-blob tag is one
    * multi-path scan node, not a 10k-node union plan. Blob multiplicity is
    * preserved (a path listed under two parents appears twice in the
    * result): paths are grouped by repeat count and each group is scanned
    * once, then unioned copy-per-repeat — plan size is O(distinct repeat
    * counts), which is 1 for the overwhelmingly common all-unique case.
    * Paths reach the reader in the ORDER the hook returned them (first
    * appearance for repeats) — reordering is part of input_hook's contract,
    * even though DataFrame row order is only meaningful to order-aware
    * readers.
    */
  def read(name: String,
           reader: Seq[String] => DataFrame = ps => spark.read.parquet(ps: _*),
           inputHook: Seq[String] => Seq[String] = identity): DataFrame = {
    val paths = inputHook(urls(name))
    require(paths.nonEmpty,
      s"tag '$name' resolves to no inputs (unknown tag, empty tag, or input_hook filtered everything)")
    val counts = paths.groupBy(identity).view.mapValues(_.size)
    val firstSeen = paths.distinct // hook order, first appearance per path
    firstSeen.map(p => counts(p) -> p).groupMap(_._1)(_._2).toSeq.sortBy(_._1)
      .iterator.map { case (m, ps) =>
        val once = reader(ps)
        Iterator.fill(m)(once).reduce(_ unionByName _)
      }.reduce(_ unionByName _)
  }
}
