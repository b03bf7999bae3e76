package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Load-time artifact store: derived tables that a deployed engine builds
  * ONCE at load/commit time — the triple-ized store, the RDFS-closed store,
  * the dictionary encoding, the full-text index — materialized to parquet
  * on first use and scanned thereafter.
  *
  * This mirrors the reference's architecture: StatementBuffer/LexiconRelation
  * build the journal's indexes at load, InferenceEngine materializes the
  * closure at commit (/root/reference/bigdata-rdf/src/java/com/bigdata/rdf/
  * store/AbstractTripleStore.java), and queries run against the result.
  * Re-deriving these per query would charge every query the load cost — at
  * 100 TB the distinction is existential, not cosmetic.
  *
  * Parquet (not .cache()) so the artifact survives executor eviction and
  * aggressive unpersist sweeps, benefits from column pruning/pushdown like
  * any other table, and behaves exactly like the warehouse table it would
  * be in a real deployment. Memoization is per-JVM; paths are per-process
  * (PID-salted) so concurrent drivers never clobber each other.
  */
object Catalog {

  private val built = scala.collection.concurrent.TrieMap.empty[(String, String), String]

  private lazy val root: String = {
    val pid = ProcessHandle.current().pid()
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft-catalog-$pid"
    // artifacts are per-JVM scratch: reclaim them on exit so repeated
    // driver runs don't accumulate dead catalog dirs in tmp
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      val p = java.nio.file.Paths.get(dir)
      if (java.nio.file.Files.exists(p)) {
        java.nio.file.Files.walk(p)
          .sorted(java.util.Comparator.reverseOrder())
          .forEach(f => try java.nio.file.Files.delete(f)
                        catch { case _: Exception => })
      }
    }))
    dir
  }

  /** Return the memoized parquet-backed table, building it on first use. */
  def table(spark: SparkSession, dir: String, name: String)
           (build: => DataFrame): DataFrame = {
    val path = built.getOrElseUpdate((dir, name), {
      val p = s"$root/${Integer.toHexString(dir.hashCode)}/$name"
      build.write.mode("overwrite").parquet(p)
      p
    })
    spark.read.parquet(path)
  }

  /** Forget a dir's artifacts and delete their parquet files — for caches
    * that evict superseded entries (e.g. the bds store-key LRU).
    */
  def drop(dir: String): Unit =
    built.keys.filter(_._1 == dir).foreach { k =>
      built.remove(k).foreach { path =>
        val p = java.nio.file.Paths.get(path)
        if (java.nio.file.Files.exists(p))
          java.nio.file.Files.walk(p)
            .sorted(java.util.Comparator.reverseOrder())
            .forEach(f => try java.nio.file.Files.delete(f)
                          catch { case _: Exception => })
      }
    }

  /** How many live artifacts have a dir starting with `prefix` (spec hook
    * for eviction bounds). */
  private[graft] def entryCount(prefix: String): Int =
    built.keys.count(_._1.startsWith(prefix))
}
