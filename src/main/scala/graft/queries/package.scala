package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Query registry conventions.
  *
  * Each area object exposes:
  *   - `queries`: named Spark-first implementations `(session, sfDir) => DataFrame`
  *   - `oracle`:  the same semantics as ANSI SQL runnable by DuckDB over the
  *     same parquet tables (registered under their bare names).
  *
  * Contract notes (driver hash-compare):
  *   - every computed column is aliased identically on both sides;
  *   - computed floats are `round(...)`-ed identically on both sides (double
  *     summation order differs between engines);
  *   - computed integers are cast to BIGINT on both sides (Spark `count` is
  *     long but e.g. `grouping()` is tinyint; DuckDB `sum(int)` is HUGEINT);
  *   - every result carries a deterministic total ORDER BY on both sides.
  */
package object queries {
  type Q = (SparkSession, String) => DataFrame

  /** Temp dir that is recursively deleted at JVM exit — shared by every
    * query that stages files (CSV/parquet replay inputs, sinks); staging
    * dirs would otherwise accumulate across runs. */
  def tempDir(prefix: String): java.nio.file.Path = {
    import java.nio.file.Files
    val p = Files.createTempDirectory(prefix)
    sys.addShutdownHook {
      try {
        val walk = Files.walk(p)
        try walk.sorted(java.util.Comparator.reverseOrder())
          .forEach(f => Files.deleteIfExists(f))
        finally walk.close()
      } catch { case _: Exception => () }
    }
    p
  }
}
