package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow

/** The benchmark/probe ACTION: fully materialize every row AND column
  * of a frame and return the row count.
  *
  * `df.count()` is the wrong measuring stick for a query benchmark:
  * Catalyst rewrites the plan around the action, so a count after a
  * groupBy PRUNES every aggregate expression the query exists to
  * compute (the round-11 PcaProbe memo measured heavy cascade faces
  * "reading as ~1s scans" under count), and a count after a projection
  * prunes the projection itself. The timing then measures row
  * existence, not the query.
  *
  * This action instead consumes the final physical plan's own output
  * iterator: `queryExecution.toRdd` requires the full analyzed output
  * schema (no column or aggregate-expression pruning is legal), and
  * draining the iterator forces every operator to produce every row —
  * exactly the work a real consumer (a writer, a driver fetch, a
  * downstream stage) would pay. One job, no result shipped to the
  * driver beyond a per-partition count.
  */
object Consume {

  /** Materialize `df` completely; returns the row count. */
  def rows(df: DataFrame): Long = {
    val rdd = df.queryExecution.toRdd
    val counts = df.sparkSession.sparkContext.runJob(rdd,
      (it: Iterator[InternalRow]) => {
        var n = 0L
        while (it.hasNext) { it.next(); n += 1L }
        n
      })
    counts.sum
  }
}
