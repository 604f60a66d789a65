package graft

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

import graft.sources.snapshot.FileClaimLogStore

/** Child-JVM body for LogStoreSpec's multi-process race: attempt
  * exclusive publishes against a shared directory with the file-claim
  * store and report wins, so TWO real JVMs demonstrate cross-process
  * exclusion — their in-process claim tables are disjoint by
  * construction, leaving the `.claim` hard-link CAS as the ONLY thing
  * that can exclude. No Spark session: the store is pure Hadoop-FS.
  *
  * args: <dir> <writerId> <rounds>. Round r spin-waits for the
  * parent's `go-<r>` start marker (a crude barrier that makes the two
  * JVMs' attempts overlap), publishes `obj-<r>.json`, and appends
  * "r won" to `result-<writerId>` at exit.
  */
object LogStoreRaceMain {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val id = args(1)
    val rounds = args(2).toInt
    val fs = FileSystem.getLocal(new Configuration()).getRawFileSystem
    val store = new FileClaimLogStore
    val out = new StringBuilder
    (0 until rounds).foreach { r =>
      val go = new java.io.File(dir, s"go-$r")
      while (!go.exists()) Thread.sleep(1)
      val won = store.publishExclusive(fs, new Path(dir, f"obj-$r%03d.json"),
        s"writer-$id".getBytes("UTF-8"))
      out.append(s"$r ${if (won) 1 else 0}\n")
    }
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, s"result-$id"),
      out.toString.getBytes("UTF-8"))
    ()
  }
}
