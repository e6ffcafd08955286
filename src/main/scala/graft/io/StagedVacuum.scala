package graft.io

/** CLI wiring for [[Staged.vacuum]]: reclaim stale staged directories
  * under the current stage root (env `SPARK_GRAFT_STAGE_DIR` >
  * `graft.stage.dir` sysprop > tmpdir) and print what was removed.
  * `tools/bench_record.sh` runs this before a warm record so the
  * pre-pass never counts stale-fingerprint dirs into `staged_dirs`;
  * a deployment cron-runs it against the shared stage root.
  *
  * No SparkSession — the fingerprint check and deletes are pure
  * filesystem work.
  */
object StagedVacuum {
  def main(args: Array[String]): Unit = {
    val removed = Staged.vacuum()
    println(s"vacuumed ${removed.size} staged dir(s) under ${Staged.root}")
    removed.foreach(p => println(s"  removed $p"))
  }
}
