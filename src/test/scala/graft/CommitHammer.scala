package graft

/** Forked-JVM worker for the MULTI-PROCESS commit contention spec: a
  * plain main (no Spark — just the store's commit protocol) that
  * appends `n` unique entries to one snapshot store, each as its own
  * optimistic commit. Cross-process atomicity is exactly what the
  * POSIX O_CREAT|O_EXCL claim fix targets (Hadoop's local
  * exclusive-create is check-then-act); in-JVM threads can't prove
  * it — the kernel-level race only exists between processes. */
object CommitHammer {
  def main(args: Array[String]): Unit = {
    val Array(store, writerId, nStr) = args
    val n = nStr.toInt
    (0 until n).foreach { i =>
      graft.sources.DocStore.commitSnapshot(store) { base =>
        base :+ f"w$writerId-c$i%03d.parquet"
      }: Unit
    }
  }
}
