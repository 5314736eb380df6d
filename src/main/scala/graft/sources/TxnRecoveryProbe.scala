package graft.sources

/** Cross-process crash-recovery probe: a SECOND JVM (no Spark, no
  * caches — exactly the posture of a fresh driver finding a dead
  * writer's residue) runs the load-time recovery pass over a catalog
  * root. Forked by `TxnRecoverySpec`; prints a marker the spec
  * asserts on. */
object TxnRecoveryProbe {
  def main(args: Array[String]): Unit = {
    TableTxn.recover(java.nio.file.Paths.get(args(0)))
    println("recovery-complete")
  }
}
