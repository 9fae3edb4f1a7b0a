package graft.operators

import org.apache.spark.sql.DataFrame

/** Statistics-driven plan decisions shared by operators (r18).
  *
  * The one decision here is the BARRIER TRADE: a frame consumed by
  * several downstream branches either re-computes per branch (Spark has
  * no automatic common-subtree materialization — column pruning projects
  * each branch differently, so even identical repartitions stop
  * canonicalizing equal and ReuseExchange never fires; the r17 audit) or
  * materializes once behind a `localCheckpoint`, paying one fixed extra
  * job. Which side wins is purely a function of how much input the
  * re-computed subtree scans: the r18 heavy-tier A/B measured the
  * crossover directly — `q_user_quartiles` LOSES ~0.1 s with an
  * unconditional barrier at sf0.1 (events ≈ 2 MB; the fixed job costs
  * more than two extra overhead-sized scans) and WINS 1.16 → 0.79 s at
  * the 10× tier (events ≈ 21 MB), with the gap growing linearly in input
  * size from there. So the barrier dispatches on the INPUT's size
  * statistic, exactly like a cost-based optimizer's materialization
  * rule: under `graft.barrier.minInputBytes` (default 4 MB — above every
  * sf0.1 input, below every 10×-tier fact/corpus input) the plan is unchanged;
  * above it the shared frame checkpoints. At the 100 TB design point the
  * barrier is always on; the conf exists so the crossover is tunable per
  * deployment rather than baked to this host (the scale-dependent-
  * settings rule).
  *
  * Results are barrier-independent by construction (a barrier only
  * materializes the identical rows). The localCheckpoint fault-tolerance
  * caveat recorded at the other barrier sites applies here too.
  */
object Adaptive {
  val MinInputBytesKey = "graft.barrier.minInputBytes"
  val MinInputBytesDefault: Long = 4L << 20

  /** `shared` materializes iff `sizedOn`'s estimated scan size exceeds
    * the threshold. `sizedOn` is the INPUT the shared subtree re-scans
    * per consumer (not the shared frame itself, whose post-aggregation
    * estimate says nothing about the cost of re-computing it).
    */
  def barrierIfBig(shared: DataFrame, sizedOn: DataFrame): DataFrame = {
    val minBytes = shared.sparkSession.conf
      .getOption(MinInputBytesKey).map(_.toLong).getOrElse(MinInputBytesDefault)
    if (sizedOn.queryExecution.optimizedPlan.stats.sizeInBytes > minBytes)
      shared.localCheckpoint(eager = false)
    else shared
  }
}
