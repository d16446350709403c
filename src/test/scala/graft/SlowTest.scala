package graft

/** Tag for the suite's heaviest cases (multi-epoch streaming drains,
  * million-row soaks, multi-commit table lifecycles). The full suite
  * stays the gate; `sbt fastTest` excludes these for tight iteration:
  *
  *   sbt fastTest        // testOnly * -- -l graft.SlowTest
  *
  * Tagging policy (round-9 verdict #8): a case goes Slow when it costs
  * >20 s wall AND a faster case already covers the same contract's
  * correctness (the Slow one adds scale/soak evidence). */
object SlowTest extends org.scalatest.Tag("graft.SlowTest")
