package graft.catalog

/** Test-only crash-point hooks for the storage commit protocols.
  *
  * Every multi-step commit (stage → atomic move → meta swap → cleanup) is
  * argued crash-consistent; these named cut points let a suite PROVE it by
  * killing a writer between any two steps and asserting the replayed state
  * is exactly the complete pre-op or complete post-op state — never a torn
  * middle. The "kill" is a thrown [[FaultInjection.InjectedCrash]]: it
  * unwinds like a driver death as far as on-disk state is concerned (no
  * compensating writes run), while letting the suite keep its process.
  *
  * Production cost: one volatile read per cut point, write paths only.
  */
object FaultInjection {
  final class InjectedCrash(val point: String)
      extends RuntimeException(s"injected crash at $point")

  @volatile private var armed: String => Boolean = _ => false

  /** Arm: throw at every cut point `shouldCrash` selects. Test-only. */
  def arm(shouldCrash: String => Boolean): Unit = armed = shouldCrash

  def disarm(): Unit = armed = _ => false

  /** Named cut point — called between every two steps of a commit. */
  private[catalog] def cut(point: String): Unit =
    if (armed(point)) throw new InjectedCrash(point)
}
