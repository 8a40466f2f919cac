package graft.ext

/** Cross-package access to [[IndexIO.crashHook]] for specs outside
  * `graft.ext` (the chaos HTTP soak lives in `graft.server`): arm a
  * crash at the K-th protocol-level filesystem mutation, run the op,
  * report whether it fired. Same injection model as [[CrashFuzzSpec]].
  */
object CrashSeam {
  final class InjectedCrash extends RuntimeException("injected crash")

  /** Run `op` with a crash armed at kill point `k`; true iff it fired. */
  def crashedAt(k: Int)(op: => Unit): Boolean = {
    val n = new java.util.concurrent.atomic.AtomicInteger(0)
    IndexIO.crashHook =
      () => if (n.getAndIncrement() == k) throw new InjectedCrash
    try { op; false }
    catch { case _: InjectedCrash => true }
    finally IndexIO.crashHook = () => ()
  }
}
