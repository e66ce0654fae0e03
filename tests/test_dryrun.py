"""Driver-gate regression test: the multi-chip dryrun must fit the driver's
compile budget (VERDICT r3 weak #1: the r3 one-hot rewrite blew XLA:CPU
compile to 506 s and the driver's check timed out; r4's static BSDF-lobe
gating brought a cold compile to ~64 s on the 2-core box)."""
import time


def test_dryrun_multichip_wallclock():
    from __graft_entry__ import dryrun_multichip

    t0 = time.time()
    dryrun_multichip(8)
    wall = time.time() - t0
    # 64 s cold / ~15 s warm on the 2-core bench box; 240 s leaves headroom
    # for contention while still failing long before the driver's timeout
    assert wall < 240.0, f"dryrun_multichip(8) took {wall:.0f}s"
