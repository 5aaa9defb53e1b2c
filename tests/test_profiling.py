"""StepTimer: windowed step timing without per-step device syncs."""

from fmc_uia_tpu.utils.profiling import StepTimer


def test_windowed_laps_sync_only_at_boundaries():
    t = StepTimer(window=4, skip_windows=1)
    syncs = []
    for i in range(24):
        t.lap(lambda: syncs.append(i))
    # 24 laps / window 4 -> 6 boundary syncs (NOT 24: per-step syncs would
    # serialize the async dispatch pipeline)
    assert len(syncs) == 6
    # boundary 1 only arms t0; 5 measured windows, first skipped -> 4
    s = t.summary(batch_size=4)
    assert s["steps"] == 16
    assert s["p50_s"] > 0
    assert s["images_per_sec"] > 0


def test_tainted_windows_not_recorded():
    t = StepTimer(window=2, skip_windows=0)
    t.lap(), t.lap()  # boundary 1: arms t0
    t.lap(taint=True), t.lap()  # window 2 contains a compile -> dropped
    t.lap(), t.lap()  # window 3: clean, recorded
    assert len(t._times) == 1


def test_reset_clears_state():
    t = StepTimer(window=2, skip_windows=0)
    for _ in range(8):
        t.lap()
    assert t._times
    t.reset()
    assert t.summary() == {}
    assert t._t0 is None and t._laps == 0


def test_no_samples_yields_empty_summary():
    t = StepTimer(window=8)
    for _ in range(7):  # never reaches a boundary
        t.lap()
    assert t.summary(batch_size=4) == {}
