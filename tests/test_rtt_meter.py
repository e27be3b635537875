"""bench.py's round-trip instrumentation (VERDICT r04 item 2): the meter
must COUNT actual dispatches and blocking fetches — not estimate them —
and restore the patched entry points on exit."""

import numpy as np


def _tri_inputs():
    B, M = 2, 3
    Twc = np.tile(np.eye(4, dtype=np.float32), (B, M, 1, 1))
    Twc[0, 1, 0, 3] = 0.3
    Twc[1, 1, 0, 3] = 0.5
    uvn = np.full((B, M, 2), 0.05, np.float32)
    uvn[:, 1] = 0.02
    mask = np.ones((B, M), bool)
    return Twc, uvn, mask


class TestRTTMeter:
    def test_counts_dispatches_and_fetches(self):
        import bench
        from rspl_slam_tpu import slam as slam_mod

        Twc, uvn, mask = _tri_inputs()
        meter = bench._RTTMeter()
        with bench._rtt_instrumentation(meter):
            buf = slam_mod._tri_points_packed(Twc, uvn, mask)
            arr = np.asarray(buf)  # the blocking fetch
        assert meter.dispatches == 1
        assert meter.by_site == {"_tri_points_packed": 1}
        assert meter.fetches == 1
        assert meter.upload_bytes == Twc.nbytes + uvn.nbytes + mask.nbytes
        assert meter.fetch_bytes == arr.nbytes

    def test_patching_is_reversible(self):
        import numpy as numpy_mod

        import bench
        from rspl_slam_tpu import slam as slam_mod

        orig_asarray = numpy_mod.asarray
        orig_tri = slam_mod._tri_points_packed
        meter = bench._RTTMeter()
        with bench._rtt_instrumentation(meter):
            assert numpy_mod.asarray is not orig_asarray
            assert slam_mod._tri_points_packed is not orig_tri
        assert numpy_mod.asarray is orig_asarray
        assert slam_mod._tri_points_packed is orig_tri

    def test_uninstrumented_run_unaffected(self):
        # counters only move inside the context
        import bench
        from rspl_slam_tpu import slam as slam_mod

        Twc, uvn, mask = _tri_inputs()
        meter = bench._RTTMeter()
        np.asarray(slam_mod._tri_points_packed(Twc, uvn, mask))
        assert meter.dispatches == 0 and meter.fetches == 0
