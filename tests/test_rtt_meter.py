"""bench.py's round-trip instrumentation (VERDICT r04 item 2): the meter
must COUNT actual dispatches and blocking fetches — not estimate them —
and restore the patched entry points on exit."""

import numpy as np


def _tri_inputs():
    B, M, F = 2, 3, 4
    # pose TABLE + int32 observer indices (gathered on device — the
    # per-observation pose upload was the measured loop's third-largest
    # transfer)
    table = np.tile(np.eye(4, dtype=np.float32), (F, 1, 1))
    table[1, 0, 3] = 0.3
    table[2, 0, 3] = 0.5
    okf = np.zeros((B, M), np.int32)
    okf[0, 1] = 1
    okf[1, 1] = 2
    uvn = np.full((B, M, 2), 0.05, np.float32)
    uvn[:, 1] = 0.02
    mask = np.ones((B, M), bool)
    return table, okf, uvn, mask


class TestRTTMeter:
    def test_counts_dispatches_and_fetches(self):
        import bench
        from rspl_slam_tpu import slam as slam_mod

        table, okf, uvn, mask = _tri_inputs()
        meter = bench._RTTMeter()
        with bench._rtt_instrumentation(meter):
            buf = slam_mod._tri_points_packed(table, okf, uvn, mask)
            arr = np.asarray(buf)  # the blocking fetch
        assert meter.dispatches == 1
        assert meter.by_site == {"_tri_points_packed": 1}
        assert meter.fetches == 1
        assert meter.upload_bytes == (table.nbytes + okf.nbytes
                                      + uvn.nbytes + mask.nbytes)
        assert meter.fetch_bytes == arr.nbytes
        # blocking fetch WALL is counted (the measured_split itemization)
        assert meter.fetch_wall > 0.0
        assert meter.fetch_wall_overlap == 0.0

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

        table, okf, uvn, mask = _tri_inputs()
        meter = bench._RTTMeter()
        np.asarray(slam_mod._tri_points_packed(table, okf, uvn, mask))
        assert meter.dispatches == 0 and meter.fetches == 0

    def test_ba_fetch_thread_bucketed_as_overlap(self):
        # fetches on the named ba-fetch thread land in the OVERLAP bucket:
        # slam._dispatch_local_ba downloads BA results on such a thread so
        # they never sit on the tracking loop's critical path
        import threading

        import jax.numpy as jnp

        import bench

        meter = bench._RTTMeter()
        with bench._rtt_instrumentation(meter):
            x = jnp.arange(4.0)

            def fetch():
                np.asarray(x)

            t = threading.Thread(target=fetch, name="ba-fetch-test")
            t.start()
            t.join()
            np.asarray(x)  # main thread: critical path
        assert meter.fetches == 2
        assert meter.fetch_wall > 0.0
        assert meter.fetch_wall_overlap > 0.0
