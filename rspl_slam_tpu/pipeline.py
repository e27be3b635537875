"""Pipelined SLAM runner — the TPU-native successor of the reference's
two-thread pipeline (ExtractFeatureThread ∥ TrackingThread with bounded
queues, map_builder.cc:48-262).

Three overlapped stages:

- **Prefetch** thread: dataset IO (image decode) into a bounded queue
  (depth ≙ _data_buffer cap 3, map_builder.cc:63-69);
- **Extract** thread: frontend extraction + stereo matching — all device
  work. JAX dispatch is asynchronous, so while the host thread prepares the
  next frame the TPU is still crunching the previous one; the reference
  instead serialized engines behind a GPU mutex;
- **Track** (caller thread): pose optimization, keyframe policy, map
  updates, BA — consumes the feature queue (depth ≙ _tracking_data_buffer
  cap 2, map_builder.cc:176-183).

Queues use blocking put (backpressure) like the reference, but with real
condition variables instead of its 1 ms sleep-polling.
"""

from __future__ import annotations

import queue
import threading
import time

__all__ = ["PipelinedRunner"]

_SENTINEL = object()


class _RawImages:
    """Queue marker: an undecoded stereo pair headed for the combined
    extraction+tracking step (slam.add_frame)."""

    __slots__ = ("il", "ir")

    def __init__(self, il, ir):
        self.il = il
        self.ir = ir


class PipelinedRunner:
    def __init__(self, slam, dataset=None, queue_depth: int = 3,
                 feature_depth: int = 2, on_record=None):
        """``slam``: a SLAMSystem. ``dataset``: optional indexable of
        StereoFrame for the prefetch stage; otherwise feed frames manually
        with :meth:`feed`. ``on_record(record, feats)``: optional per-frame
        observer called from the tracking thread after each frame — the
        publish hook (≙ PublishFrame, map_builder.cc:238) feeding
        visualization.FramePublisher."""
        self.slam = slam
        self.dataset = dataset
        self.on_record = on_record
        self._img_q: queue.Queue = queue.Queue(maxsize=queue_depth)
        self._feat_q: queue.Queue = queue.Queue(maxsize=feature_depth)
        self._extract_thread = threading.Thread(target=self._extract_loop,
                                                daemon=True)
        self._prefetch_thread = None
        self._error = None

    # ------------------------------------------------------------- plumbing
    def _prefetch_loop(self):
        try:
            for i in range(len(self.dataset)):
                fr = self.dataset[i]
                self._img_q.put((fr.index, fr.time, fr.image_left,
                                 fr.image_right))
        except Exception as e:  # surface IO errors on the consumer side
            self._error = e
        finally:
            self._img_q.put(_SENTINEL)

    def _extract_loop(self):
        try:
            while True:
                item = self._img_q.get()
                if item is _SENTINEL:
                    break
                index, t, il, ir = item
                # combined one-dispatch mode: raw images flow to the
                # tracking thread, which runs extraction+tracking as ONE
                # graph (slam.wants_images flips true once initialized)
                if getattr(self.slam, "wants_images", lambda: False)():
                    self._feat_q.put((index, t, _RawImages(il, ir)))
                    continue
                feats = self.slam.frontend.extract_pair(il, ir)
                self._feat_q.put((index, t, feats))
        except Exception as e:
            self._error = e
        finally:
            self._feat_q.put(_SENTINEL)

    # ------------------------------------------------------------------ api
    def feed(self, index: int, t: float, img_l, img_r):
        """Manual feeding (live/ROS-style ingestion ≙ GrabStereo,
        ros_main.cpp:24-53). Blocks when the pipeline is 3 frames behind."""
        self._img_q.put((index, t, img_l, img_r))

    def close_input(self):
        self._img_q.put(_SENTINEL)

    def run(self, max_frames: int | None = None):
        """Process the whole dataset through the pipeline. Returns the list
        of FrameRecords."""
        assert self.dataset is not None
        if max_frames is not None:
            ds = self.dataset
            n = min(len(ds), max_frames)

            class _Slice:
                def __len__(self):
                    return n

                def __getitem__(self, i):
                    return ds[i]

            self.dataset = _Slice()
        self._prefetch_thread = threading.Thread(target=self._prefetch_loop,
                                                 daemon=True)
        self._prefetch_thread.start()
        self._extract_thread.start()
        records = []
        while True:
            item = self._feat_q.get()
            if item is _SENTINEL:
                break
            index, t, feats = item
            if isinstance(feats, _RawImages):
                rec = self.slam.add_frame(index, t, feats.il, feats.ir)
                feats = self.slam._last_feats
            else:
                rec = self.slam.add_frame_features(index, t, feats)
            if self.on_record is not None:
                self.on_record(rec, feats)
            records.append(rec)
        if self._error is not None:
            raise self._error
        return records

    def run_manual(self):
        """Consume the feature queue until close_input() — for live feeds.
        Call from the tracking thread."""
        self._extract_thread.start()
        records = []
        while True:
            item = self._feat_q.get()
            if item is _SENTINEL:
                break
            index, t, feats = item
            if isinstance(feats, _RawImages):
                rec = self.slam.add_frame(index, t, feats.il, feats.ir)
                feats = self.slam._last_feats
            else:
                rec = self.slam.add_frame_features(index, t, feats)
            if self.on_record is not None:
                self.on_record(rec, feats)
            records.append(rec)
        if self._error is not None:
            raise self._error
        return records
