"""Prefetching batch loader: determinism and pipelining semantics."""
import threading
import time

import numpy as np

from actalker_tpu.training.loader import prefetch_batches


class _SlowDataset:
    """Records which thread fetched each index; simulates decode latency."""

    def __init__(self, n):
        self.n = n
        self.threads = {}

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        time.sleep(0.01)
        self.threads[i] = threading.current_thread().name
        return {"idx": i, "x": np.full((4,), float(i))}


def _collate(samples):
    return np.stack([s["x"] for s in samples]), [s["idx"] for s in samples]


def test_prefetch_order_matches_synchronous():
    ds = _SlowDataset(10)
    got = [idxs for _, idxs in prefetch_batches(
        ds, batch_size=3, collate=_collate, num_workers=4, depth=3,
        num_batches=6)]
    want = [idxs for _, idxs in prefetch_batches(
        ds, batch_size=3, collate=_collate, num_workers=0, num_batches=6)]
    assert got == want
    # wraps modulo the dataset like the synchronous loop it replaced
    assert got[0] == [0, 1, 2] and got[3] == [9, 0, 1]


def test_prefetch_uses_worker_threads_and_start_offset():
    ds = _SlowDataset(8)
    batches = list(prefetch_batches(
        ds, batch_size=2, collate=_collate, num_workers=2, depth=2,
        start=5, num_batches=3))
    assert [b[1] for b in batches] == [[5, 6], [7, 0], [1, 2]]
    names = set(ds.threads.values())
    assert any("actalker-loader" in n for n in names)
    values = np.concatenate([b[0][:, 0] for b in batches])
    np.testing.assert_allclose(values, [5, 6, 7, 0, 1, 2])
