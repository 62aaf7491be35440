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


def test_prefetch_stride_partitions_hosts_disjointly():
    """Multi-host contract: host p of P with start=p*L, stride=G yields
    samples [i*G + p*L, (i*G + (p+1)*L)) of global batch i — disjoint
    across hosts and contiguous when concatenated in host order."""
    ds = _SlowDataset(24)
    G, P = 6, 3           # global batch 6 over 3 hosts -> local batch 2
    L = G // P
    per_host = [
        [idxs for _, idxs in prefetch_batches(
            ds, batch_size=L, collate=_collate, num_workers=2,
            start=p * L, stride=G, num_batches=3)]
        for p in range(P)
    ]
    for bi in range(3):
        merged = [k for p in range(P) for k in per_host[p][bi]]
        assert merged == [bi * G + j for j in range(G)]


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
