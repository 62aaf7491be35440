"""Background-prefetching batch loader for training.

The reference trains ``ParentDataset`` through a torch ``DataLoader`` with
worker processes (accelerate launch, ``ds_zero2_8gpu.yaml``), so sample
decode overlaps the train step. This is the TPU-side counterpart: a thread
pool decodes samples ahead of the training loop with a bounded pipeline
depth. Threads (not processes) suffice because the heavy per-sample work —
video decode — happens in the native libav runtime (``runtime/media.cpp``)
and in cv2, both of which release the GIL.

Determinism: batch ``i`` is always samples ``[start + i*bs, start +
(i+1)*bs) mod len(dataset)`` in order, independent of worker count or
timing. Per-sample retry/resample randomness lives inside the dataset
(reference ``portrait_audio_dataset_arcface_vasa.py:841-845``).
"""
from __future__ import annotations

import collections
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Callable, Iterator, Optional, Sequence


def prefetch_batches(
    dataset: Sequence[Any],
    batch_size: int,
    collate: Callable[[list], Any],
    num_workers: int = 4,
    depth: int = 2,
    start: int = 0,
    num_batches: Optional[int] = None,
    stride: Optional[int] = None,
) -> Iterator[Any]:
    """Yield ``collate([dataset[i] ...])`` batches with ``depth`` batches of
    per-sample work in flight on ``num_workers`` threads.

    ``collate`` runs on the consumer thread (it may dispatch device work —
    e.g. the VAE batch encoder — which must not race the train step's
    dispatch order). ``num_workers=0`` degrades to fully synchronous
    iteration with identical output.

    ``stride`` is the index distance between consecutive batches (default
    ``batch_size``). Multi-host data parallelism sets ``stride`` to the
    GLOBAL batch size and ``start`` to this host's offset within it, so
    host p of P yields samples ``[i*G + p*L, i*G + (p+1)*L)`` of global
    batch i — disjoint across hosts, contiguous when concatenated.
    """
    n = len(dataset)
    step = batch_size if stride is None else stride

    def idxs_of(bi: int) -> list:
        return [(start + bi * step + j) % n for j in range(batch_size)]

    if num_workers <= 0:
        bi = 0
        while num_batches is None or bi < num_batches:
            yield collate([dataset[k] for k in idxs_of(bi)])
            bi += 1
        return

    ex = ThreadPoolExecutor(max_workers=num_workers,
                            thread_name_prefix="actalker-loader")
    try:
        def submit(bi: int) -> list:
            return [ex.submit(dataset.__getitem__, k) for k in idxs_of(bi)]

        inflight: collections.deque = collections.deque()
        next_bi = 0
        while len(inflight) < depth and (num_batches is None
                                         or next_bi < num_batches):
            inflight.append(submit(next_bi))
            next_bi += 1
        while inflight:
            futs = inflight.popleft()
            batch = collate([f.result() for f in futs])
            if num_batches is None or next_bi < num_batches:
                inflight.append(submit(next_bi))
                next_bi += 1
            yield batch
    finally:
        ex.shutdown(wait=False, cancel_futures=True)
