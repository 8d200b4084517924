"""Threaded prefetching batch loader (torch-DataLoader replacement).

The reference cycles torch DataLoaders with worker processes
(CTCLIPTrainer.py:346-393, data.py:316-336).  Here: a thread pool loads and
collates numpy batches ahead of consumption (npz decompression releases the
GIL), and the consumer overlaps host→device transfer with compute by
keeping `prefetch` batches in flight.  String fields are collated to lists;
per-class prompt tensors that repeat across samples are collapsed to one
copy (the trainer feeds them batch-free, ct_clip.py:1060-1070 semantics).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, List

import numpy as np

_SHARED_KEYS = {"prompt_ids", "prompt_mask"}
_META_KEYS = {"data_type"}


def collate(items: List[Dict]) -> Dict:
    out: Dict = {}
    for key in items[0]:
        vals = [item[key] for item in items]
        if key in _META_KEYS:
            out[key] = vals[0]
        elif key in _SHARED_KEYS:
            out[key] = np.asarray(vals[0])
        elif isinstance(vals[0], np.ndarray):
            out[key] = np.stack(vals)
        elif isinstance(vals[0], (int, float, np.floating, np.integer)):
            out[key] = np.asarray(vals)
        else:
            out[key] = vals
    return out


class Loader:
    """One pass over the dataset in batches."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        *,
        shuffle: bool = False,
        seed: int = 0,
        drop_last: bool = False,
        num_workers: int = 4,
        prefetch: int = 2,
        shard_id: int = 0,
        num_shards: int = 1,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.prefetch = max(1, prefetch)
        self.epoch = 0
        # multihost DP: every host shuffles the SAME permutation
        # (seed, epoch) and takes its disjoint stride — per-host loaders
        # then feed the per-host slice of the global batch
        self.shard_id = shard_id
        self.num_shards = max(1, num_shards)

    @classmethod
    def for_host(cls, dataset, batch_size: int, **kw):
        """Loader sharded by the current jax process (multihost DP)."""
        import jax

        kw.setdefault("shard_id", jax.process_index())
        kw.setdefault("num_shards", jax.process_count())
        return cls(dataset, batch_size, **kw)

    def _shard_len(self) -> int:
        # every shard is wrap-padded to the same ceiling so all hosts
        # dispatch the same number of batches (global jit programs need
        # lockstep step counts across hosts)
        return -(-len(self.dataset) // self.num_shards)

    def __len__(self):
        n = self._shard_len()
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def _batch_indices(self) -> List[List[int]]:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            rng = np.random.default_rng((self.seed, self.epoch))
            rng.shuffle(idx)
        if self.num_shards > 1:
            full = idx
            idx = idx[self.shard_id::self.num_shards]
            target = self._shard_len()
            if len(idx) == 0:  # more shards than samples
                idx = full[np.arange(target) % len(full)]
            elif len(idx) < target:
                idx = np.concatenate([idx, idx[: target - len(idx)]])
        batches = [
            idx[i:i + self.batch_size].tolist()
            for i in range(0, len(idx), self.batch_size)
        ]
        if self.drop_last and batches and len(batches[-1]) < self.batch_size:
            batches.pop()
        return batches

    def __iter__(self) -> Iterator[Dict]:
        batches = self._batch_indices()
        self.epoch += 1
        if not batches:
            return
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def load_batch(indices):
            return collate([self.dataset[i] for i in indices])

        def put_or_stop(item) -> bool:
            """Bounded put that aborts when the consumer went away —
            otherwise an abandoned iterator would leave this thread blocked
            on a full queue forever (and its non-daemon pool workers would
            hang interpreter exit)."""
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            # Sliding submission window: at most workers+prefetch batches are
            # ever submitted-but-unconsumed.  Submitting the whole epoch up
            # front would let the pool race ahead of the consumer and pile
            # finished batches (~0.9 GB each at production volume shapes) in
            # completed futures — the q.put bound only throttles hand-off,
            # not execution.
            pool = ThreadPoolExecutor(self.num_workers)
            try:
                it = iter(batches)
                pending: List = []
                for b in it:
                    pending.append(pool.submit(load_batch, b))
                    if len(pending) >= self.num_workers + self.prefetch:
                        break
                while pending:
                    fut = pending.pop(0)
                    try:
                        result = fut.result()
                    except Exception as e:  # surface loader errors downstream
                        put_or_stop(("err", e))
                        return
                    if not put_or_stop(("ok", result)):
                        return
                    nxt = next(it, None)
                    if nxt is not None:
                        pending.append(pool.submit(load_batch, nxt))
                put_or_stop(("done", None))
            finally:
                pool.shutdown(wait=False, cancel_futures=True)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                kind, payload = q.get()
                if kind == "done":
                    return
                if kind == "err":
                    raise payload
                yield payload
        finally:
            stop.set()


class GroupedBatchSampler:
    """Batch indices grouped by a key (the CTViT trainer's slice-count-
    grouped CustomBatchSampler, ctvit_trainer.py:58-105): only samples with
    equal key(item) share a batch, so stacked shapes always match."""

    def __init__(self, dataset, batch_size: int, key, *, shuffle=True,
                 seed=0, drop_last=False):
        self.dataset = dataset
        self.batch_size = batch_size
        self.key = key
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.epoch = 0

    def __iter__(self):
        groups: Dict = {}
        for i in range(len(self.dataset)):
            groups.setdefault(self.key(self.dataset, i), []).append(i)
        rng = np.random.default_rng((self.seed, self.epoch))
        self.epoch += 1
        batches = []
        for idx in groups.values():
            idx = list(idx)
            if self.shuffle:
                rng.shuffle(idx)
            for s in range(0, len(idx), self.batch_size):
                chunk = idx[s:s + self.batch_size]
                if self.drop_last and len(chunk) < self.batch_size:
                    continue
                batches.append(chunk)
        if self.shuffle:
            rng.shuffle(batches)
        return iter(batches)


class InfiniteLoader:
    """Endless cycling iterator (the trainer's cycle(), CTCLIPTrainer.py:393)."""

    def __init__(self, loader: Loader):
        self.loader = loader
        self._it = iter(loader)

    def __next__(self) -> Dict:
        for _ in range(2):
            try:
                return next(self._it)
            except StopIteration:
                self._it = iter(self.loader)
        raise RuntimeError(
            "loader yields no batches — dataset smaller than batch_size with "
            "drop_last (len(dataset)="
            f"{len(self.loader.dataset)}, batch_size={self.loader.batch_size})"
        )

    def __iter__(self):
        return self
