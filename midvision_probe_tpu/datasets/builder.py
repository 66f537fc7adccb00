"""Loader builder (reference ``evals/datasets/builder.py:39-67``).

TPU-first design: one host process feeds the whole mesh (single-controller
JAX), so the ``DistributedSampler`` machinery collapses to a per-host shard
slice. The loader yields stacked numpy batches; device placement/sharding
happens in the engine (``parallel.shard_batch``). A small thread prefetcher
overlaps host IO with device compute (the reference disabled workers
entirely, ``builder.py:54``).
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Iterator

import numpy as np

from midvision_probe_tpu.config import instantiate


class Loader:
    def __init__(self, dataset, batch_size: int, shuffle: bool = False,
                 drop_last: bool = False, seed: int = 0,
                 num_shards: int = 1, shard_index: int = 0,
                 prefetch: int = 2, shuffle_batch_order: bool = False):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        if num_shards is None:
            num_shards = 1
        if shard_index is None:
            if num_shards > 1:
                # idx[None::k] silently resolves to shard 0 on EVERY host —
                # all processes would train on identical data with no error
                raise ValueError("shard_index is required when num_shards>1")
            shard_index = 0
        self.num_shards = num_shards
        self.shard_index = shard_index
        self.prefetch = prefetch
        # Epoch-seeded permutation of batch ORDER with batch COMPOSITION
        # fixed: restores the reference's per-epoch reshuffling
        # (``sampler.set_epoch``, ``train_depth.py:94-95``) for the
        # feature-cache path, where sample-level shuffling would serve
        # stale cached features. Each batch carries a stable ``_batch_id``
        # so the engine keys its cache on identity, not arrival order.
        self.shuffle_batch_order = shuffle_batch_order
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        """Reshuffle per epoch (``sampler.set_epoch``,
        ``train_depth.py:94-95``)."""
        self.epoch = epoch

    def _indices(self) -> tuple[np.ndarray, np.ndarray]:
        """This shard's dataset indices plus a per-position validity mask.

        Positions marked invalid are WRAPPED REPEATS added so every shard
        has equal length — like the reference's DistributedSampler
        (total_size = ceil(n/k)*k); unequal shards make hosts disagree on
        batches-per-epoch and hang the gradient all-reduce on the host
        that runs an extra step. For training this matches the reference's
        duplicate-sample semantics; for evaluation the duplicates must NOT
        be double-counted (the reference builds its test loader UNSHARDED,
        ``train_depth.py:559`` num_gpus=1), so the mask is surfaced to
        ``validate`` as ``batch["_valid"]``."""
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self.epoch)
            rng.shuffle(idx)
        valid = np.ones(n, bool)
        if self.num_shards > 1 and n % self.num_shards:
            total = ((n // self.num_shards) + 1) * self.num_shards
            idx = np.resize(idx, total)
            valid = np.resize(valid, total)
            valid[n:] = False
        return (idx[self.shard_index:: self.num_shards],
                valid[self.shard_index:: self.num_shards])

    def __len__(self) -> int:
        n = len(self._indices()[0])
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self) -> Iterator[dict]:
        idx, valid = self._indices()
        # key presence must agree across HOSTS (shard 0 may hold no wraps
        # while shard k-1 does), so gate on global padding, not this shard's
        padded = (self.num_shards > 1
                  and len(self.dataset) % self.num_shards != 0)
        nb = len(self)
        order = np.arange(nb)
        if self.shuffle_batch_order:
            rng = np.random.RandomState(self.seed + 7919 * (self.epoch + 1))
            rng.shuffle(order)

        stop = threading.Event()

        def _put(q: queue.Queue, item) -> bool:
            # bounded put that gives up when the consumer abandoned the
            # iterator (otherwise the producer blocks on the full queue
            # forever, pinning prefetched batches and reading the dataset
            # concurrently with the next epoch's own producer)
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def produce(q: queue.Queue):
            try:
                for b in order:
                    lo, hi = b * self.batch_size, (b + 1) * self.batch_size
                    items = [self.dataset[int(i)] for i in idx[lo:hi]]
                    batch = _stack(items)
                    if padded:
                        batch["_valid"] = valid[lo:hi].copy()
                    if self.shuffle_batch_order:
                        batch["_batch_id"] = int(b)
                    if not _put(q, batch):
                        return
                _put(q, None)
            except BaseException as e:  # propagate into consumer
                _put(q, e)

        q: queue.Queue = queue.Queue(maxsize=max(self.prefetch, 1))
        t = threading.Thread(target=produce, args=(q,), daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()


def _stack(items: list[dict]) -> dict:
    out: dict[str, Any] = {}
    for k in items[0]:
        vals = [it[k] for it in items]
        if isinstance(vals[0], np.ndarray) or np.isscalar(vals[0]):
            out[k] = np.stack(vals)
        else:
            out[k] = vals
    return out


def build_loader(
    dataset_cfg,
    split: str,
    batch_size: int,
    num_shards: int = 1,
    shard_index: int = 0,
    pair_dataset: bool = False,
    shuffle: bool | None = None,
    seed: int = 0,
    shuffle_batch_order: bool = False,
) -> Loader:
    """Instantiate the dataset from config and wrap it (``builder.py:39-67``).

    ``num_shards``/``shard_index`` correspond to multi-host data sharding
    (the reference's per-rank DistributedSampler, ``builder.py:50-52``).
    """
    kwargs = {"split": split}
    if pair_dataset:
        kwargs["pair_dataset"] = True
    dataset = instantiate(dataset_cfg, **kwargs)
    is_train = "train" in split
    return Loader(
        dataset,
        batch_size=batch_size,
        shuffle=is_train if shuffle is None else shuffle,
        drop_last=is_train,
        seed=seed,
        num_shards=num_shards,
        shard_index=shard_index,
        shuffle_batch_order=shuffle_batch_order,
    )
