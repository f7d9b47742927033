"""Grain-backed input pipeline.

Production alternative to `data.vid.batch_iterator`: Grain gives
multiprocess decode workers, deterministic global shuffling, per-host
sharding, and checkpointable iterators — the industrial replacement for the
reference's `DataLoader(num_workers=16)` + `DistributedSampler`
(`/root/reference/train_DCNet.py:467-478`; SURVEY.md §7.7).

Works with any of our map-style datasets (VIDDataset / ReferItDataset),
which already satisfy Grain's RandomAccessDataSource protocol
(`__len__` + `__getitem__`).
"""

from __future__ import annotations

from typing import Dict, Iterator, Optional

import numpy as np

import grain.python as grain


def grain_loader(
    dataset,
    batch_size: int,
    shuffle: bool = False,
    seed: int = 0,
    num_epochs: Optional[int] = 1,
    num_workers: int = 0,
    num_shards: int = 1,
    shard_index: int = 0,
    drop_remainder: bool = True,
) -> Iterator[Dict[str, np.ndarray]]:
    """Yields collated numpy batches like `batch_iterator`, via Grain."""
    sampler = grain.IndexSampler(
        num_records=len(dataset),
        shuffle=shuffle,
        seed=seed,
        num_epochs=num_epochs,
        shard_options=grain.ShardOptions(
            shard_index=shard_index, shard_count=num_shards,
            drop_remainder=drop_remainder),
    )
    loader = grain.DataLoader(
        data_source=dataset,
        sampler=sampler,
        operations=[grain.Batch(batch_size=batch_size,
                                drop_remainder=drop_remainder)],
        worker_count=num_workers,
    )
    return iter(loader)
