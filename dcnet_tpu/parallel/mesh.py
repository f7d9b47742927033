"""Device mesh and sharding layout.

The reference's only parallelism is data parallel via NCCL DDP +
DistributedSampler (`/root/reference/train_DCNet.py:382,467-483`; SURVEY.md
§2 "parallelism"). TPU-native replacement: a 1-D `Mesh(('data',))` over ICI;
the train step is jitted with the batch sharded on 'data' and the state
replicated, and XLA emits the gradient all-reduce. Multi-host runs add
`jax.distributed.initialize` + per-host input sharding (data pipeline side).

A second optional 'model' axis is reserved for sharding the co-attention /
location-Gram matmuls in future tensor-parallel configs.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    devs = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(devs, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def place_host_batch(sharding: NamedSharding, v):
    """Place one host array under `sharding`. Multi-process: each host holds
    its process-local slice of the global batch (fed by
    batch_iterator(num_shards=process_count, shard_index=process_index) —
    the DistributedSampler analog), assembled into one global array over
    ICI/DCN."""
    if jax.process_count() > 1:
        return jax.make_array_from_process_local_data(sharding, np.asarray(v))
    return jax.device_put(v, sharding)


def shard_batch(mesh: Mesh, batch: Dict) -> Dict:
    """Place host arrays with the batch axis sharded over 'data'
    (the DistributedSampler equivalent)."""
    sh = batch_sharding(mesh)
    return {k: place_host_batch(sh, v) for k, v in batch.items()}


def replicate_state(mesh: Mesh, tree):
    return jax.device_put(tree, replicated(mesh))
