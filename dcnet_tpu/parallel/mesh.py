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


def shard_batch(mesh: Mesh, batch: Dict) -> Dict:
    """Place host arrays with the batch axis sharded over 'data'
    (the DistributedSampler equivalent for a single host)."""
    sh = batch_sharding(mesh)
    return {k: jax.device_put(v, sh) for k, v in batch.items()}


def replicate_state(mesh: Mesh, tree):
    return jax.device_put(tree, replicated(mesh))
