"""Full-scale composition parity: real YOLOv3 backbone at 256x256.

The component tests cross-check the full backbone in isolation and the
composition at 64px with a mini backbone; this runs the COMPLETE flagship at
production shapes — 107-layer backbone, all_positions=1344, 8x8=64 coarse
patches, interframe_top_k=30 — against the torch reference mirror
(`tests/test_reference_bridge._RefModel`, exact reference module naming,
`/root/reference/model/test_DCNet_model.py:284-483` semantics at size 256).
Weights flow flax -> reference state_dict (export_reference_state_dict) ->
torch load_state_dict(strict=True), which also proves the bridge covers the
full-size model key-for-key.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow  # minutes-long 256px/bridge suites
import torch

from dcnet_tpu.config import DCNetConfig
from dcnet_tpu.models import DCNet
from dcnet_tpu.models.darknet import yolov3_layer_defs
from dcnet_tpu.models.dcnet import DCNet as DCNetCls
from dcnet_tpu.train.checkpoint import export_reference_state_dict
from tests.test_reference_bridge import _RefModel

CFG = DCNetConfig(image_size=256, corpus_size=100)


@pytest.fixture(scope="module")
def full_scale():
    assert CFG.all_positions == 1344 and CFG.interframe_top_k == 30
    model = DCNet(cfg=CFG)  # full yolov3 backbone
    rng = np.random.RandomState(0)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(2)},
        jnp.asarray(rng.rand(2, 256, 256, 3).astype(np.float32)),
        jnp.asarray(rng.randint(1, 100, (2, 20)).astype(np.int32)),
        train=False)

    sd = export_reference_state_dict(variables["params"],
                                     variables["batch_stats"])
    ref = _RefModel(CFG, defs=yolov3_layer_defs()).eval()
    # strict load proves the exported key set matches the reference's exactly
    ref.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
        strict=True)
    return model, variables, ref


def test_full_scale_eval_clip_parity(full_scale):
    model, variables, ref = full_scale
    rng = np.random.RandomState(1)
    n_frame = 5
    images = rng.rand(n_frame, 256, 256, 3).astype(np.float32)
    ids = rng.randint(1, 100, (1, 20)).astype(np.int32)
    ids[0, 14:] = 0

    with jax.default_matmul_precision("highest"):
        out = model.apply(variables, jnp.asarray(images), jnp.asarray(ids),
                          n_frame=n_frame, method=DCNetCls.eval_clip)
    with torch.no_grad():
        oracle = ref.eval_clip(
            torch.from_numpy(images.transpose(0, 3, 1, 2)),
            torch.from_numpy(ids.astype(np.int64)), n_frame)
    for s in range(3):
        got = np.asarray(out.outbox[s])
        want = oracle[s].numpy()
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=1e-3,
                                   err_msg=f"scale {s}")


def test_full_scale_train_forward_shapes(full_scale):
    """The 2-frame train forward composes at production shapes: top-k=30
    inter-frame pairs over the 64-patch coarse grid, 1344-position location
    branch, finite outputs end to end."""
    model, variables, _ = full_scale
    rng = np.random.RandomState(2)
    images = jnp.asarray(rng.rand(2, 256, 256, 3).astype(np.float32))
    ids = jnp.asarray(rng.randint(1, 100, (2, 20)).astype(np.int32))
    out = model.apply(
        variables, images, ids, train=True,
        rngs={"sampling": jax.random.PRNGKey(3),
              "dropout": jax.random.PRNGKey(4)},
        mutable=["batch_stats"])[0]
    assert out.interframe.q.shape[1] == 30
    assert out.outbox[0].shape == (2, 3, 5, 8, 8)
    assert out.outbox[2].shape == (2, 3, 5, 32, 32)
    for s in range(3):
        assert bool(jnp.all(jnp.isfinite(out.outbox[s])))
    assert bool(jnp.all(jnp.isfinite(out.interframe.q)))
