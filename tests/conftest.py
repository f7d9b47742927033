"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the "fake backend" the reference lacks (SURVEY.md §4): multi-chip
sharding is validated on host CPU via XLA's device-count override.

Note: this environment's axon sitecustomize force-sets
jax.config.jax_platforms='axon,cpu' at interpreter start (overriding the
JAX_PLATFORMS env var), so we must update the config back to 'cpu' after
importing jax — before any backend initializes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices():
    devs = jax.devices()
    assert len(devs) == 8, f"expected 8 virtual cpu devices, got {devs}"
    return devs


# ---------------------------------------------------------------------------
# Accuracy-lock materialization (round-5 verdict #5): the full trained locks
# (saved_models/converge32b*) are gitignored and die with each VM recycle.
# The tiny twins are committed as tests/locks/*.npz and rehydrate here in
# seconds, so at least one accuracy regression stays armed on a fresh VM.
# ---------------------------------------------------------------------------

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def materialize_synthetic32() -> None:
    """Regenerate the byte-deterministic (seed 13) lock corpus if absent —
    a few seconds; byte identity is itself locked by
    test_make_converge32_regenerates_dataset."""
    root = os.path.join(_REPO, "data", "synthetic32")
    if os.path.exists(os.path.join(root, "VID_video_level_test.json")):
        return
    from dcnet_tpu.data.synthetic import generate_synthetic_vid

    for split in ("train", "test"):
        generate_synthetic_vid(root, split, num_videos=32,
                               frames_per_video=8, seed=13)


def _lock_names(bert: bool):
    full = "converge32bert" if bert else "converge32b"
    tiny = "converge32tinybert" if bert else "converge32tiny"
    return full, tiny


def lock_available(bert: bool = False) -> bool:
    """Usable in skipif: true when a lock artifact exists or the committed
    tiny npz can rehydrate one."""
    full, tiny = _lock_names(bert)
    return any((
        os.path.exists(os.path.join(_REPO, "saved_models", full)),
        os.path.exists(os.path.join(_REPO, "saved_models", tiny)),
        os.path.exists(os.path.join(_REPO, "tests", "locks",
                                    f"{tiny}.npz")),
    ))


def ensure_lock(bert: bool = False):
    """Return (resume_dir, extra_argv) for the lock tests. Prefers the full
    TPU-trained artifact; otherwise rehydrates the committed tiny lock
    (emb/hidden 256 — the extra argv selects that geometry)."""
    materialize_synthetic32()
    full, tiny = _lock_names(bert)
    full_dir = os.path.join(_REPO, "saved_models", full)
    if os.path.exists(full_dir):
        return full_dir, []
    tiny_dir = os.path.join(_REPO, "saved_models", tiny)
    extra = ["--emb_size", "256", "--lstm_hidden", "256"]
    if os.path.exists(tiny_dir):
        return tiny_dir, extra
    import sys
    sys.path.insert(0, os.path.join(_REPO, "tools"))
    try:
        from lock_pack import unpack
    finally:
        sys.path.pop(0)
    cwd = os.getcwd()
    os.chdir(_REPO)
    try:
        unpack(tiny, bert)
    finally:
        os.chdir(cwd)
    return tiny_dir, extra
