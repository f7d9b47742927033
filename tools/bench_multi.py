"""Run several bench.py configs in ONE process.

Motivation (round 4, recycled VM): axon device discovery costs ~5.3 min
per process, so a 20-run queue of separate `python bench.py` invocations
pays ~1.8 h of pure init. Calling bench.main() repeatedly in one process
pays it once, keeps A/B pairs truly adjacent (same process, seconds
apart), and shares both the in-memory jit cache and the persistent
compilation cache (.jax_cache).

Each config's one-line JSON result appends to BENCH_RAW (which is
COMMITTED, unlike logs/), with the full stdout+stderr in
logs/bench_<name>.out.

OOM isolation (round 5, after the queue-K cascade): a config that dies
with RESOURCE_EXHAUSTED used to leave the TPU allocator wedged, so the
remaining queue failed in 1-2 s at device_put while the run still
printed "DONE". Now every config (error or not) is followed by a
device-health gate: delete all live device arrays, clear jit caches,
and run a tiny device_put+fetch probe. If the probe fails, the queue
ABORTS LOUDLY instead of burning the tail.

Usage: python tools/bench_multi.py [name ...]   # default: all configs
"""
import contextlib
import io
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench  # noqa: E402  (triggers jax + axon init once)

RAW = "BENCH_RAW_r5.md"
VMEM = "xla_tpu_scoped_vmem_limit_kib="

CONFIGS = [
    # serving control (round-5 default: split_corr OFF for serving) and the
    # three verdict-#1 probes, each a same-process adjacent A/B vs ctrl
    ("serving_ctrl", ["--serving", "--quant"]),
    ("serving_multiref", ["--serving", "--quant", "--coattn_multiref"]),
    ("serving_int8only", ["--serving", "--quant", "--coattn_int8"]),
    ("serving_int8rings", ["--serving", "--quant", "--int8_rings"]),
    ("serving_multiref_int8rings",
     ["--serving", "--quant", "--coattn_multiref", "--int8_rings"]),
    # offline eval: does the multi-ref kernel help the batched path too?
    ("eval_ctrl", []),
    ("eval_multiref", ["--coattn_multiref"]),
    # verdict #4: device traces of the two train sweet spots
    ("trace_train_k8b16",
     ["--train", "--frames", "8", "--clips", "16", "--trace"]),
    ("trace_train_k2b64", ["--train", "--clips", "64", "--trace"]),
    # queue-K tail lost to the round-4 OOM cascade (verdict #2)
    ("train_k4b32_default", ["--train", "--frames", "4", "--clips", "32"]),
    ("train_k4b32_vmem64",
     ["--train", "--frames", "4", "--clips", "32",
      "--xla_opt", VMEM + "65536"]),
    # stream-count saturation probes (OOM-risky: run LAST)
    ("serving_s100", ["--serving", "--quant", "--clips", "20"]),
    ("serving_s120", ["--serving", "--quant", "--clips", "24"]),
    # device trace of the serving step — corr-stage evidence (added after
    # the round-5 queue launched; runs via a named follow-up invocation)
    ("trace_serving", ["--serving", "--quant", "--trace"]),
    # clean re-run: the first eval_multiref was contaminated by a stray
    # foreground TPU job in its window (BENCH_RAW_r5.md note, 17:20)
    ("eval_multiref2", ["--coattn_multiref"]),
    # k8b16 sits at 4.93x (985.5 f/s, trace-verified device-bound) — the
    # VMEM bracket was only ever run on k2b64 (neutral); probe k8
    ("train_k8b16_vmem64",
     ["--train", "--frames", "8", "--clips", "16",
      "--xla_opt", VMEM + "65536"]),
    ("train_k8b16_vmem96",
     ["--train", "--frames", "8", "--clips", "16",
      "--xla_opt", VMEM + "98304"]),
    # throughput was still RISING at 120 streams (3,082.5 = 5.14x, +4.2%
    # over s100) — push to 160 to find the actual saturation knee
    ("serving_s160", ["--serving", "--quant", "--clips", "32"]),
    # eval headline probe: b64 = 6,392.9, b80 OOMed (backbone conv at 400
    # frames) — b72 (360 frames) may fit and squeeze out the last batching
    # economy. s140 = fallback knee point if s160 OOMs.
    ("eval_b72", ["--clips", "72"]),
    ("serving_s140", ["--serving", "--quant", "--clips", "28"]),
    # round-5 serving trace: clamp_convert (quantize-edge) fusions are
    # ~28% of the 27 ms step — re-probe the int8 activation chain on
    # serving (round-3 "neutral" verdict predates bf16 rotating rings)
    # --clips 16 = 80 streams: keeps this adjacent-comparable to
    # serving_ctrl/trace_serving (2,940-2,952) now that the serving
    # default moved to 24 clips / 120 streams
    ("serving_chain",
     ["--serving", "--quant", "--clips", "16", "--int8_chain"]),
    ("serving_s120_chain",
     ["--serving", "--quant", "--clips", "24", "--int8_chain"]),
    # same-process 80-stream ctrl for the chain A/B above
    ("serving_ctrl2", ["--serving", "--quant", "--clips", "16"]),
    # Final train lever (round 5 tail): every measured train config uses
    # exactly 128 frames/step (k2b64 / k4b32 / k8b16) — the pixel-budget
    # axis itself was never probed. k8b20 = 160 frames, k8b24 = 192.
    # The k8b16 trace says device-bound/no host gaps, which predicts
    # NEUTRAL per-frame — this measures it. ctrl3 re-anchors k8b16 on
    # this VM (cross-VM variance rule); b24 is the OOM-riskiest, LAST.
    ("train_k8b16_ctrl3", ["--train", "--frames", "8", "--clips", "16"]),
    ("train_k8b20", ["--train", "--frames", "8", "--clips", "20"]),
    ("train_k8b24", ["--train", "--frames", "8", "--clips", "24"]),
]


def _device_health_gate():
    """Free everything a dead (or finished) config left on device and
    prove the allocator still works. Raises if the device is wedged."""
    import jax
    import jax.numpy as jnp

    for x in jax.live_arrays():
        try:
            x.delete()
        except Exception:
            pass
    jax.clear_caches()
    probe = jax.device_put(jnp.ones((8, 128), jnp.float32))
    assert float(probe.sum()) == 8 * 128
    probe.delete()


def run(name, argv):
    t0 = time.time()
    with open(RAW, "a") as f:
        f.write(f"=== {name}: {' '.join(argv)} {time.strftime('%H:%M:%S')}\n")
    buf = io.StringIO()
    sys.argv = ["bench.py"] + list(argv)
    err = None
    try:
        with contextlib.redirect_stdout(buf), contextlib.redirect_stderr(buf):
            bench.main()
    except SystemExit as e:
        if e.code not in (None, 0):
            err = f"SystemExit({e.code})\n" + buf.getvalue()[-2000:]
    except Exception:
        err = traceback.format_exc()
    out = buf.getvalue()
    os.makedirs("logs", exist_ok=True)
    with open(f"logs/bench_{name}.out", "w") as f:
        f.write(out + ("\n" + err if err else ""))
    dt = time.time() - t0
    lines = [ln for ln in out.splitlines() if ln.strip()]
    result = next((ln for ln in lines if '"metric"' in ln),
                  lines[-1] if lines else "(no output)")
    with open(RAW, "a") as f:
        if err:
            f.write(f"ERROR ({dt:.0f}s): {err.strip().splitlines()[-1]}\n")
        elif "breakdown" in name or "trace" in name:
            # the stage table is the result — keep all of it in the
            # committed file, not just the JSON line
            f.write(out + f"({dt:.0f}s)\n")
        else:
            f.write(f"({dt:.0f}s) {result}\n")
    print(f"[bench_multi] {name} done in {dt:.0f}s", file=sys.stderr)
    return err


def main():
    only = sys.argv[1:]
    by_name = dict(CONFIGS)
    if only:
        # honor the command-line order: OOM-risky configs can be
        # sequenced LAST so an abort doesn't swallow the rest (eval_b72
        # ran first out of registry order and did exactly that)
        todo = [(n, by_name[n]) for n in only]
    else:
        todo = CONFIGS
    for name, argv in todo:
        err = run(name, argv)
        try:
            _device_health_gate()
        except Exception:
            with open(RAW, "a") as f:
                f.write(f"ABORT after {name}: device wedged "
                        f"({traceback.format_exc().strip().splitlines()[-1]})"
                        " — remaining configs NOT run\n")
            print(f"[bench_multi] ABORT: device wedged after {name}",
                  file=sys.stderr)
            sys.exit(1)
        if err:
            print(f"[bench_multi] {name} ERRORED (device recovered, "
                  "continuing)", file=sys.stderr)
    with open(RAW, "a") as f:
        f.write(f"MULTI RUN DONE {time.strftime('%H:%M:%S')}\n")


if __name__ == "__main__":
    main()
