"""Run several bench.py configs in ONE process.

Motivation (round 4, recycled VM): axon device discovery costs ~5.3 min
per process, so a 20-run queue of separate `python bench.py` invocations
pays ~1.8 h of pure init. Calling bench.main() repeatedly in one process
pays it once, keeps A/B pairs truly adjacent (same process, seconds
apart), and shares both the in-memory jit cache and the persistent
compilation cache (.jax_cache).

Each config's one-line JSON result appends to BENCH_RAW_r4.md (which is
COMMITTED, unlike logs/), with the full stdout in logs/bench_<name>.out.

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

RAW = "BENCH_RAW_r4.md"
VMEM = "xla_tpu_scoped_vmem_limit_kib="

CONFIGS = [
    # queue I: adjacent split-corr serving pair (pairA may already have a
    # standalone-process result; rerun here for a same-process pair)
    ("serving_split_pairA", ["--serving", "--quant"]),
    ("serving_nosplit_pairB", ["--serving", "--quant", "--no_split_corr"]),
    # queue J: batched-ref + int8-logit co-attention A/Bs
    ("serving_batchrefs", ["--serving", "--quant", "--coattn_batch_refs"]),
    ("serving_batchrefs_int8",
     ["--serving", "--quant", "--coattn_batch_refs", "--coattn_int8"]),
    ("eval_ctrl", []),
    ("eval_batchrefs", ["--coattn_batch_refs"]),
    ("eval_batchrefs_int8", ["--coattn_batch_refs", "--coattn_int8"]),
    ("eval_int8only", ["--coattn_int8"]),
    # queue H: scoped-vmem lever on serving/eval + train brackets
    ("serving_vmem64", ["--serving", "--quant", "--xla_opt", VMEM + "65536"]),
    ("eval_vmem64", ["--xla_opt", VMEM + "65536"]),
    ("train_k2b64_vmem64",
     ["--train", "--clips", "64", "--xla_opt", VMEM + "65536"]),
    ("train_k2b64_default", ["--train", "--clips", "64"]),
    ("train_k8b16_vmem64",
     ["--train", "--frames", "8", "--clips", "16", "--xla_opt", VMEM + "65536"]),
    ("train_k2b64_vmem48m",
     ["--train", "--clips", "64", "--xla_opt", VMEM + "49152"]),
    ("train_k2b64_vmem96m",
     ["--train", "--clips", "64", "--xla_opt", VMEM + "98304"]),
    # queue I tail: corr/fusion serving breakdown
    ("serving_breakdown_corr", ["--serving", "--quant", "--serving_breakdown"]),
    # queue K: ceiling probes
    ("eval_b80", ["--clips", "80"]),
    ("eval_b96", ["--clips", "96"]),
    ("serving_s100", ["--serving", "--quant", "--clips", "20"]),
    ("serving_s120", ["--serving", "--quant", "--clips", "24"]),
    ("train_k4b32_vmem64",
     ["--train", "--frames", "4", "--clips", "32", "--xla_opt", VMEM + "65536"]),
    ("train_k4b32_default", ["--train", "--frames", "4", "--clips", "32"]),
]


def run(name, argv):
    t0 = time.time()
    with open(RAW, "a") as f:
        f.write(f"=== {name}: {' '.join(argv)} {time.strftime('%H:%M:%S')}\n")
    buf = io.StringIO()
    sys.argv = ["bench.py"] + list(argv)
    err = None
    try:
        with contextlib.redirect_stdout(buf):
            bench.main()
    except SystemExit:
        pass
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
        elif "breakdown" in name:
            # the stage table is the result — keep all of it in the
            # committed file, not just the JSON line
            f.write(out + f"({dt:.0f}s)\n")
        else:
            f.write(f"({dt:.0f}s) {result}\n")
    print(f"[bench_multi] {name} done in {dt:.0f}s", file=sys.stderr)


if __name__ == "__main__":
    only = sys.argv[1:]
    for name, argv in CONFIGS:
        if only and name not in only:
            continue
        run(name, argv)
    with open(RAW, "a") as f:
        f.write(f"MULTI RUN DONE {time.strftime('%H:%M:%S')}\n")
