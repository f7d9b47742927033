import time, json, numpy as np, jax, jax.numpy as jnp
from dcnet_tpu.config import DCNetConfig
from dcnet_tpu.models import DCNet
from dcnet_tpu.models.dcnet import DCNet as DCNetCls
cfg = DCNetConfig(image_size=256, corpus_size=1000, compute_dtype="bfloat16")
model = DCNet(cfg=cfg, dtype=jnp.bfloat16)
rng = np.random.RandomState(0)
clips, n_frame = 16, 5
images = jnp.asarray(rng.rand(clips*n_frame,256,256,3).astype(np.float32))
word_ids = jnp.asarray(rng.randint(1,1000,(clips,20)).astype(np.int32))
variables = model.init({"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)}, images[:2], word_ids[:1].repeat(2,axis=0), train=False)

def timed(fn, args, iters=30):
    carry = jnp.float32(0)
    def chain(c, *a):
        out = fn(*a, c)
        return out
    # warm
    o = fn(*args, carry); np.asarray(jax.tree_util.tree_leaves(o)[0][..., :1])
    def run(n):
        c = jnp.float32(0)
        o = None
        t0 = time.perf_counter()
        for _ in range(n):
            o = fn(*args, c)
            c = jax.tree_util.tree_leaves(o)[0].reshape(-1)[0].astype(jnp.float32)
        np.asarray(c)
        return time.perf_counter()-t0
    ns = max(iters//4,1)
    ts, tl = run(ns), run(iters)
    return (tl-ts)/(iters-ns)

@jax.jit
def backbone_only(imgs, c):
    f = model.apply(variables, imgs + c*0.0, method=DCNetCls.extract_features)
    return f[0]

t_bb = timed(backbone_only, (images,))
print(json.dumps({"backbone_only_ms": round(t_bb*1e3,2), "frames": clips*n_frame}))

@jax.jit
def full(imgs, wids, c):
    out = model.apply(variables, imgs + c*0.0, wids, n_frame=n_frame, method=DCNetCls.eval_clip)
    return out.outbox[0]

t_full = timed(full, (images, word_ids))
print(json.dumps({"full_eval_ms": round(t_full*1e3,2), "trunk_ms": round((t_full-t_bb)*1e3,2)}))
