import os, time, json
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax, jax.numpy as jnp, numpy as np
from mintime_tpu.config import load_config, MintimeConfig
from mintime_tpu.models.classifier import MintimeVideoClassifier
from mintime_tpu.parallel.mesh import make_mesh, shard_batch
from mintime_tpu.train import create_train_state, jit_steps
from mintime_tpu.utils.profiling import trace, op_stats, sync
from __graft_entry__ import _example_batch

full = load_config("configs/size_invariant_timesformer.yaml")
mcfg = type(full.model)(**{**full.model.__dict__, "channels": 1280})
cfg = MintimeConfig(model=mcfg, training=full.training)
bs = cfg.training.bs
batch = _example_batch(bs, mcfg)
mesh = make_mesh(jax.devices()[:1])
model = MintimeVideoClassifier(mcfg, backbone="efficientnet-b0", head="timesformer",
                               dtype=jnp.bfloat16, use_pallas=True)
state = create_train_state(jax.random.key(0), model, batch, cfg)
with jax.set_mesh(mesh):
    train_step, _ = jit_steps(model, mesh, pos_weight=0.8)
    sb = shard_batch(mesh, batch)
    rng = jax.random.key(1)
    state, m = train_step(state, sb, rng); sync(m)
    with trace("/tmp/jax-trace-train") as td:
        for _ in range(5):
            state, m = train_step(state, sb, rng)
        sync(m)
    for o in op_stats(td, top=25):
        print(f"{o['self_ms']:8.2f} ms {o['type'][:28]:28s} {str(o['bound_by'])[:10]:10s} flops={o['flop_rate_gs']} bw={o['bw_gbs']} {o['name'][:70]}")
