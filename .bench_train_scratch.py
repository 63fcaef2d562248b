import os, time, sys
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax, jax.numpy as jnp, numpy as np
from mintime_tpu.config import load_config, MintimeConfig
from mintime_tpu.models.classifier import MintimeVideoClassifier
from mintime_tpu.parallel.mesh import make_mesh, shard_batch
from mintime_tpu.train import create_train_state, jit_steps
from __graft_entry__ import _example_batch

full = load_config("configs/size_invariant_timesformer.yaml")
mcfg = type(full.model)(**{**full.model.__dict__, "channels": 1280})
cfg = MintimeConfig(model=mcfg, training=full.training)
bs = cfg.training.bs
batch = _example_batch(bs, mcfg)
mesh = make_mesh(jax.devices()[:1])
for use_pallas in (False, True):
    model = MintimeVideoClassifier(mcfg, backbone="efficientnet-b0", head="timesformer",
                                   dtype=jnp.bfloat16, use_pallas=use_pallas)
    state = create_train_state(jax.random.key(0), model, batch, cfg)
    with jax.set_mesh(mesh):
        train_step, _ = jit_steps(model, mesh, pos_weight=0.8)
        sb = shard_batch(mesh, batch)
        rng = jax.random.key(1)
        t0 = time.perf_counter()
        state, m = train_step(state, sb, rng)
        _ = np.asarray(m["loss"])
        print(f"pallas={use_pallas} first step (compile) {time.perf_counter()-t0:.0f}s", flush=True)
        for N in (20, 50):
            t0 = time.perf_counter()
            for _ in range(N):
                state, m = train_step(state, sb, rng)
            _ = np.asarray(m["loss"])
            dt = (time.perf_counter() - t0) / N
            print(f"use_pallas={use_pallas} N={N}: {dt*1e3:.1f} ms/step, {bs/dt:.1f} videos/s", flush=True)
