"""Tracing / profiling utilities (SURVEY.md §5.1 — absent in the reference,
which only does wall-clock ETA math, train.py:333,384-391).

* :func:`trace` — context manager around ``jax.profiler`` writing a
  TensorBoard-loadable trace directory.
* :class:`StepTimer` — steps/sec and videos/sec counters with tunnel-aware
  synchronization (on the axon TPU tunnel ``block_until_ready`` does not
  block; only output fetches do — see bench.py).
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace"):
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


@dataclass
class StepTimer:
    """Rolling step-time / throughput counter."""

    batch_size: int = 1
    _t0: float = field(default_factory=time.perf_counter)
    _steps: int = 0

    def step(self, n: int = 1):
        self._steps += n

    @property
    def steps_per_sec(self) -> float:
        dt = time.perf_counter() - self._t0
        return self._steps / dt if dt > 0 else 0.0

    @property
    def videos_per_sec(self) -> float:
        return self.steps_per_sec * self.batch_size

    def reset(self):
        self._t0 = time.perf_counter()
        self._steps = 0


def sync(x):
    """Force true device completion by fetching output bytes (the tunnel's
    ``block_until_ready`` is fire-and-forget)."""
    import jax
    import numpy as np

    leaves = jax.tree.leaves(x)
    if leaves:
        np.asarray(leaves[0])
    return x


def op_stats(trace_dir: str, top: int = 20) -> list[dict]:
    """Per-op device time from a :func:`trace` capture, via xprof.

    Returns the ``top`` ops by total self-time as dicts with keys
    ``name``, ``type``, ``self_ms``, ``flop_rate_gs``, ``bw_gbs``,
    ``bound_by`` — the tool that found the depthwise-conv and
    attention-layout bottlenecks documented in PARITY.md. Requires the
    ``xprof``/``tensorboard_plugin_profile`` package (baked in this image);
    raises ImportError otherwise.
    """
    import glob
    import json

    from xprof.convert import raw_to_tool_data as r2t

    files = glob.glob(f"{trace_dir}/plugins/profile/*/*.xplane.pb")
    if not files:
        raise FileNotFoundError(f"no .xplane.pb under {trace_dir}")
    # a reused trace_dir accumulates one subdir per capture; mixing runs
    # makes the converter bail — keep only the newest capture
    newest = max(f.rsplit("/", 2)[1] for f in files)
    files = [f for f in files if f.rsplit("/", 2)[1] == newest]
    data, _ = r2t.xspace_to_tool_data(files, "framework_op_stats", {})
    d = json.loads(data.decode() if isinstance(data, bytes) else data)
    table = d[0] if isinstance(d, list) else d
    cols = [c["label"] for c in table["cols"]]
    idx = {label: i for i, label in enumerate(cols)}
    def col(c, label):
        i = idx.get(label)
        return c[i] if i is not None else None

    out = []
    for r in table["rows"]:
        c = [x.get("v") for x in r["c"]]
        out.append(
            {
                "name": c[idx["Operation Name"]],
                "type": c[idx["Operation Type"]],
                "self_ms": (c[idx["Total self-time (us)"]] or 0) / 1e3,
                "flop_rate_gs": col(c, "Model FLOP Rate (GFLOP/s)"),
                "bw_gbs": col(c, "Measured Memory BW (GBytes/Sec)"),
                "bound_by": col(c, "Bound by"),
            }
        )
    out.sort(key=lambda o: -o["self_ms"])
    return out[:top]


def _example_inputs(cfg, batch: int):
    """Fixed-shape random inputs at the config's flagship shapes (the same
    contract the data layer produces — see __graft_entry__._example_batch)."""
    import numpy as np

    F, n = cfg.num_frames, cfg.num_patches
    rng = np.random.default_rng(0)
    frames = rng.standard_normal(
        (batch, F, cfg.image_size, cfg.image_size, 3)
    ).astype(np.float32)
    mask = np.ones((batch, F), bool)
    id_mask = np.ones((batch, F, F), bool)
    size_emb = rng.integers(1, 21, size=(batch, F)).astype(np.int32)
    # (B, 1 + F·n): 0 = CLS, then each frame's n patch tokens share the
    # frame's temporal rank (models/timesformer.py:262,304-306)
    positions = np.concatenate(
        [[0], np.repeat(np.arange(1, F + 1), n)]
    ).astype(np.int32)
    positions = np.tile(positions, (batch, 1))
    return frames, mask, id_mask, size_emb, positions


def main(argv=None):
    """``python -m mintime_tpu.utils.profiling`` — trace N jitted forwards
    of a zoo variant and print the per-op device-time table (the tool that
    found the depthwise-conv, attention-layout, and MXU-issue bottlenecks
    documented in README/PARITY). The per-op table needs a TPU backend;
    on CPU the trace is still written for TensorBoard but the framework-op
    stats come back empty and a note is printed instead.
    """
    import argparse

    p = argparse.ArgumentParser("mintime-tpu profiler")
    p.add_argument("--config", default="configs/size_invariant_timesformer.yaml")
    p.add_argument("--model", type=int, default=1,
                   help="0 baseline | 1 timesformer | 2 slowfast | 3 conv")
    p.add_argument("--extractor_model", type=int, default=0)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--top", type=int, default=25)
    p.add_argument("--trace_dir", default="/tmp/mintime-trace")
    p.add_argument("--fused_attention", type=int, choices=(0, 1), default=None)
    p.add_argument("--grad", action="store_true", default=False,
                   help="profile forward+backward (grad of sum-of-logits "
                        "through the custom_vjp kernels) instead of the "
                        "forward alone. NOTE: the wrapper's per-leaf grad "
                        "reductions show up as a harness-only reduce_sum "
                        "row; prefer --train for step-true accounting")
    p.add_argument("--train", action="store_true", default=False,
                   help="profile the REAL jitted train step "
                        "(train.make_train_step: fwd + bwd through the "
                        "custom_vjp kernels + BN stats + optimizer update), "
                        "models 0/1 only")
    opt = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from mintime_tpu.config import load_config

    cfg = load_config(opt.config).model
    fused = opt.fused_attention
    if fused is None:
        fused = jax.default_backend() == "tpu"

    if opt.model == 2:
        from mintime_tpu.models.slowfast import SlowFastClassifier

        model = SlowFastClassifier(num_classes=cfg.num_classes, dtype=jnp.bfloat16)
        frames = _example_inputs(cfg, opt.batch)[0]
        args = (frames,)
    elif opt.model == 3:
        from mintime_tpu.models.conv_timesformer import ConvolutionalTimeSformer

        model = ConvolutionalTimeSformer(
            cfg, dtype=jnp.bfloat16, use_pallas=bool(fused)
        )
        frames, mask, _, size_emb, _ = _example_inputs(cfg, opt.batch)
        args = (frames, mask, size_emb)
    else:
        from mintime_tpu.models.classifier import MintimeVideoClassifier

        cfg = type(cfg)(**{**cfg.__dict__, "channels": 1280})
        model = MintimeVideoClassifier(
            cfg,
            backbone="efficientnet-b0" if opt.extractor_model == 0 else "xception",
            head="baseline" if opt.model == 0 else "timesformer",
            dtype=jnp.bfloat16,
            use_pallas=bool(fused) and opt.model == 1,
        )
        args = _example_inputs(cfg, opt.batch)

    if opt.train:
        if opt.model not in (0, 1):
            p.error("--train supports models 0 (baseline) / 1 (timesformer)")
        from mintime_tpu.config import MintimeConfig
        from mintime_tpu.parallel.mesh import make_mesh
        from mintime_tpu.train import create_train_state, jit_steps

        names = ("frames", "mask", "identities_mask", "size_embedding",
                 "positions")
        batch = dict(zip(names, _example_inputs(cfg, opt.batch)))
        batch["labels"] = np.random.default_rng(1).integers(
            0, 2, size=(opt.batch,)
        ).astype(np.float32)
        batch = {k: jax.device_put(v) for k, v in batch.items()}
        state = create_train_state(
            jax.random.key(0), model, batch, MintimeConfig(model=cfg)
        )
        rng = jax.random.key(1)
        mesh = make_mesh(jax.devices()[:1])
        with jax.set_mesh(mesh):
            train_step, _ = jit_steps(model, mesh, pos_weight=0.8)
            state, m = train_step(state, batch, rng)
            sync(m)  # compile / warm up outside the trace
            t0 = time.perf_counter()
            with trace(opt.trace_dir) as td:
                for _ in range(opt.iters):
                    state, m = train_step(state, batch, rng)
                sync(m)
            dt = time.perf_counter() - t0
        print(f"{opt.iters} x batch {opt.batch} train step: "
              f"{opt.batch * opt.iters / dt:.1f} videos/s (trace: {td})")
        _print_op_table(td, opt)
        return

    args = tuple(jax.device_put(a) for a in args)
    variables = jax.device_put(jax.jit(model.init)(jax.random.key(0), *args))
    if opt.grad:
        def _loss(v, *a):
            out = model.apply(v, *a)
            return jnp.sum(out.astype(jnp.float32) ** 2)

        g = jax.jit(jax.grad(_loss))
        fwd = jax.jit(
            lambda v, *a: jax.tree.map(lambda t: t.astype(jnp.float32).sum(),
                                       g(v, *a))
        )
    else:
        fwd = jax.jit(lambda v, *a: model.apply(v, *a))
    sync(fwd(variables, *args))  # compile / warm up outside the trace
    t0 = time.perf_counter()
    with trace(opt.trace_dir) as td:
        for _ in range(opt.iters):
            out = fwd(variables, *args)
        sync(out)
    dt = time.perf_counter() - t0
    what = "fwd+bwd" if opt.grad else "forward"
    print(f"{opt.iters} x batch {opt.batch} {what}: "
          f"{opt.batch * opt.iters / dt:.1f} videos/s (trace: {td})")
    _print_op_table(td, opt)


def _print_op_table(trace_dir: str, opt):
    """Top-N per-op rows plus two aggregates: by op type, and by graph
    section (fwd / bwd / optimizer-or-harness) inferred from the XLA
    metadata path — ``transpose(jvp(...))`` ops are the backward,
    ``jvp(...)`` without transpose the forward, a custom_vjp
    ``pallas_call`` is classified by its fwd/bwd kernel name, and
    everything outside the loss (optimizer update, harness reductions)
    lands in 'other'."""
    try:
        rows = [r for r in op_stats(trace_dir, top=10 ** 6)
                if r["type"] != "IDLE"]
    except Exception as e:  # xprof missing / malformed trace
        print(f"(op table unavailable: {e})")
        return
    if not any(r["self_ms"] for r in rows):
        print("(per-op device stats need a TPU backend; trace is still "
              "TensorBoard-loadable)")
        return
    for r in rows[:opt.top]:
        print(f"{r['self_ms'] / opt.iters:8.3f} ms/call  "
              f"{str(r['type'])[:24]:24} {str(r['bound_by'])[:10]:10} "
              f"{r['name'][:70]}")

    def section(r):
        name = r["name"] or ""
        if "_bwd" in name or "transpose(jvp" in name:
            return "bwd"
        if "jvp(" in name or "_fwd" in name:
            return "fwd"
        return "other"

    for key, label in ((section, "graph section"),
                       (lambda r: f"{section(r)}:{r['type']}",
                        "section:op-type")):
        agg, calls = {}, {}
        for r in rows:
            k = key(r)
            agg[k] = agg.get(k, 0.0) + r["self_ms"]
            calls[k] = calls.get(k, 0) + 1
        total = sum(agg.values())
        print(f"\n-- total device self-time by {label} "
              f"(of {total / opt.iters:.1f} ms/call) --")
        for k, ms in sorted(agg.items(), key=lambda kv: -kv[1])[:16]:
            print(f"{ms / opt.iters:8.3f} ms/call  {calls[k]:4d} ops  {k}")


if __name__ == "__main__":
    main()
