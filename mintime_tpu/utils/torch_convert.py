"""Converters from the reference's PyTorch checkpoints to Flax param trees.

The reference saves plain ``state_dict``s (``train.py:460-464``,
``Model_checkpoint<epoch>`` / ``Extractor_checkpoint<epoch>``). These
functions map them onto our Flax modules so published MINTIME weights can be
served from the TPU framework. Torch is only needed when actually converting
(kept an optional import); the mapping itself operates on numpy arrays.

Conventions:
* torch ``nn.Linear.weight`` is ``(out, in)`` → flax Dense kernel ``(in, out)``
* torch ``nn.Embedding.weight`` rows are sliced to our right-sized tables
  (unused rows never receive gradient in the reference, so slicing is
  numerics-preserving; see models/timesformer.py docstring)
* torch conv weight ``(O, I, kh, kw)`` → flax ``(kh, kw, I, O)``
"""

from __future__ import annotations

from typing import Mapping

import numpy as np

from mintime_tpu.config import ModelConfig
from mintime_tpu.data.assembler import NUM_SIZE_BUCKETS


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def strip_prefixes(state_dict: Mapping[str, object], prefixes=("module.",)) -> dict:
    """Drop DataParallel-style prefixes (reference xception.py:242-272 loader)."""
    out = {}
    for k, v in state_dict.items():
        for p in prefixes:
            if k.startswith(p):
                k = k[len(p):]
        out[k] = v
    return out


def _linear(sd, name):
    return {"kernel": _np(sd[f"{name}.weight"]).T, "bias": _np(sd[f"{name}.bias"])}


def _linear_nobias(sd, name):
    return {"kernel": _np(sd[f"{name}.weight"]).T}


def _layernorm(sd, name):
    return {"scale": _np(sd[f"{name}.weight"]), "bias": _np(sd[f"{name}.bias"])}


def _conv(sd, name) -> dict:
    """torch conv (O, I, kh, kw) → flax {kernel (kh, kw, I, O)} (+bias).

    Depthwise convs (I==1 per group) transpose to (kh, kw, 1, O), which is
    exactly flax's ``feature_group_count`` layout.
    """
    out = {"kernel": _np(sd[f"{name}.weight"]).transpose(2, 3, 1, 0)}
    if f"{name}.bias" in sd:
        out["bias"] = _np(sd[f"{name}.bias"])
    return out


def _bn(sd, name):
    """Split a torch BatchNorm into flax params + batch_stats halves."""
    return (
        {"scale": _np(sd[f"{name}.weight"]), "bias": _np(sd[f"{name}.bias"])},
        {"mean": _np(sd[f"{name}.running_mean"]), "var": _np(sd[f"{name}.running_var"])},
    )


def efficientnet_params_from_torch(state_dict: Mapping[str, object], variant: str = "efficientnet-b0") -> dict:
    """Map the reference's vendored EfficientNet state_dict
    (models/efficientnet/efficientnet_pytorch/model.py:160-208:
    ``_conv_stem``/``_bn0``, ``_blocks.{i}._{expand,depthwise,project}_conv``
    + ``_bn{0,1,2}`` + ``_se_{reduce,expand}``, ``_conv_head``/``_bn1``) onto
    :class:`mintime_tpu.models.efficientnet.EfficientNet` variables."""
    from mintime_tpu.models.efficientnet import expand_blocks

    sd = strip_prefixes(state_dict, ("module.", "efficient_net."))
    params: dict = {}
    stats: dict = {}

    def put(name, conv=None, bnorm=None):
        if conv is not None:
            params[name] = conv
        if bnorm is not None:
            params[name], stats[name] = bnorm

    put("conv_stem", conv=_conv(sd, "_conv_stem"))
    put("bn_stem", bnorm=_bn(sd, "_bn0"))
    for i, ba in enumerate(expand_blocks(variant)):
        blk: dict = {}
        blk_stats: dict = {}
        if ba.expand != 1:
            blk["expand_conv"] = _conv(sd, f"_blocks.{i}._expand_conv")
            blk["bn0"], blk_stats["bn0"] = _bn(sd, f"_blocks.{i}._bn0")
        blk["depthwise_conv"] = _conv(sd, f"_blocks.{i}._depthwise_conv")
        blk["bn1"], blk_stats["bn1"] = _bn(sd, f"_blocks.{i}._bn1")
        blk["se_reduce"] = _conv(sd, f"_blocks.{i}._se_reduce")
        blk["se_expand"] = _conv(sd, f"_blocks.{i}._se_expand")
        blk["project_conv"] = _conv(sd, f"_blocks.{i}._project_conv")
        blk["bn2"], blk_stats["bn2"] = _bn(sd, f"_blocks.{i}._bn2")
        params[f"block_{i}"] = blk
        stats[f"block_{i}"] = blk_stats
    put("conv_head", conv=_conv(sd, "_conv_head"))
    put("bn_head", bnorm=_bn(sd, "_bn1"))
    return {"params": params, "batch_stats": stats}


def xception_params_from_torch(state_dict: Mapping[str, object]) -> dict:
    """Map the reference Xception state_dict (models/xception.py:82-155) onto
    :class:`mintime_tpu.models.xception.Xception` variables. Handles the
    torch ``nn.Sequential`` index layout of each block's ``rep`` list."""
    from mintime_tpu.models.xception import BLOCK_SPECS

    sd = strip_prefixes(state_dict)
    params: dict = {}
    stats: dict = {}

    def sep(name):
        return {
            "depthwise": _conv(sd, f"{name}.conv1"),
            "pointwise": _conv(sd, f"{name}.pointwise"),
        }

    params["conv1"] = _conv(sd, "conv1")
    params["bn1"], stats["bn1"] = _bn(sd, "bn1")
    params["conv2"] = _conv(sd, "conv2")
    params["bn2"], stats["bn2"] = _bn(sd, "bn2")
    for bi, (cin, cout, reps, stride, swr, gf) in enumerate(BLOCK_SPECS):
        blk: dict = {}
        blk_stats: dict = {}
        base = f"block{bi + 1}"
        off = 1 if swr else 0  # rep Sequential: [relu?] sep bn relu sep bn ...
        for i in range(reps):
            blk[f"sep_{i}"] = sep(f"{base}.rep.{3 * i + off}")
            blk[f"bn_{i}"], blk_stats[f"bn_{i}"] = _bn(sd, f"{base}.rep.{3 * i + off + 1}")
        if cout != cin or stride != 1:
            blk["skip_conv"] = _conv(sd, f"{base}.skip")
            blk["skip_bn"], blk_stats["skip_bn"] = _bn(sd, f"{base}.skipbn")
        params[f"block_{bi + 1}"] = blk
        stats[f"block_{bi + 1}"] = blk_stats
    params["conv3"] = sep("conv3")
    params["bn3"], stats["bn3"] = _bn(sd, "bn3")
    params["conv4"] = sep("conv4")
    params["bn4"], stats["bn4"] = _bn(sd, "bn4")
    return {"params": params, "batch_stats": stats}


def timesformer_params_from_torch(
    state_dict: Mapping[str, object], config: ModelConfig
) -> dict:
    """Map a reference ``SizeInvariantTimeSformer`` state_dict
    (models/size_invariant_timesformer.py:147-221) to our Flax params."""
    sd = strip_prefixes(state_dict)
    F, n = config.num_frames, config.num_patches
    params: dict = {
        "to_patch_embedding": _linear(sd, "to_patch_embedding"),
        "cls_token": _np(sd["cls_token"]),
        "pos_emb": {"embedding": _np(sd["pos_emb.weight"])[: 1 + F * n]},
        "out_norm": _layernorm(sd, "to_out.0"),
        "out_proj": _linear(sd, "to_out.1"),
    }
    if config.enable_size_emb:
        params["size_emb"] = {
            "embedding": _np(sd["size_emb.weight"])[: 1 + NUM_SIZE_BUCKETS]
        }
    for i in range(config.depth):
        # layers.{i}.{0,1,2} = PreNorm(time_attn), PreNorm(space_attn), PreNorm(ff)
        for j, kind in ((0, "time"), (1, "space")):
            base = f"layers.{i}.{j}"
            params[f"{kind}_norm_{i}"] = _layernorm(sd, f"{base}.norm")
            wq = _linear_nobias(sd, f"{base}.fn.to_qkv")["kernel"]  # (D, 3*H*dh)
            D_in = wq.shape[0]
            dh = config.dim_head
            H = config.heads
            # torch packs [q|k|v] each head-major; our layout is head-major
            # (H, [q|k|v], dh) so TP column shards are whole heads
            wq = (
                wq.reshape(D_in, 3, H, dh)
                .transpose(0, 2, 1, 3)
                .reshape(D_in, 3 * H * dh)
            )
            params[f"{kind}_attn_{i}"] = {
                "qkv_kernel": wq,
                "proj_kernel": _linear(sd, f"{base}.fn.to_out.0")["kernel"],
                "proj_bias": _np(sd[f"{base}.fn.to_out.0.bias"]),
            }
        base = f"layers.{i}.2"
        params[f"ff_norm_{i}"] = _layernorm(sd, f"{base}.norm")
        params[f"ff_{i}"] = {
            "Dense_0": _linear(sd, f"{base}.fn.net.0"),
            "Dense_1": _linear(sd, f"{base}.fn.net.3"),
        }
    return params


# ---------------------------------------------------------------------------
# Export: Flax params → the reference's torch state_dict format, so weights
# trained on TPU load straight into the PyTorch reference (the inverse of
# timesformer_params_from_torch; train.py:460-464 Model_checkpoint files).
# ---------------------------------------------------------------------------


def timesformer_params_to_torch(params, config: ModelConfig) -> dict:
    """Inverse of :func:`timesformer_params_from_torch`.

    Returns a numpy state_dict with the reference's key names and layouts:
    Linear weights transposed back to (out, in), qkv columns permuted from
    our head-major packing to torch's [q|k|v]-major, and the embedding
    tables zero-padded back to the reference's oversized
    ``num_frames * channels + 1`` rows (size_invariant_timesformer.py:174-180;
    the extra rows are never indexed, so zeros are behavior-identical).
    """
    F, n = config.num_frames, config.num_patches
    H, dh = config.heads, config.dim_head
    dim = config.dim
    ref_rows = config.num_frames * config.channels + 1

    def pad_rows(table):
        table = _np(table)
        out = np.zeros((max(ref_rows, table.shape[0]), table.shape[1]), table.dtype)
        out[: table.shape[0]] = table
        return out

    def linear(prefix, leaf):
        return {f"{prefix}.weight": _np(leaf["kernel"]).T,
                f"{prefix}.bias": _np(leaf["bias"])}

    def layernorm(prefix, leaf):
        return {f"{prefix}.weight": _np(leaf["scale"]),
                f"{prefix}.bias": _np(leaf["bias"])}

    sd: dict = {
        "cls_token": _np(params["cls_token"]),
        "pos_emb.weight": pad_rows(params["pos_emb"]["embedding"]),
        **linear("to_patch_embedding", params["to_patch_embedding"]),
        **layernorm("to_out.0", params["out_norm"]),
        **linear("to_out.1", params["out_proj"]),
    }
    if config.enable_size_emb and "size_emb" in params:
        sd["size_emb.weight"] = pad_rows(params["size_emb"]["embedding"])
    for i in range(config.depth):
        for j, kind in ((0, "time"), (1, "space")):
            base = f"layers.{i}.{j}"
            attn = params[f"{kind}_attn_{i}"]
            wq = _np(attn["qkv_kernel"])  # (D, H*3*dh) head-major
            D_in = wq.shape[0]
            wq = (
                wq.reshape(D_in, H, 3, dh)
                .transpose(0, 2, 1, 3)  # back to torch's [q|k|v] packing
                .reshape(D_in, 3 * H * dh)
            )
            sd[f"{base}.fn.to_qkv.weight"] = wq.T
            sd[f"{base}.fn.to_out.0.weight"] = _np(attn["proj_kernel"]).T
            sd[f"{base}.fn.to_out.0.bias"] = _np(attn["proj_bias"])
            sd.update(layernorm(f"{base}.norm", params[f"{kind}_norm_{i}"]))
        base = f"layers.{i}.2"
        sd.update(layernorm(f"{base}.norm", params[f"ff_norm_{i}"]))
        sd.update(linear(f"{base}.fn.net.0", params[f"ff_{i}"]["Dense_0"]))
        sd.update(linear(f"{base}.fn.net.3", params[f"ff_{i}"]["Dense_1"]))
    return sd


def efficientnet_params_to_torch(variables, variant: str = "efficientnet-b0") -> dict:
    """Inverse of :func:`efficientnet_params_from_torch` (reference
    Extractor_checkpoint format, keys ``_conv_stem``/``_blocks.{i}...``)."""
    from mintime_tpu.models.efficientnet import expand_blocks

    params = variables["params"]
    stats = variables.get("batch_stats", {})
    sd: dict = {}

    def conv(prefix, leaf):
        sd[f"{prefix}.weight"] = _np(leaf["kernel"]).transpose(3, 2, 0, 1)
        if "bias" in leaf:
            sd[f"{prefix}.bias"] = _np(leaf["bias"])

    def bn(prefix, pleaf, sleaf):
        sd[f"{prefix}.weight"] = _np(pleaf["scale"])
        sd[f"{prefix}.bias"] = _np(pleaf["bias"])
        sd[f"{prefix}.running_mean"] = _np(sleaf["mean"])
        sd[f"{prefix}.running_var"] = _np(sleaf["var"])

    conv("_conv_stem", params["conv_stem"])
    bn("_bn0", params["bn_stem"], stats["bn_stem"])
    for i, ba in enumerate(expand_blocks(variant)):
        blk, bst = params[f"block_{i}"], stats[f"block_{i}"]
        if ba.expand != 1:
            conv(f"_blocks.{i}._expand_conv", blk["expand_conv"])
            bn(f"_blocks.{i}._bn0", blk["bn0"], bst["bn0"])
        conv(f"_blocks.{i}._depthwise_conv", blk["depthwise_conv"])
        bn(f"_blocks.{i}._bn1", blk["bn1"], bst["bn1"])
        conv(f"_blocks.{i}._se_reduce", blk["se_reduce"])
        conv(f"_blocks.{i}._se_expand", blk["se_expand"])
        conv(f"_blocks.{i}._project_conv", blk["project_conv"])
        bn(f"_blocks.{i}._bn2", blk["bn2"], bst["bn2"])
    conv("_conv_head", params["conv_head"])
    bn("_bn1", params["bn_head"], stats["bn_head"])
    return sd


# ---------------------------------------------------------------------------
# SlowFast R-50 (pytorchvideo torch.hub checkpoint → models/slowfast.py)
# ---------------------------------------------------------------------------

# (blocks, slow_temporal) per res-stage — pytorchvideo slowfast_r50 defaults
# (stage depths (3,4,6,3); slow temporal conv only in res4/res5)
_SLOWFAST_STAGES = ((3, 1), (4, 1), (6, 3), (3, 3))


def slowfast_params_from_torch(state_dict: Mapping[str, object]) -> dict:
    """pytorchvideo ``slowfast_r50`` state_dict → :class:`SlowFastR50`
    variables ``{"params", "batch_stats"}``.

    Key schema (torch.hub facebookresearch/pytorchvideo slowfast_r50, the
    model the reference trains, train.py:143-147):

    * ``blocks.0.multipathway_blocks.{0|1}.{conv,norm}.*`` — slow/fast stems
    * ``blocks.{1..4}.multipathway_blocks.{0|1}.res_blocks.{j}.`` with
      ``branch1_{conv,norm}.*`` (downsample shortcut, first block only) and
      ``branch2.{conv,norm}_{a,b,c}.*`` (the bottleneck)
    * ``blocks.{0..3}.multipathway_fusion.{conv_fast_to_slow,norm}.*`` —
      lateral fast→slow fusion (none after res5)
    * ``blocks.5.proj.{weight,bias}`` — the head Linear (replaced with
      ``Linear(2304, num_classes)`` by the reference)

    Every key in the input must be consumed — unknown keys raise, so a
    schema drift in pytorchvideo is caught loudly instead of silently
    producing a half-loaded model.
    """
    sd = dict(strip_prefixes(state_dict))
    params: dict = {}
    stats: dict = {}
    used = set()

    def take(key):
        used.add(key)
        return _np(sd[key])

    def convbn(dst: tuple, conv_key: str, norm_key: str):
        node_p = params
        node_s = stats
        for part in dst[:-1]:
            node_p = node_p.setdefault(part, {})
            node_s = node_s.setdefault(part, {})
        node_p[dst[-1]] = {
            # torch (out, in, t, h, w) → flax (t, h, w, in, out)
            "conv": {"kernel": take(f"{conv_key}.weight").transpose(2, 3, 4, 1, 0)},
            "bn": {"scale": take(f"{norm_key}.weight"),
                   "bias": take(f"{norm_key}.bias")},
        }
        node_s[dst[-1]] = {
            "bn": {"mean": take(f"{norm_key}.running_mean"),
                   "var": take(f"{norm_key}.running_var")}
        }
        # num_batches_tracked has no flax counterpart
        used.add(f"{norm_key}.num_batches_tracked")

    for p, stem in ((0, "slow_stem"), (1, "fast_stem")):
        base = f"blocks.0.multipathway_blocks.{p}"
        convbn((stem,), f"{base}.conv", f"{base}.norm")
    convbn(("fuse_stem", "fuse"),
           "blocks.0.multipathway_fusion.conv_fast_to_slow",
           "blocks.0.multipathway_fusion.norm")

    for idx, (blocks, _slow_t) in enumerate(_SLOWFAST_STAGES):
        tb = idx + 1  # torch block index
        for p, stage in ((0, f"slow_res{idx + 2}"), (1, f"fast_res{idx + 2}")):
            for j in range(blocks):
                base = f"blocks.{tb}.multipathway_blocks.{p}.res_blocks.{j}"
                dst = (stage, f"block_{j}")
                convbn(dst + ("conv_a",), f"{base}.branch2.conv_a",
                       f"{base}.branch2.norm_a")
                convbn(dst + ("conv_b",), f"{base}.branch2.conv_b",
                       f"{base}.branch2.norm_b")
                convbn(dst + ("conv_c",), f"{base}.branch2.conv_c",
                       f"{base}.branch2.norm_c")
                if f"{base}.branch1_conv.weight" in sd:
                    convbn(dst + ("shortcut",), f"{base}.branch1_conv",
                           f"{base}.branch1_norm")
        if idx < 3:
            convbn((f"fuse_res{idx + 2}", "fuse"),
                   f"blocks.{tb}.multipathway_fusion.conv_fast_to_slow",
                   f"blocks.{tb}.multipathway_fusion.norm")

    params["proj"] = {"kernel": take("blocks.5.proj.weight").T,
                      "bias": take("blocks.5.proj.bias")}

    leftover = {k for k in sd if k not in used
                and not k.endswith("num_batches_tracked")}
    if leftover:
        raise ValueError(
            f"unconsumed slowfast checkpoint keys (schema drift?): "
            f"{sorted(leftover)[:8]}{'...' if len(leftover) > 8 else ''}"
        )
    return {"params": params, "batch_stats": stats}


# ---------------------------------------------------------------------------
# Baseline MLP head (reference models/baseline.py:15-37)
# ---------------------------------------------------------------------------


def baseline_params_from_torch(state_dict: Mapping[str, object]) -> dict:
    """Reference Baseline checkpoint (``mlp_head.{0,1}.weight/bias``) →
    :class:`mintime_tpu.models.baseline.Baseline` params."""
    sd = strip_prefixes(state_dict)
    return {
        "mlp_0": _linear(sd, "mlp_head.0"),
        "mlp_1": _linear(sd, "mlp_head.1"),
    }


def baseline_params_to_torch(params) -> dict:
    """Inverse of :func:`baseline_params_from_torch`."""
    return {
        "mlp_head.0.weight": _np(params["mlp_0"]["kernel"]).T,
        "mlp_head.0.bias": _np(params["mlp_0"]["bias"]),
        "mlp_head.1.weight": _np(params["mlp_1"]["kernel"]).T,
        "mlp_head.1.bias": _np(params["mlp_1"]["bias"]),
    }


def xception_params_to_torch(variables) -> dict:
    """Inverse of :func:`xception_params_from_torch` (SenseTime key names,
    models/xception.py:82-229), so TPU-trained MINTIME-XC extractors load
    into the reference via its loose state-dict loader (:242-272)."""
    from mintime_tpu.models.xception import BLOCK_SPECS

    params = variables["params"]
    stats = variables.get("batch_stats", {})
    sd: dict = {}

    def conv(prefix, leaf):
        sd[f"{prefix}.weight"] = _np(leaf["kernel"]).transpose(3, 2, 0, 1)
        if "bias" in leaf:
            sd[f"{prefix}.bias"] = _np(leaf["bias"])

    def bn(prefix, pleaf, sleaf):
        sd[f"{prefix}.weight"] = _np(pleaf["scale"])
        sd[f"{prefix}.bias"] = _np(pleaf["bias"])
        sd[f"{prefix}.running_mean"] = _np(sleaf["mean"])
        sd[f"{prefix}.running_var"] = _np(sleaf["var"])

    def sep(prefix, leaf):
        conv(f"{prefix}.conv1", leaf["depthwise"])
        conv(f"{prefix}.pointwise", leaf["pointwise"])

    conv("conv1", params["conv1"])
    bn("bn1", params["bn1"], stats["bn1"])
    conv("conv2", params["conv2"])
    bn("bn2", params["bn2"], stats["bn2"])
    for bi, (cin, cout, reps, stride, swr, gf) in enumerate(BLOCK_SPECS):
        blk, bst = params[f"block_{bi + 1}"], stats[f"block_{bi + 1}"]
        base = f"block{bi + 1}"
        off = 1 if swr else 0  # rep Sequential: [relu?] sep bn relu sep bn ...
        for i in range(reps):
            sep(f"{base}.rep.{3 * i + off}", blk[f"sep_{i}"])
            bn(f"{base}.rep.{3 * i + off + 1}", blk[f"bn_{i}"], bst[f"bn_{i}"])
        if cout != cin or stride != 1:
            conv(f"{base}.skip", blk["skip_conv"])
            bn(f"{base}.skipbn", blk["skip_bn"], bst["skip_bn"])
    sep("conv3", params["conv3"])
    bn("bn3", params["bn3"], stats["bn3"])
    sep("conv4", params["conv4"])
    bn("bn4", params["bn4"], stats["bn4"])
    return sd
