"""PyTorch checkpoint -> Flax parameter conversion.

Torch runs on the host CPU only as a weight-file reader; no torch op ever
touches the compute path. Conv kernels transpose ``(O, I, kh, kw) ->
(kh, kw, I, O)``; BatchNorm splits into ``params`` (scale/bias) and
``batch_stats`` (mean/var) collections.

Checkpoint layouts handled:
  * FFDNet (KAIR): flat ``model.{2i}.{weight,bias}`` sequential indices
    (``/root/reference/model_zoo/ffdnet_color.pth``; 12 convs color /
    15 gray with ReLUs at odd indices).
  * FastDVDnet / DDnet: nested module names (``temp1.inc.convblock.0...``);
    converted generically by name mapping.
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np


def _to_numpy(t: Any) -> np.ndarray:
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)


def load_torch_state_dict(path: str) -> dict[str, np.ndarray]:
    """Read a ``.pth`` file into a flat name->ndarray dict (host only)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]  # DDnet checkpoints wrap the dict (driver :231)
    out = {}
    for k, v in sd.items():
        k = k.removeprefix("module.")  # DataParallel wrapper
        out[k] = _to_numpy(v)
    return out


def conv_kernel(w: np.ndarray) -> np.ndarray:
    """Torch conv weight ``(O, I, kh, kw)`` -> Flax ``(kh, kw, I, O)``."""
    return np.transpose(w, (2, 3, 1, 0))


def ffdnet_params(state_dict: Mapping[str, np.ndarray]) -> dict:
    """Flat KAIR-FFDNet state dict -> Flax params for :class:`FFDNet`."""
    # Sequential indices: conv at 0, 2, 4, ... (ReLU between).
    conv_ids = sorted(
        {int(k.split(".")[1]) for k in state_dict if k.startswith("model.")}
    )
    params: dict[str, dict[str, np.ndarray]] = {}
    for i, sid in enumerate(conv_ids):
        params[f"conv_{i}"] = {
            "kernel": conv_kernel(state_dict[f"model.{sid}.weight"]),
            "bias": state_dict[f"model.{sid}.bias"],
        }
    return {"params": params}


def load_ffdnet(path: str) -> dict:
    """Load a reference FFDNet checkpoint as Flax variables."""
    return ffdnet_params(load_torch_state_dict(path))


def ffdnet_ipol_variables(state_dict: Mapping[str, np.ndarray]) -> dict:
    """IPOL-FFDNet checkpoint (``intermediate_dncnn.itermediate_dncnn.{i}``,
    conv/BN interleave, the 'itermediate' typo is the reference's) -> Flax."""
    prefix = "intermediate_dncnn.itermediate_dncnn."
    entries: dict[int, dict[str, np.ndarray]] = {}
    for k, v in state_dict.items():
        if not k.startswith(prefix):
            continue
        idx_str, leaf = k[len(prefix):].split(".")
        entries.setdefault(int(idx_str), {})[leaf] = v

    params: dict = {}
    stats: dict = {}
    conv_i = 0
    bn_i = None
    for idx in sorted(entries):
        e = entries[idx]
        if "running_mean" in e:  # BatchNorm
            name = f"bn_{bn_i}"
            params[name] = {"scale": e["weight"], "bias": e["bias"]}
            stats[name] = {"mean": e["running_mean"], "var": e["running_var"]}
        else:  # conv (bias-free)
            name = f"conv_{conv_i}"
            params[name] = {"kernel": conv_kernel(e["weight"])}
            bn_i = conv_i
            conv_i += 1
    return {"params": params, "batch_stats": stats}


def load_ffdnet_ipol(path: str) -> dict:
    return ffdnet_ipol_variables(load_torch_state_dict(path))


# ---------------------------------------------------------------------------
# FastDVDnet: map the reference's Sequential indices to named Flax scopes.
#
# Torch layout (packages/fastdvdnet/models.py):
#   {temp1,temp2}.inc.convblock.{0 conv,1 bn,3 conv,4 bn}
#   {..}.downc{0,1}.convblock.{0 conv,1 bn,3 CvBlock(.convblock.{0,1,3,4})}
#   {..}.upc{2,1}.convblock.{0 CvBlock(...),1 conv}
#   {..}.outc.convblock.{0 conv,1 bn,3 conv}
# ---------------------------------------------------------------------------

_CVBLOCK_MAP = {"0": "conv0", "1": "bn0", "3": "conv1", "4": "bn1"}


def _fdvd_flax_path(parts: list[str]) -> list[str] | None:
    """Map one torch parameter path (without leaf) to the Flax module path."""
    temp, block, seq = parts[0], parts[1], parts[2]
    rest = parts[3:]
    assert seq == "convblock", parts
    idx = rest[0]
    if block == "inc" or block == "outc":
        return [temp, block, _CVBLOCK_MAP[idx]]
    if block.startswith("downc"):
        if idx in ("0", "1"):
            return [temp, block, _CVBLOCK_MAP[idx]]
        # idx == '3': nested CvBlock
        return [temp, block, "cvblock", _CVBLOCK_MAP[rest[2]]]
    if block.startswith("upc"):
        if idx == "0":  # nested CvBlock
            return [temp, block, "cvblock", _CVBLOCK_MAP[rest[2]]]
        return [temp, block, "conv0"]  # idx == '1': the upsample conv
    raise KeyError(".".join(parts))


def fastdvdnet_variables(state_dict: Mapping[str, np.ndarray]) -> dict:
    """Reference FastDVDnet state dict -> Flax variables for
    :class:`adaptivepnp_sci_tpu.models.fastdvdnet.FastDVDnet`."""
    params: dict = {}
    stats: dict = {}

    def put(tree, path, leaf, value):
        node = tree
        for p in path:
            node = node.setdefault(p, {})
        node[leaf] = value

    for key, val in state_dict.items():
        parts = key.split(".")
        leaf = parts[-1]
        if leaf == "num_batches_tracked":
            continue
        path = _fdvd_flax_path(parts[:-1])
        is_bn = path[-1].startswith("bn")
        if leaf == "running_mean":
            put(stats, path, "mean", val)
        elif leaf == "running_var":
            put(stats, path, "var", val)
        elif leaf == "weight":
            if is_bn:
                put(params, path, "scale", val)
            else:
                put(params, path, "kernel", conv_kernel(val))
        elif leaf == "bias":
            put(params, path, "bias", val)
    return {"params": params, "batch_stats": stats}


def load_fastdvdnet(path: str) -> dict:
    return fastdvdnet_variables(load_torch_state_dict(path))


def spatial_dncnn_variables(state_dict: Mapping[str, np.ndarray]) -> dict:
    """Reference ``spatialDnCNN`` state dict -> Flax variables for
    :class:`adaptivepnp_sci_tpu.models.fastdvdnet.SpatialDnCNN`.

    Same block vocabulary as one FastDVDnet DenBlock, without the
    ``temp{1,2}`` prefix (``packages/fastdvdnet/models.py:92-144``)."""
    v = fastdvdnet_variables(
        {"temp1." + k: val for k, val in state_dict.items()}
    )
    return {"params": v["params"]["temp1"],
            "batch_stats": v["batch_stats"]["temp1"]}


def pyramid_encoder_variables(state_dict: Mapping[str, np.ndarray]) -> dict:
    """Reference pyramid ``encoder`` state dict -> Flax variables for
    :class:`adaptivepnp_sci_tpu.models.ddnet.PyramidEncoder`
    (``models/network_demosaicking.py:137-182``; all convs carry biases).

    Torch path -> Flax scope: Sequential indices join with underscores
    (``conv_first01.0`` -> ``conv_first01_0``), residual blocks
    ``rbs.{i}.conv{1,2}`` -> ``rbs_{i}/conv{1,2}``; plain convs keep their
    names."""
    params: dict = {}

    def put(path, leaf, value):
        node = params
        for p in path:
            node = node.setdefault(p, {})
        node[leaf] = value

    for key, val in state_dict.items():
        parts = key.split(".")
        leaf = parts[-1]
        body = parts[:-1]
        if body[0] == "rbs":
            path = [f"rbs_{body[1]}", body[2]]
        elif len(body) == 2:  # Sequential: conv_first01.0 etc.
            path = [f"{body[0]}_{body[1]}"]
        else:
            path = [body[0]]
        if leaf == "weight":
            put(path, "kernel", conv_kernel(val))
        else:
            assert leaf == "bias", key
            put(path, "bias", val)
    return {"params": params}


# ---------------------------------------------------------------------------
# DDnet: no-BN variant of the same Sequential layout
# (models/network_demosaicking.py). The unused noise-map 'inc' blocks are
# dropped; 'inc_1' is the active input block. All convs are bias-free.
# ---------------------------------------------------------------------------

_NOBNBLOCK_MAP = {"0": "conv0", "2": "conv1"}


def _ddnet_flax_path(parts: list[str]) -> list[str] | None:
    if parts[0].startswith("weight_tensor"):
        return []  # top-level param
    temp, block = parts[0], parts[1]
    if block == "inc":
        return None  # unused noise-map input block
    rest = parts[3:]  # skip 'convblock'
    idx = rest[0]
    if block in ("inc_1", "outc", "fusion"):
        return [temp, block, _NOBNBLOCK_MAP[idx]]
    if block.startswith("downc"):
        if idx == "0":
            return [temp, block, "conv0"]
        return [temp, block, "cvblock", _NOBNBLOCK_MAP[rest[2]]]  # idx == '2'
    if block.startswith("upc"):
        if idx == "0":
            return [temp, block, "cvblock", _NOBNBLOCK_MAP[rest[2]]]
        return [temp, block, "conv0"]  # idx == '1'
    raise KeyError(".".join(parts))


def ddnet_variables(state_dict: Mapping[str, np.ndarray]) -> dict:
    """Reference DDnet state dict -> Flax variables for
    :class:`adaptivepnp_sci_tpu.models.ddnet.DDnet`."""
    params: dict = {}

    def put(tree, path, leaf, value):
        node = tree
        for p in path:
            node = node.setdefault(p, {})
        node[leaf] = value

    for key, val in state_dict.items():
        parts = key.split(".")
        if parts[0].startswith("weight_tensor"):
            params[parts[0]] = val
            continue
        path = _ddnet_flax_path(parts[:-1])
        if path is None:
            continue
        assert parts[-1] == "weight", key  # all convs bias-free
        put(params, path, "kernel", conv_kernel(val))
    return {"params": params}


def load_ddnet(path: str) -> dict:
    return ddnet_variables(load_torch_state_dict(path))


# ---------------------------------------------------------------------------
# Generic nested converter (DDnet and friends): torch module paths map to
# identically-named Flax module scopes; conv weights transpose, BN splits.
# ---------------------------------------------------------------------------


def nested_variables(
    state_dict: Mapping[str, np.ndarray],
    bn_paths: set[str] | None = None,
) -> dict:
    """Convert a nested torch state dict into Flax ``{'params', 'batch_stats'}``.

    A torch entry ``a.b.c.weight`` becomes params ``a']['b']['c']['kernel'``
    when 4-D (conv) or ``scale`` when 1-D with matching BN siblings.
    ``running_mean``/``running_var`` land in ``batch_stats`` as
    ``mean``/``var``; ``num_batches_tracked`` is dropped.
    """
    params: dict = {}
    stats: dict = {}

    def put(tree: dict, path: list[str], leaf_name: str, value: np.ndarray):
        node = tree
        for p in path:
            node = node.setdefault(p, {})
        node[leaf_name] = value

    for key, val in state_dict.items():
        parts = key.split(".")
        path, leaf = parts[:-1], parts[-1]
        is_bn = f"{'.'.join(path)}.running_mean" in state_dict or (
            bn_paths is not None and ".".join(path) in bn_paths
        )
        if leaf == "num_batches_tracked":
            continue
        if leaf == "running_mean":
            put(stats, path, "mean", val)
        elif leaf == "running_var":
            put(stats, path, "var", val)
        elif leaf == "weight":
            if val.ndim == 4:
                put(params, path, "kernel", conv_kernel(val))
            elif is_bn:
                put(params, path, "scale", val)
            else:
                put(params, path, "kernel", val.T)  # linear layer
        elif leaf == "bias":
            put(params, path, "bias", val)
        else:
            put(params, path, leaf, val)

    out = {"params": params}
    if stats:
        out["batch_stats"] = stats
    return out
