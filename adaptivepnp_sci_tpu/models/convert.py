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


# ---------------------------------------------------------------------------
# Generic nested converter (FastDVDnet / DDnet): torch module paths map to
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
