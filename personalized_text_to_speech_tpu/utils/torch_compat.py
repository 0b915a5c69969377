"""Checkpoint bridge: reference PyTorch ``G_*.pth``/``D_*.pth`` ↔ flax params.

The reference persists ``{model: state_dict, iteration, optimizer,
learning_rate}`` (reference ``utils.py:183-193``).  This module maps that
state dict onto our flax parameter pytree and back:

* name mapping is derived by walking OUR tree: flax collection names like
  ``attn_layers_0 / conv_q / kernel`` translate to torch's
  ``attn_layers.0.conv_q.weight``; flow containers need index arithmetic
  because torch interleaves parameterless ``Flip`` modules
  (``flow.flows.{2i}`` ↔ ``coupling_{i}``, ``dp.flows.{1+2i}`` ↔
  ``flows_conv_{i}``),
* tensor layout transforms: Conv1d ``[out,in,k] ↔ [k,in,out]``,
  ConvTranspose1d ``[in,out,k] ↔ [k,in,out]`` (weight-norm ``g`` per INPUT
  channel there), Conv2d ``[out,in,kh,kw] ↔ [kh,kw,in,out]``,
  ElementwiseAffine ``[c,1] ↔ [c]``,
* weight-norm ``(v, g)`` pairs are kept decomposed, exactly like the
  reference keeps them at inference (``models.py:254``),
* the speaker table loads shape-adaptively: rows of a smaller saved
  ``emb_g.weight`` are copied into a larger new table and vice versa, which
  is how a 999-speaker pretrained model fine-tunes onto few speakers
  (reference ``utils.py:163-168``).

Requires ``torch`` (CPU) only for reading/writing ``.pth`` files.
"""

from __future__ import annotations

import logging
import re
from typing import Any, Dict, Optional, Tuple

import numpy as np

from flax.traverse_util import flatten_dict, unflatten_dict

logger = logging.getLogger(__name__)

_TRAILING_INDEX = re.compile(r"^(.*)_(\d+)$")

# module names whose trailing _<digit> is literal in the reference, not a
# ModuleList index (e.g. FFN's conv_1/conv_2, attentions.py:273-274;
# DurationPredictor's norm_1/norm_2, models.py:110-112)
_LITERAL_NAMES = {"conv_1", "conv_2", "norm_1", "norm_2"}


def _module_path_to_torch(parts: Tuple[str, ...]) -> str:
    """Map a flax param path (module names + leaf) to a torch state_dict key."""
    out = []
    for part in parts[:-1]:
        if part.startswith("coupling_"):
            i = int(part.split("_")[1])
            out.append(f"flows.{2 * i}")
        elif part == "flows_pre":
            out.append("flows.0")
        elif part.startswith("flows_conv_"):
            i = int(part.split("_")[-1])
            out.append(f"flows.{1 + 2 * i}")
        elif part == "post_flows_pre":
            out.append("post_flows.0")
        elif part.startswith("post_flows_conv_"):
            i = int(part.split("_")[-1])
            out.append(f"post_flows.{1 + 2 * i}")
        elif part == "disc_s":
            out.append("discriminators.0")
        elif part.startswith("disc_p"):
            # period order (2,3,5,7,11) → discriminators.1..5
            period = int(part[len("disc_p"):])
            idx = {2: 1, 3: 2, 5: 3, 7: 4, 11: 5}[period]
            out.append(f"discriminators.{idx}")
        elif part in _LITERAL_NAMES:
            out.append(part)
        else:
            m = _TRAILING_INDEX.match(part)
            if m:
                out.append(f"{m.group(1)}.{m.group(2)}")
            else:
                out.append(part)
    leaf = parts[-1]
    leaf_map = {
        "kernel": "weight",
        "v": "weight_v",
        "g": "weight_g",
        "bias": "bias",
        "gamma": "gamma",
        "beta": "beta",
        "m": "m",
        "logs": "logs",
        "emb": "emb.weight",
        "embedding": "weight",
        "emb_rel_k": "emb_rel_k",
        "emb_rel_v": "emb_rel_v",
        # spectral-norm triple (torch.nn.utils.spectral_norm): the raw
        # weight param plus the power-iteration vectors, which live in our
        # "spectral" variable collection (leaves "u"/"v" there are mapped
        # by _spectral_path_to_torch, not here)
        "w_orig": "weight_orig",
    }
    return ".".join(out + [leaf_map.get(leaf, leaf)])


def _spectral_path_to_torch(parts: Tuple[str, ...]) -> str:
    """Map a path in the ``spectral`` collection (leaves ``u``/``v``) to the
    torch ``weight_u``/``weight_v`` buffer names."""
    prefix = _module_path_to_torch(parts[:-1] + ("bias",)).rsplit(".", 1)[0]
    return f"{prefix}.weight_{parts[-1]}"


def _is_transposed_conv(parts: Tuple[str, ...]) -> bool:
    return any(p.startswith("ups_") for p in parts)


def _to_flax_tensor(
    parts: Tuple[str, ...], torch_arr: np.ndarray, template: np.ndarray
) -> np.ndarray:
    """Layout transform torch → flax for one leaf."""
    leaf = parts[-1]
    a = torch_arr
    if leaf in ("kernel", "v", "w_orig"):
        if a.ndim == 3:
            if _is_transposed_conv(parts):
                a = a.transpose(2, 0, 1)  # [in,out,k] → [k,in,out]
            else:
                a = a.transpose(2, 1, 0)  # [out,in,k] → [k,in,out]
        elif a.ndim == 4:
            a = a.transpose(2, 3, 1, 0)  # [out,in,kh,kw] → [kh,kw,in,out]
    elif leaf == "g":
        a = a.reshape(-1)  # [c,1,1] → [c]
    elif leaf in ("m", "logs") and a.ndim == 2 and template.ndim == 1:
        a = a.reshape(-1)  # ElementwiseAffine [c,1] → [c]
    return a


def _from_flax_tensor(parts: Tuple[str, ...], flax_arr: np.ndarray) -> np.ndarray:
    """Layout transform flax → torch for one leaf."""
    leaf = parts[-1]
    a = flax_arr
    if leaf in ("kernel", "v", "w_orig"):
        if a.ndim == 3:
            if _is_transposed_conv(parts):
                a = a.transpose(1, 2, 0)  # [k,in,out] → [in,out,k]
            else:
                a = a.transpose(2, 1, 0)  # [k,in,out] → [out,in,k]
        elif a.ndim == 4:
            a = a.transpose(3, 2, 0, 1)  # [kh,kw,in,out] → [out,in,kh,kw]
    elif leaf == "g":
        a = a.reshape(-1, 1, 1)
    elif leaf in ("m", "logs") and a.ndim == 1:
        a = a.reshape(-1, 1)
    return a


def load_torch_state_dict(path: str) -> Tuple[Dict[str, np.ndarray], Dict[str, Any]]:
    """Read a reference ``.pth`` checkpoint → (numpy state dict, metadata)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state = ckpt["model"] if isinstance(ckpt, dict) and "model" in ckpt else ckpt
    meta = {
        k: ckpt.get(k)
        for k in ("iteration", "learning_rate")
        if isinstance(ckpt, dict)
    }
    np_state = {k: v.detach().cpu().numpy() for k, v in state.items()}
    return np_state, meta


def torch_to_flax(
    state_dict: Dict[str, np.ndarray],
    params_template: Dict[str, Any],
    strict: bool = False,
    drop_speaker_embed: bool = False,
) -> Dict[str, Any]:
    """Map a torch state dict onto a flax ``{'params': ...}`` tree.

    Missing keys keep their template values (fresh init), shape-mismatched
    speaker tables load partially — both mirroring the reference loader
    (``utils.py:160-173``).
    """
    import jax.numpy as jnp

    tree = params_template["params"] if "params" in params_template else params_template
    flat = flatten_dict(tree)
    new_flat = {}
    used = set()
    for parts, template in flat.items():
        key = _module_path_to_torch(parts)
        template_np = np.asarray(template)
        if drop_speaker_embed and key == "emb_g.weight":
            # keep fresh speaker rows (reference --drop_speaker_embed,
            # utils.py:163-166)
            new_flat[parts] = template
            continue
        if key not in state_dict:
            msg = f"{key} is not in the checkpoint"
            if strict:
                raise KeyError(msg)
            logger.info(msg)
            new_flat[parts] = template
            continue
        used.add(key)
        arr = _to_flax_tensor(parts, state_dict[key], template_np)
        if arr.shape != template_np.shape:
            if parts[-2:] == ("emb_g", "embedding") or key == "emb_g.weight":
                n = min(arr.shape[0], template_np.shape[0])
                merged = np.array(template_np, copy=True)
                merged[:n] = arr[:n]
                arr = merged
                logger.info(
                    "partial speaker-embedding load: %d of %d rows",
                    n,
                    template_np.shape[0],
                )
            else:
                msg = f"shape mismatch for {key}: ckpt {arr.shape} vs model {template_np.shape}"
                if strict:
                    raise ValueError(msg)
                logger.warning("%s — keeping fresh init", msg)
                new_flat[parts] = template
                continue
        new_flat[parts] = jnp.asarray(arr, dtype=jnp.asarray(template).dtype)
    new_tree = unflatten_dict(new_flat)
    if "params" not in params_template:
        unused = set(state_dict) - used
        if unused:
            logger.info("unused checkpoint keys: %s", sorted(unused)[:10])
        return new_tree
    result = {"params": new_tree}
    if "spectral" in params_template:
        # spectral-norm power-iteration vectors ride as plain 1-D buffers
        spec_flat = {}
        for parts, template in flatten_dict(params_template["spectral"]).items():
            key = _spectral_path_to_torch(parts)
            if key in state_dict:
                used.add(key)
                spec_flat[parts] = jnp.asarray(
                    state_dict[key].reshape(-1),
                    dtype=jnp.asarray(template).dtype,
                )
            else:
                logger.info("%s is not in the checkpoint", key)
                spec_flat[parts] = template
        result["spectral"] = unflatten_dict(spec_flat)
    unused = set(state_dict) - used
    if unused:
        logger.info("unused checkpoint keys: %s", sorted(unused)[:10])
    return result


def flax_to_torch(params: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Export our params (and any spectral-norm state) as a
    reference-layout torch state dict (numpy)."""
    tree = params["params"] if "params" in params else params
    out = {}
    flat = flatten_dict(tree)
    for parts, value in flat.items():
        key = _module_path_to_torch(parts)
        arr = _from_flax_tensor(parts, np.asarray(value))
        if parts[-1] == "g":
            # torch weight_g rank tracks the weight rank: [C,1,1] for 1-D
            # convs, [C,1,1,1] for Conv2d (discriminator P stacks)
            v = flat.get(parts[:-1] + ("v",))
            if v is not None and np.asarray(v).ndim == 4:
                arr = arr.reshape(-1, 1, 1, 1)
        out[key] = arr
    if "spectral" in params:
        for parts, value in flatten_dict(params["spectral"]).items():
            out[_spectral_path_to_torch(parts)] = np.asarray(value)
    return out


def save_torch_checkpoint(
    params: Dict[str, Any],
    path: str,
    iteration: int = 0,
    learning_rate: float = 2e-4,
) -> None:
    """Write a reference-compatible ``.pth`` (reference ``utils.py:183-193``)."""
    import torch

    state = {
        k: torch.from_numpy(np.array(v, copy=True))
        for k, v in flax_to_torch(params).items()
    }
    torch.save(
        {
            "model": state,
            "iteration": iteration,
            "optimizer": None,
            "learning_rate": learning_rate,
        },
        path,
    )
